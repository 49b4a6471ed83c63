#!/usr/bin/env python3
"""Freeze per-query scale-ladder baselines (VERDICT r14 item 5, extended
to any ladder point in r16) with the same max/headroom protocol as the
sf0.1 freeze:

  per query = max(prior probe reading where the plan is unchanged since,
              own run value x HEADROOM)

Usage:
    python3 tools/freeze_scale_baseline.py <own_bench_detail.json> \
        [--sf-name sf1.0] [--prior BENCH_r14_scale.json | --prior none]

Writes baselines/bench_per_query_<sf-name>.json in the shape Bench.scala's
regression gate parses (warm_total_r1_queries + queries map); Bench picks
the file up whenever SPARK_GRAFT_SF_DIR's basename matches <sf-name>.
The prior probe file may carry either name -> seconds or
name -> [base_s, probe_s, ratio] (the BENCH_r*_scale.json shape).
The R1 set comes from the own detail JSON's r1_query_set (Bench emits it
since r16 — single source; pre-r16 files fall back to parsing Bench.scala).
"""
import json, re, sys

HEADROOM = 1.5

# plans rewired in round 15 (staged cooccurrence pair/scores tables, KG
# family FromPairs/FromMetrics, staged eval bigrams, bucketed assertion
# base, single-checkpoint streaming upsert-delete) and round 16 (staged
# near-dup pair graph, driver-local BPE merge loop, sorted-bucket staged
# artifacts): prior probe readings describe removed plans, so only this
# round's own values apply
PLAN_CHANGED = set("""minhash_est lsh_band_tuning cooccur_counts_doc
cooccur_metrics_doc concept_idf kg_pagerank kg_khop kg_triangles
kg_jaccard kg_degree_dist kgx_edges kgx_edges_evidence kg_edges
trapi_edges distant_supervision decontaminate decontaminate_bloom
contamination_report decontaminate_fuzzy training_pipeline
assertion_db_assertions assertion_db_evidence assertion_db_entities
assertion_db_scores assertion_db_integrity split_leakage
streaming_upsert_delete streaming_split_leakage window_dup
window_dedup_apply
emb_dup_pairs semantic_clusters bpe_merges bpe_encode bpe_encode_artifact
bpe_fertility bigquery_load_annotation bigquery_load_zones
bigquery_load_relation""".split())


def r1_query_set(detail):
    """The R1 set from the bench detail JSON (Bench.scala emits it as
    r1_query_set since r16 — single source, ADVICE r15: three drifting
    copies skew the normalization ratio); falls back to parsing the
    R1Queries literal out of Bench.scala for pre-r16 detail files."""
    if "r1_query_set" in detail:
        return set(detail["r1_query_set"])
    src = open("src/main/scala/graft/Bench.scala").read()
    body = re.search(r"R1Queries: Set\[String\] = Set\((.*?)\)", src, re.S).group(1)
    return set(re.findall(r'"([a-z0-9_]+)"', body))


def arg(flag, default):
    return sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else default


def main():
    detail = json.load(open(sys.argv[1]))
    ours = dict(detail["queries"])
    # ADVICE r16: a failed query's recorded "warm" value is its
    # time-to-exception (often ~0 s) — freezing it would set a near-zero
    # baseline that cries wolf on every later healthy run. Drop failed
    # queries from the freeze and say so; they must be re-measured and
    # merged (tools/merge_bench_detail.py) before they get a baseline.
    failed = [q for q in detail.get("failed", []) if q in ours]
    if failed:
        print(f"[freeze-scale] EXCLUDING {len(failed)} failed queries "
              f"(time-to-exception is not a baseline): {' '.join(sorted(failed))}")
        for q in failed:
            ours.pop(q)
    R1 = r1_query_set(detail)
    sf_name = arg("--sf-name", "sf1.0")
    prior_file = arg("--prior", "BENCH_r14_scale.json")
    prior = {}
    if prior_file != "none":
        for q, v in json.load(open(prior_file))["queries"].items():
            if q not in PLAN_CHANGED:
                # [base_s, probe_s, ratio] probe shape, or a bare seconds value
                prior[q] = v[1] if isinstance(v, list) else v
    print(f"[freeze-scale] {len(ours)} own readings, "
          f"{len(prior)} healthy prior probe readings ({prior_file})")
    out = {}
    for q, v in sorted(ours.items()):
        out[q] = round(max(prior.get(q, 0.0), v * HEADROOM), 3)
    r1_total = round(sum(v for q, v in out.items() if q in R1), 3)
    comment = (
        f"per-query warm (min-of-2) baselines at {sf_name} (ScaleUp of "
        "sf0.1), frozen so the scale ladder gets the same regression gate "
        "as the bench scale. Per query = max(prior probe reading "
        f"({prior_file}) where the plan is unchanged since, own run "
        f"x{HEADROOM} headroom). Bench.scala picks this file up whenever "
        f"SPARK_GRAFT_SF_DIR's basename is {sf_name}.")
    blob = {"_comment": comment, "warm_total_r1_queries": r1_total,
            "queries": out}
    path = f"baselines/bench_per_query_{sf_name}.json"
    # no sort_keys: keep warm_total_r1_queries ahead of the queries map,
    # matching the sf0.1 freeze layout Bench's parser was written against
    with open(path, "w") as f:
        json.dump(blob, f, indent=1)
    print(f"[freeze-scale] wrote {len(out)} baselines to {path}, "
          f"r1 subset total {r1_total}")


if __name__ == "__main__":
    main()
