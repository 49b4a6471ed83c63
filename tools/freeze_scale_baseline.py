#!/usr/bin/env python3
"""Freeze per-query sf1.0 baselines for the scale ladder (VERDICT r14
item 5) with the same max/headroom protocol as the sf0.1 freeze:

  per query = max(r14 sf1.0 probe reading where the plan is unchanged
              since, own sf1.0 run value x HEADROOM)

Usage:
    python3 tools/freeze_scale_baseline.py <own_sf1.0_bench_detail.json>

Reads BENCH_r14_scale.json for the r14 probe readings (88-query probe
set, name -> [sf0.1, sf1.0, ratio]), writes
baselines/bench_per_query_sf1.0.json in the same shape Bench.scala's
regression gate parses (warm_total_r1_queries + queries map).
"""
import json, sys

HEADROOM = 1.5

# plans rewired in round 15 (staged cooccurrence pair/scores tables, KG
# family FromPairs/FromMetrics, staged eval bigrams, bucketed assertion
# base, single-checkpoint streaming upsert-delete): r14 probe readings
# describe removed plans, so only this round's own values apply
PLAN_CHANGED = set("""minhash_est lsh_band_tuning cooccur_counts_doc
cooccur_metrics_doc concept_idf kg_pagerank kg_khop kg_triangles
kg_jaccard kg_degree_dist kgx_edges kgx_edges_evidence kg_edges
trapi_edges distant_supervision decontaminate decontaminate_bloom
contamination_report decontaminate_fuzzy training_pipeline
assertion_db_assertions assertion_db_evidence assertion_db_entities
assertion_db_scores assertion_db_integrity split_leakage
streaming_upsert_delete streaming_split_leakage window_dup
window_dedup_apply""".split())

def r1_query_set(detail):
    """The R1 set from the bench detail JSON (Bench.scala emits it as
    r1_query_set since r16 — single source, ADVICE r15: three drifting
    copies skew the normalization ratio); falls back to parsing the
    R1Queries literal out of Bench.scala for pre-r16 detail files."""
    if "r1_query_set" in detail:
        return set(detail["r1_query_set"])
    import re
    src = open("src/main/scala/graft/Bench.scala").read()
    body = re.search(r"R1Queries: Set\[String\] = Set\((.*?)\)", src, re.S).group(1)
    return set(re.findall(r'"([a-z0-9_]+)"', body))


def main():
    detail = json.load(open(sys.argv[1]))
    ours = detail["queries"]
    R1 = r1_query_set(detail)
    r14 = {}
    for q, v in json.load(open("BENCH_r14_scale.json"))["queries"].items():
        if q not in PLAN_CHANGED:
            r14[q] = v[1]  # [sf0.1, sf1.0, ratio]
    print(f"[freeze-scale] {len(ours)} own readings, "
          f"{len(r14)} healthy r14 probe readings")
    out = {}
    for q, v in sorted(ours.items()):
        out[q] = round(max(r14.get(q, 0.0), v * HEADROOM), 3)
    r1_total = round(sum(v for q, v in out.items() if q in R1), 3)
    comment = (
        "per-query warm (min-of-2) baselines at sf1.0 (10x-bytes ScaleUp "
        "of sf0.1), FROZEN in r15 (VERDICT r14 item 5) so the scale "
        "ladder gets the same regression gate as the bench scale. Per "
        "query = max(r14 sf1.0 probe reading from BENCH_r14_scale.json "
        "where the plan is unchanged since, own r15 sf1.0 run x1.5 "
        "headroom). Bench.scala picks this file up whenever "
        "SPARK_GRAFT_SF_DIR's basename is sf1.0.")
    blob = {"_comment": comment, "warm_total_r1_queries": r1_total,
            "queries": out}
    with open("baselines/bench_per_query_sf1.0.json", "w") as f:
        json.dump(blob, f, indent=1, sort_keys=True)
    print(f"[freeze-scale] wrote {len(out)} baselines, "
          f"r1 subset total {r1_total}")


if __name__ == "__main__":
    main()
