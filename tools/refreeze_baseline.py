#!/usr/bin/env python3
"""Re-freeze baselines/bench_per_query_sf0.1.json (r15 update of the
VERDICT r13 item 6 protocol).

Policy (documented in BASELINE.md):
- freeze[q] = max(driver r14 in-suite value where recoverable from
  BENCH_r14.json's tail+slowest-20, not itself adjudicated anomalous,
  and the plan unchanged since, this round's own full-suite
  driver-protocol value x 1.5).
  The x1.5 headroom covers driver-vs-this-box variance (median
  driver/our per-query ratio ~1.0, p90 ~1.4); the queries where the
  driver historically ran 2-4x this box are all in the recoverable
  driver-r13 set (they are its slowest-20), so their denominators are
  real driver readings.
- warm_total_r1_queries := sum of the new per-query values over the r1
  set, keeping Bench.scala's machine-state normalization internally
  consistent.

Usage: python3 tools/refreeze_baseline.py <our_full_suite_detail.json>
"""
import json, re, sys

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

# plans rewired in round 15 (staged eval bigrams, bucketed assertion-DB
# base, staged cooccurrence pair/scores tables + KG FromPairs/FromMetrics
# rewiring, single-checkpoint streaming upsert-delete): driver r14
# readings describe a removed plan, so only this round's own values apply
PLAN_CHANGED = set("""decontaminate decontaminate_bloom
contamination_report decontaminate_fuzzy training_pipeline
assertion_db_assertions assertion_db_evidence assertion_db_entities
assertion_db_scores assertion_db_integrity kg_edges kg_pagerank kg_khop
kg_triangles kg_jaccard kg_degree_dist kgx_edges kgx_edges_evidence
trapi_edges distant_supervision streaming_upsert_delete""".split())

# driver r14 readings adjudicated as machine-moment noise this round
# (PERF_AUDIT_r15: plan unchanged, every isolated + in-suite local
# replica at or below the frozen denominator) - using them as
# denominators would mask future regressions
ADJUDICATED_NOISE = set("crf_overlap corpus_mix".split())

HEADROOM = 1.5

def main():
    detail = json.load(open(sys.argv[1]))
    ours = detail["queries"]
    R1 = r1_query_set(detail)
    r13 = {}
    d = json.load(open("BENCH_r14.json"))
    blocks = re.findall(r"\[bench-queries (\d+)\] (\{[^}]*\})", d["tail"])
    # ADVICE r14: the flat-object regex silently drops readings if the
    # bench log format ever nests or wraps - surface the recovery rate so
    # a parser/format mismatch cannot quietly fall back to own-value x1.5
    expected = max((int(i) for i, _ in blocks), default=0)
    print(f"[refreeze] recovered {len(blocks)} bench-queries blocks "
          f"(highest index {expected}) from BENCH_r14.json tail")
    if blocks and len(blocks) != expected:
        print(f"[refreeze] WARNING: block indexes not contiguous - "
              f"{expected - len(blocks)} block(s) unparsed; their queries "
              f"fall back to own-value x{HEADROOM}")
    for _, js in blocks:
        r13.update(json.loads(js))
    r13.update(d["parsed"]["queries"])  # slowest-20
    # not healthy observations: adjudicated-noise readings plus every
    # plan-changed query
    for q in (*ADJUDICATED_NOISE, *PLAN_CHANGED):
        r13.pop(q, None)

    out = {}
    for q, v in sorted(ours.items()):
        out[q] = round(max(r13.get(q, 0.0), v * HEADROOM), 3)
    r1_total = round(sum(v for q, v in out.items() if q in R1), 3)
    comment = ("per-query warm (min-of-2) baselines at sf0.1, RE-FROZEN for "
        "r15 (311-query coverage incl. the BigQuery-load family; the r15 "
        "plan-changed families' denominators replaced post-staging). Per "
        "query = max(driver r14 in-suite value where recoverable from "
        "BENCH_r14.json, healthy (not adjudicated noise - crf_overlap / "
        "corpus_mix, PERF_AUDIT_r15), and plan-unchanged since, own "
        "full-suite driver-protocol run target/bench_detail_r15a.json x1.5 "
        "driver-conditions headroom). warm_total_r1_queries = sum of the "
        "new values over the r1 set (keeps Bench.scala's machine-state "
        "normalization internally consistent). Prior freeze kept at "
        "bench_per_query_sf0.1_r14.json.")
    blob = {"_comment": comment, "warm_total_r1_queries": r1_total, "queries": out}
    with open("baselines/bench_per_query_sf0.1.json", "w") as f:
        json.dump(blob, f, indent=1)
    n_drv = sum(1 for q in out if r13.get(q, 0.0) >= out[q])
    print(f"froze {len(out)} queries (r1 total {r1_total}); "
          f"{n_drv} denominators from driver r13 readings, "
          f"{len(out) - n_drv} from own-value x{HEADROOM}")

if __name__ == "__main__":
    main()
