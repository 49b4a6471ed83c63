#!/usr/bin/env python3
"""Re-freeze baselines/bench_per_query_sf0.1.json (VERDICT r13 item 6).

Policy (documented in BASELINE.md):
- freeze[q] = max(driver r13 in-suite value where recoverable from
  BENCH_r13.json's tail+slowest-20 and not itself flagged anomalous,
  this round's own full-suite driver-protocol value x 1.5).
  The r12-driver values the r13 freeze carried are dropped entirely:
  many were eviction-wave readings (PERF_AUDIT_r13 adjudicated 35 of
  them at 2-4.8x their healthy values, and the mechanism is now removed),
  so they are neither driver-conditions-healthy nor plan-current.
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

R1 = set("""abbrev bionlp_export chunk_content classified_sentences
collection_assign concept_count_dist concept_idf concepts concepts_pp
concepts_promoted conll03_export conllu_tokens cooccur_counts_abstract
cooccur_counts_doc cooccur_counts_sent cooccur_counts_title
cooccur_metrics_doc crf_overlap decontaminate dedup_exact dedup_minhash
dedup_norm dedup_simhash dict_export distant_supervision doc_augment
doc_filter doc_fingerprint doc_sample doc_upsert emb_dup_pairs emb_lsh
emb_topk emb_topk_native es_docs events_hourly events_props
events_quantiles events_sessions export_flat kg_edges kg_nodes lang_id
multimodal_meta ngram_counts ngram_jaccard ontology_closure
pubannotation_export q1_pricing q3_top_orders q5_region_revenue
q6_forecast quality_filter quality_score relation_paths repetition_stats
sentence_pairs sentences text_export text_redact tfidf token_packing
tokens top_parts_per_brand vocab_stats xml_roundtrip""".split())

# plans rewired in the r13 end-of-round commit (window-id staging) or this
# round (staged unit-concepts / minhash signatures): driver r13 readings
# describe a removed plan, so only this round's own values apply
PLAN_CHANGED = set("""window_dup window_dedup_apply split_leakage
streaming_split_leakage cooccur_counts_doc cooccur_counts_sent
cooccur_counts_title cooccur_counts_abstract cooccur_metrics_doc
cooccur_metrics_sent cooccur_metrics_title cooccur_metrics_abstract
cooccur_chi2 concept_idf lsh_band_tuning minhash_est""".split())

HEADROOM = 1.5

def main():
    ours = json.load(open(sys.argv[1]))["queries"]
    r13 = {}
    d = json.load(open("BENCH_r13.json"))
    blocks = re.findall(r"\[bench-queries (\d+)\] (\{[^}]*\})", d["tail"])
    # ADVICE r14: the flat-object regex silently drops readings if the
    # bench log format ever nests or wraps - surface the recovery rate so
    # a parser/format mismatch cannot quietly fall back to own-value x1.5
    expected = max((int(i) for i, _ in blocks), default=0)
    print(f"[refreeze] recovered {len(blocks)} bench-queries blocks "
          f"(highest index {expected}) from BENCH_r13.json tail")
    if blocks and len(blocks) != expected:
        print(f"[refreeze] WARNING: block indexes not contiguous - "
              f"{expected - len(blocks)} block(s) unparsed; their queries "
              f"fall back to own-value x{HEADROOM}")
    for _, js in blocks:
        r13.update(json.loads(js))
    r13.update(d["parsed"]["queries"])  # slowest-20
    # not healthy observations: the two r13 driver readings adjudicated as
    # anomalous (PERF_AUDIT_r14 section 1), plus every plan-changed query
    for q in ("window_dup", "bionlp_source", *PLAN_CHANGED):
        r13.pop(q, None)

    out = {}
    for q, v in sorted(ours.items()):
        out[q] = round(max(r13.get(q, 0.0), v * HEADROOM), 3)
    r1_total = round(sum(v for q, v in out.items() if q in R1), 3)
    comment = ("per-query warm (min-of-2) baselines at sf0.1, RE-FROZEN for r14 "
        "(VERDICT r13 item 6: full 308-query coverage; window_dup's anomalous "
        "denominator replaced post-staging-fix). Per query = max(driver r13 "
        "in-suite value where recoverable from BENCH_r13.json and healthy "
        "(not flagged, plan unchanged since), own full-suite driver-protocol "
        "run target/bench_detail_r14b.json x1.5 driver-conditions headroom). "
        "The r12-driver values of the previous freeze are dropped: 35 were "
        "eviction-wave readings 2-4.8x their healthy values (PERF_AUDIT_r13) "
        "and the mechanism is removed. warm_total_r1_queries = sum of the new "
        "values over the r1 set (keeps Bench.scala's machine-state "
        "normalization internally consistent). Prior freeze kept at "
        "bench_per_query_sf0.1_r13.json.")
    blob = {"_comment": comment, "warm_total_r1_queries": r1_total, "queries": out}
    with open("baselines/bench_per_query_sf0.1.json", "w") as f:
        json.dump(blob, f, indent=1)
    n_drv = sum(1 for q in out if r13.get(q, 0.0) >= out[q])
    print(f"froze {len(out)} queries (r1 total {r1_total}); "
          f"{n_drv} denominators from driver r13 readings, "
          f"{len(out) - n_drv} from own-value x{HEADROOM}")

if __name__ == "__main__":
    main()
