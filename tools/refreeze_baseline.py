#!/usr/bin/env python3
"""Re-freeze baselines/bench_per_query_sf0.1.json (r17 update of the
VERDICT r13 item 6 protocol).

Policy (documented in BASELINE.md):
- freeze[q] = max(driver r16 in-suite value where recoverable from
  BENCH_r16.json's tail+slowest-20, not itself adjudicated anomalous,
  and the plan unchanged since, this round's own full-suite
  driver-protocol value x 1.5).
  The x1.5 headroom covers driver-vs-this-box variance (median
  driver/our per-query ratio ~1.0, p90 ~1.4); the queries where the
  driver historically ran 2-4x this box are all in the recoverable
  driver set (they are its slowest-20), so their denominators are
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

# plans rewired in round 17: the BPE trainer's NDV-gated collect adds a
# count job ahead of the word-table collect, and the optimization round
# rewired the query paths below (staged artifacts / shared caches /
# lag-window rewrite — OPTIMIZATION_r17.md). Driver r16 readings describe
# the old plans, so only this round's own values apply.
PLAN_CHANGED = set("""bpe_merges bpe_encode bpe_encode_artifact
bpe_fertility ds_train_split bm25_mrr hybrid_rrf tfidf tfidf_doc_sim
sheets_batch_carryforward sheets_batch_iaa sheets_to_bert
heavy_hitters_cms ngram_jaccard annotation_batch annotation_batch_files
bigquery_load_relation simhash_pairs dedup_source_matrix
ann_recall ann_ndcg ivf_probe_sweep index_recall_matrix
source_lm_matrix unigram_logprob bigram_logprob
brat_export brat_import brat_to_bert
heavy_hitters_cms ancestor_table ontology_closure
concepts_exclude_subtree window_dup
window_dedup_apply quality_classifier doc_fingerprint ngram_counts
decontaminate contamination_report decontaminate_bloom repetition_stats
training_pipeline quality_filter dedup_minhash minhash_precision
minhash_est lsh_band_tuning dedup_incremental dedup_incremental_staged
dedup_minhash_hashed dedup_clusters dedup_cluster_stats dedup_keep_best
dedup_soft_weights decontaminate_fuzzy split_leakage
sentences sentences_punct sentences_kernel chunk_stride
span_dedup span_dedup_apply intra_doc_dedup boilerplate_strip
dedup_exact dedup_norm sentence_pairs sentence_pairs_kw relation_paths
dp_input_export dp_sentences semmed_eval_rows concept_pair_sentences
cooccur_counts_title_annot bigquery_load_zones bicluster_sentences
bicluster_bert medline_ingest medline_entities medline_metadata
medline_subsup medline_deletes medline_pmid_files doc_upsert
doc_upsert_delete pmid_html_flag pmid_to_year webanno_export
inception_export sentence_cooccur_export text_export es_docs es_bulk
export_flat bionlp_export batch_stats batch_overlap""".split())

# driver r16 readings adjudicated as machine-moment noise
# (PERF_AUDIT_r17 par.1: the three BENCH_r16 flags measured at baseline in
# both the post-change r16a full-suite run and this round's isolated
# re-runs, with their code paths untouched in r16)
ADJUDICATED_NOISE = {"bm25_topk", "concept_pairs_neg", "split_leakage"}

HEADROOM = 1.5

def main():
    detail = json.load(open(sys.argv[1]))
    ours = dict(detail["queries"])
    # ADVICE r16: a failed query's recorded "warm" value is its
    # time-to-exception (often ~0 s) — never freeze it as a baseline.
    failed = [q for q in detail.get("failed", []) if q in ours]
    if failed:
        print(f"[refreeze] EXCLUDING {len(failed)} failed queries "
              f"(time-to-exception is not a baseline): {' '.join(sorted(failed))}")
        for q in failed:
            ours.pop(q)
    R1 = r1_query_set(detail)
    prior = {}
    d = json.load(open("BENCH_r16.json"))
    blocks = re.findall(r"\[bench-queries (\d+)\] (\{[^}]*\})", d["tail"])
    # ADVICE r14: the flat-object regex silently drops readings if the
    # bench log format ever nests or wraps - surface the recovery rate so
    # a parser/format mismatch cannot quietly fall back to own-value x1.5
    expected = max((int(i) for i, _ in blocks), default=0)
    print(f"[refreeze] recovered {len(blocks)} bench-queries blocks "
          f"(highest index {expected}) from BENCH_r16.json tail")
    if blocks and len(blocks) != expected:
        print(f"[refreeze] WARNING: block indexes not contiguous - "
              f"{expected - len(blocks)} block(s) unparsed; their queries "
              f"fall back to own-value x{HEADROOM}")
    for _, js in blocks:
        prior.update(json.loads(js))
    prior.update(d["parsed"]["queries"])  # slowest-20
    # not healthy observations: adjudicated-noise readings plus every
    # plan-changed query
    for q in (*ADJUDICATED_NOISE, *PLAN_CHANGED):
        prior.pop(q, None)

    out = {}
    for q, v in sorted(ours.items()):
        out[q] = round(max(prior.get(q, 0.0), v * HEADROOM), 3)
    r1_total = round(sum(v for q, v in out.items() if q in R1), 3)
    comment = ("per-query warm (min-of-2) baselines at sf0.1, RE-FROZEN for "
        "r17 (the r16 round ended before its re-freeze, so this freeze "
        "replaces r15's; the three adjudicated-noise r16 driver readings "
        "and the r17 BPE plan family use own values). Per "
        "query = max(driver r16 in-suite value where recoverable from "
        "BENCH_r16.json, healthy, and plan-unchanged since, own full-suite "
        "driver-protocol run x1.5 "
        "driver-conditions headroom). warm_total_r1_queries = sum of the "
        "new values over the r1 set (keeps Bench.scala's machine-state "
        "normalization internally consistent). Prior freeze kept at "
        "bench_per_query_sf0.1_r15.json.")
    blob = {"_comment": comment, "warm_total_r1_queries": r1_total, "queries": out}
    with open("baselines/bench_per_query_sf0.1.json", "w") as f:
        json.dump(blob, f, indent=1)
    n_drv = sum(1 for q in out if prior.get(q, 0.0) >= out[q])
    print(f"froze {len(out)} queries (r1 total {r1_total}); "
          f"{n_drv} denominators from driver r16 readings, "
          f"{len(out) - n_drv} from own-value x{HEADROOM}")

if __name__ == "__main__":
    main()
