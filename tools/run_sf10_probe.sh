#!/bin/bash
# sf10 (100x bytes vs sf0.1) scale probe — the r15 pair-density decade
# extended one more: same 37-query set as BENCH_r15_scale.json (sf3.0),
# driven through graft.Bench's min-of-2 warm protocol via java -cp (no sbt
# lock). Usage: tools/run_sf10_probe.sh <outDetailJson>
set -u
OUT=${1:-target/bench_detail_sf10_r15.json}
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
QUERIES="concept_idf cooccur_chi2 cooccur_counts_doc cooccur_metrics_doc dedup_clusters dedup_exact dedup_keep_best dedup_minhash dedup_norm dedup_simhash doc_fingerprint emb_dup_pairs emb_lsh emb_topk emb_topk_native intra_doc_dedup ivf_topk ivfpq_topk ivfsq_topk kg_edges kg_pagerank kgx_edges kmeans_cells lsh_band_tuning minhash_est ngram_jaccard pq_codes pq_topk semantic_clusters semantic_dedup simhash_pairs span_dedup split_leakage sq_codes sq_topk trapi_edges window_dup"
SPARK_GRAFT_SF_DIR=/tmp/graft-scale/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_DETAIL="$OUT" \
java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench $QUERIES
