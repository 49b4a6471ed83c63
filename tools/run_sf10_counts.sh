#!/bin/bash
# Row-count evidence for the output-driven pair families at sf10 — the
# "wall ratio <= max(bytes ratio, TRUE output ratio)" check needs result-set
# sizes, which Bench's timing detail doesn't carry. Dumps via graft.Verify
# (restricted) and counts with pyarrow. Run AFTER the timing probe so the
# dump doesn't perturb it.
set -u
OUTDIR=${1:-/tmp/sf10_counts}
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
rm -rf "$OUTDIR"
SPARK_GRAFT_CPUS=32 \
java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify /tmp/graft-scale/sf10 "$OUTDIR" \
  emb_dup_pairs simhash_pairs ngram_jaccard span_dedup dedup_norm \
  semantic_clusters doc_fingerprint
python3 - "$OUTDIR" <<'EOF'
import sys, os, json
import pyarrow.parquet as pq
out = {}
d = sys.argv[1]
for name in sorted(os.listdir(d)):
    p = os.path.join(d, name)
    if os.path.isdir(p):
        n = sum(pq.read_metadata(os.path.join(p, f)).num_rows
                for f in os.listdir(p) if f.endswith(".parquet"))
        out[name] = n
print(json.dumps(out))
EOF
