#!/bin/bash
# FULL-SUITE sf10 (100x bytes vs sf0.1) driver-protocol probe — VERDICT
# r15 item 1: extend the 37/66-query r15 probes to every driver query, so
# all 311 keys carry a 100x-bytes reading. Driven through graft.Bench's
# min-of-2 warm protocol via java -cp (no sbt lock); with
# baselines/bench_per_query_sf10.json frozen, Bench's own regression gate
# adjudicates per-query drift at this ladder point too.
# Usage: tools/run_sf10_full.sh <outDetailJson>
set -u
# both r16 probe deaths were environmental (fd cap, stale-spill ENOSPC) —
# gate the launch (VERDICT r16 item 7)
bash "$(dirname "$0")/probe_env_gate.sh" || exit 1
OUT=${1:-target/bench_detail_sf10_r16.json}
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_SF_DIR=/tmp/graft-scale/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_DETAIL="$OUT" \
java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench
