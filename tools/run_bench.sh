#!/bin/bash
# Run graft.Bench outside sbt (plain java over the compiled classes +
# the unmanaged Spark jars) so long soaks don't hold the sbt lock.
# Usage: SPARK_GRAFT_SF_DIR=... [SPARK_GRAFT_BENCH_ONLY=...] \
#        [SPARK_GRAFT_BENCH_PASSES=3] tools/run_bench.sh OUT.json
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:?usage: run_bench.sh OUT.json}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# SPARK_BENCH_EXTRA_OPTS: extra -D/JVM flags (e.g. longer
# spark.network.timeout for deep-regime soaks where a full-GC pause can
# outlive the 120 s local-mode heartbeat and kill the executor).
# Bench prints the detailed record then a short total-only one (the
# short line exists so the driver's small stdout-tail window always
# catches a parseable record). A FILE copy wants exactly one record —
# the duplicate second line confused consumers (ADVICE r12) — so keep
# only the detailed per-query record here.
TMP=$(mktemp)
trap 'rm -f "$TMP"' EXIT
java $ADD_OPENS ${SPARK_BENCH_EXTRA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dfile.encoding=UTF-8 \
  -Xmx"${SPARK_DRIVER_MEM:-32g}" -XX:ReservedCodeCacheSize=512m \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench > "$TMP"
grep -m1 '"per_query_stat"' "$TMP" > "$OUT"
