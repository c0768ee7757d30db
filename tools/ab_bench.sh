#!/bin/bash
# Same-session A/B bench harness (round-21 measurement tooling — NOT part
# of the driver contract). Alternates a baseline classpath and the working
# tree's classpath over the same query list in fresh JVMs, using the Bench
# main's own methodology (noop sink, 3/5-run medians, canary gating), so
# per-row comparisons are within one host window.
#
# Usage:
#   tools/ab_bench.sh <query-list> <tag> [runs] <baseline-cp-file> <work-cp-file>
# where each *-cp-file contains a java classpath whose FIRST entry is the
# side's compiled classes directory (e.g. /tmp/graft_head/target/scala-2.13/
# classes for a git worktree of the baseline commit). Build one with:
#   sbt -batch 'export Runtime/fullClasspath' | tail -1 > /tmp/cp.txt
# Results land in target/abx_<tag>_{head,work}.json; compare per-query
# seconds AND each side's canary_par_ms (a reading under an elevated canary
# is host steal, not engine cost — see SCALE.md's benchmark discipline).
set -eu
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() {
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_BENCH_ONLY="$1" SPARK_GRAFT_BENCH_OUT="$2" SPARK_GRAFT_BENCH_RUNS="$3" \
  SPARK_GRAFT_BENCH_SLOPE=0 \
  java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
    -cp "$(cat "$4")" graft.Bench 2>/dev/null >/dev/null
}
run "$1" "target/abx_${2}_head.json" "${3:-5}" "$4"
run "$1" "target/abx_${2}_work.json" "${3:-5}" "$5"
