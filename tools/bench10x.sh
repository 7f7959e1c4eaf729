#!/bin/bash
# Standing 10x-scale rehearsal (r9/r10 verdicts: every real scale bug so
# far surfaced at 10x, but the evidence was a one-off prose run).
#
# Materializes an id-offset 10x copy of sf0.1 (graft.tools.Scale10x),
# runs the FULL query set — including the q_write_* tier, never before
# exercised above sf0.1 — at 3-run medians with a 48g driver heap
# (local[32] holds executor-sized state in one JVM; real clusters get
# per-executor heaps), and records the artifact as BENCH_10x.json.
#
# Usage: tools/bench10x.sh [dataDir]   (default /tmp/graft_sf10x)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/graft_sf10x}
MEM=${SPARK_DRIVER_MEM:-48g}

SPARK_DRIVER_MEM=$MEM sbt -batch "runMain graft.tools.Scale10x $OUT"
SPARK_GRAFT_SF_DIR=$OUT SPARK_GRAFT_BENCH_RUNS=${SPARK_GRAFT_BENCH_RUNS:-3} \
  SPARK_DRIVER_MEM=$MEM sbt -batch "runMain graft.Bench"
cp BENCH_OUT.json BENCH_10x.json
echo "wrote BENCH_10x.json"
