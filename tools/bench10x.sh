#!/bin/bash
# Standing 10x-scale rehearsal (r9/r10 verdicts: every real scale bug so
# far surfaced at 10x, but the evidence was a one-off prose run).
#
# Materializes an id-offset 10x copy of sf0.1 (graft.tools.Scale10x),
# runs the FULL query set — including the q_write_* tier, never before
# exercised above sf0.1 — at 3-run medians with a 64g driver heap
# (local[32] holds executor-sized state in one JVM; real clusters get
# per-executor heaps), and records the artifact as BENCH_10x.json.
#
# Partitions stay at 32 (= cores): measured at 10x, both 128 fixed
# partitions and size-first AQE coalescing LOST to 32 — local shuffles
# are ≤GB, so core utilization dominates task sizing. The 91-query 10x
# run needs the bigger heap for cumulative multi-query JVM pressure
# (q_triangles OOM'd at 48g with the full set), not per-task state.
#
# Heavy tail is FRESH-JVM PRIMARY (r19 verdict #5): at 200 queries the
# in-suite number for the >=30s-at-10x tier mostly measures cumulative
# JVM pressure, not the operator (q_ktruss read 219.6s in-suite vs
# 74.4s isolated in r19). After the suite run, each query in
# SPARK_GRAFT_10X_ISOLATED (default: the measured heavy tier) reruns
# in its own cooled-down JVM and its median REPLACES the in-suite
# number in BENCH_10x.json "queries"/"value"; the in-suite figure is
# preserved under "queries_insuite" and the substituted set is listed
# in "isolated_primary". Set SPARK_GRAFT_10X_ISOLATED= (empty) to skip.
#
# Usage: tools/bench10x.sh [dataDir]   (default /tmp/graft_sf10x)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/graft_sf10x}
MEM=${SPARK_DRIVER_MEM:-64g}

if [ ! -f "$OUT/lineitem.parquet/_SUCCESS" ] && [ ! -d "$OUT/lineitem.parquet" ]; then
  SPARK_DRIVER_MEM=$MEM sbt -batch "runMain graft.tools.Scale10x $OUT"
else
  echo "[bench10x] reusing existing $OUT"
fi
# Bench writes BOTH bench_out.json and BENCH_OUT.json — preserve the
# sf0.1 artifacts around the 10x run (r14: only the uppercase one was
# restored, silently leaving 10x numbers in the committed lowercase file).
cp BENCH_OUT.json /tmp/BENCH_OUT.sf01.bak 2>/dev/null || true
cp bench_out.json /tmp/bench_out.sf01.bak 2>/dev/null || true
# r20 advice: the fresh-JVM loop (5 queries x >=300s cooldown + sbt +
# a python patch step) widened the window where any set -e abort left
# the committed artifacts holding 10x numbers — restore on ANY exit,
# not just the happy path at script end.
trap 'cp /tmp/BENCH_OUT.sf01.bak BENCH_OUT.json 2>/dev/null || true; \
      cp /tmp/bench_out.sf01.bak bench_out.json 2>/dev/null || true' EXIT
SPARK_GRAFT_SF_DIR=$OUT SPARK_GRAFT_BENCH_RUNS=${SPARK_GRAFT_BENCH_RUNS:-3} \
  SPARK_DRIVER_MEM=$MEM sbt -batch "runMain graft.Bench"
cp BENCH_OUT.json BENCH_10x.json

# fresh-JVM primaries for the heavy tail (see header). Cooldown default
# 300s (r20: a q_louvain2 probe at 180s read 106.8s vs 33.1s tight at
# 300s — the 1-min load average decays faster than the actual
# cache/GC machine state, so 180s is NOT enough after a full suite).
HEAVY=${SPARK_GRAFT_10X_ISOLATED-q_ktruss,q_hyperball_nf,q_triangles,q_kcore,q_louvain2}
for q in ${HEAVY//,/ }; do
  echo "[bench10x] fresh-JVM primary: $q"
  sleep "${SPARK_GRAFT_10X_COOLDOWN:-300}"
  SPARK_GRAFT_SF_DIR=$OUT SPARK_GRAFT_BENCH_ONLY=$q \
    SPARK_GRAFT_BENCH_RUNS=${SPARK_GRAFT_10X_PROBE_RUNS:-3} \
    SPARK_DRIVER_MEM=$MEM sbt -batch "runMain graft.Bench"
  python3 - "$q" <<'PY'
import json, sys
q = sys.argv[1]
iso = json.load(open("bench_subset.json"))
big = json.load(open("BENCH_10x.json"))
# r20 advice: a probe whose query errored writes no entry — skip the
# substitution instead of KeyError-ing the whole rehearsal
if q not in iso.get("queries", {}):
    print(f"[bench10x] {q}: probe has no timing (errored?) - keeping in-suite number")
    sys.exit(0)
big.setdefault("queries_insuite", {})[q] = big["queries"].get(q)
big.setdefault("isolated_primary", [])
if q not in big["isolated_primary"]:
    big["isolated_primary"].append(q)
for k in ("queries", "queries_min", "queries_max"):
    big[k][q] = iso[k][q]
big["value"] = round(sum(big["queries"].values()), 3)
json.dump(big, open("BENCH_10x.json", "w"))
print(f"[bench10x] {q}: isolated {iso['queries'][q]}s "
      f"(in-suite {big['queries_insuite'][q]}s)")
PY
done

cp /tmp/BENCH_OUT.sf01.bak BENCH_OUT.json 2>/dev/null || true
cp /tmp/bench_out.sf01.bak bench_out.json 2>/dev/null || true
echo "wrote BENCH_10x.json"
