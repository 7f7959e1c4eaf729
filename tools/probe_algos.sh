#!/bin/bash
# r12 verdict item 7: the iterative-algo 10x medians sit in a GC/JIT
# band (8-16x) the shared 111-query session can't attribute — probe
# each algo ISOLATED (fresh JVM, single query, 5 runs) so the median
# reflects the algorithm, not cumulative multi-query JVM pressure.
# Results merge into BENCH_10x.json under "isolated_probes".
#
# Usage: tools/probe_algos.sh [dataDir] [outJson]
set -euo pipefail
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/graft_sf10x}
OUT=${2:-/tmp/probe_algos.json}
ALGOS=${SPARK_GRAFT_PROBE_ALGOS:-q_kcore,q_labelprop,q_pagerank,q_ppr,q_concomp,q_triangles}
echo "{}" > "$OUT"
for q in ${ALGOS//,/ }; do
  echo "[probe] $q"
  # r14: probes launched back-to-back inherit the previous JVM's load
  # (load_start 11-18 in the first merged artifact; triangles max 205s)
  # — cool down so each probe starts near-idle. 60s proved too short
  # (r16: load_start still 3.9-9.1, kcore median 2.5x its min); a
  # 32-core 1-min load average needs ~3 min to decay below 1.
  sleep "${SPARK_GRAFT_PROBE_COOLDOWN:-300}"
  # subset runs write bench_subset.json (r20) — the committed
  # full-suite artifacts are never touched by a probe
  SPARK_GRAFT_SF_DIR=$DATA SPARK_GRAFT_BENCH_ONLY=$q \
    SPARK_GRAFT_BENCH_RUNS=${SPARK_GRAFT_BENCH_RUNS:-5} \
    SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
    sbt -batch "runMain graft.Bench" > /tmp/probe_$q.log 2>&1 || {
      echo "[probe] $q FAILED"; tail -5 /tmp/probe_$q.log; exit 1; }
  python3 - "$q" "$OUT" <<'EOF'
import json, sys
q, out = sys.argv[1], sys.argv[2]
b = json.load(open("bench_subset.json"))
d = json.load(open(out))
d[q] = {"median": b["queries"][q], "min": b["queries_min"][q],
        "max": b["queries_max"][q], "load_start": b["load_start"]}
json.dump(d, open(out, "w"), indent=1)
print(q, d[q])
EOF
done
echo "[probe] wrote $OUT"
