#!/bin/bash
# One-shot 10x evidence pipeline (r14): full-suite BENCH_10x.json +
# isolated-JVM algo probes (merged under "isolated_probes", closing the
# half-done r12 task) + LSH/IVF/int8 recall@10 on the 10x corpus
# (merged under "recall_10x").
#
# Usage: tools/scale10x_all.sh [dataDir]
set -euo pipefail
cd "$(dirname "$0")/.."
DATA=${1:-/tmp/graft_sf10x}

tools/bench10x.sh "$DATA"

SPARK_GRAFT_PROBE_ALGOS=${SPARK_GRAFT_PROBE_ALGOS:-q_kcore,q_labelprop,q_pagerank,q_ppr,q_concomp,q_triangles,q_scc} \
  tools/probe_algos.sh "$DATA" /tmp/probe_algos.json

sbt -batch "runMain graft.tools.RecallProbe $DATA" | grep -o '{.*}' \
  | tail -1 > /tmp/recall_10x.json

python3 - <<'EOF'
import json
b = json.load(open("BENCH_10x.json"))
b["isolated_probes"] = json.load(open("/tmp/probe_algos.json"))
b["recall_10x"] = json.load(open("/tmp/recall_10x.json"))
json.dump(b, open("BENCH_10x.json", "w"), indent=1)
print("merged isolated_probes + recall_10x into BENCH_10x.json")
EOF
