#!/bin/bash
# Round-13 SCALE.md experiments (run each phase on an otherwise-idle box):
#   graphs  — post-flip (plan-as-written) sf0.1→sf1 exponents for the
#             remaining big graph slots (VERDICT r12 item 2):
#             wl, katz, kcore, closeness, communities; isolated JVMs,
#             fixed 16-file row-group-balanced layout, warmup + 3 runs
#   fanout1 — stabilizeAll single-action epochs vs the sequential fanout
#             at N in {8, 32} views (VERDICT r12 item 3)
set -euo pipefail
cd "$(dirname "$0")/.."
PHASE="${1:-all}"

if [[ "$PHASE" == "graphs" || "$PHASE" == "all" ]]; then
  for q in graph_wl graph_katz graph_kcore graph_closeness graph_communities; do
    for sf in /root/testdata/sf0.1 /tmp/graft_sf1; do
      tag=$(basename "$sf")
      out="/tmp/r13_graph_${q}_${tag}.json"
      SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g \
      SPARK_GRAFT_BENCH_FILTER="^${q}\$" SPARK_GRAFT_BENCH_WARMUP=1 \
      SPARK_GRAFT_BENCH_OUT="$out" \
      tools/run_main.sh graft.Bench 2>&1 | grep -E "^\[bench\]" || true
      echo "== $q $tag -> $out"
    done
  done
fi

if [[ "$PHASE" == "fanout1" || "$PHASE" == "all" ]]; then
  for shape in fanout fanout_one; do
    for n in 8 32; do
      SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g \
      tools/run_main.sh graft.EpochBudget /tmp/graft_sf1 10 "$shape" "$n" \
        2>&1 | grep -E "^\{" || true
    done
  done
fi
