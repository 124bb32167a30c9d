#!/bin/bash
# Round-12 SCALE.md experiments (run each phase on an otherwise-idle box):
#   gen      — regenerate /tmp/graft_sf1 (10x) and /tmp/graft_sf3 (30x, ONE layer)
#   parts    — sf3 scaled-partitions confirmation: dedup_minhash + linkage_ed1
#              at 16 vs 48 shuffle partitions, fixed 16 cores (VERDICT r11 item 4)
#   fanout   — IVM view-DAG fan-out: N in {1,8,32} dependent views at sf1
#              (VERDICT r11 item 6)
set -euo pipefail
cd "$(dirname "$0")/.."
PHASE="${1:-all}"

if [[ "$PHASE" == "gen" || "$PHASE" == "all" ]]; then
  SPARK_GRAFT_CPUS=16 tools/run_main.sh graft.GenScale /root/testdata/sf0.1 /tmp/graft_sf1 10
  SPARK_GRAFT_CPUS=16 tools/run_main.sh graft.GenScale /root/testdata/sf0.1 /tmp/graft_sf3 30
fi

if [[ "$PHASE" == "parts" || "$PHASE" == "all" ]]; then
  for q in dedup_minhash linkage_ed1; do
    for p in 16 48; do
      out="/tmp/r12_parts_${q}_p${p}.json"
      SPARK_GRAFT_SF_DIR=/tmp/graft_sf3 SPARK_GRAFT_CPUS=16 \
      SPARK_GRAFT_SHUFFLE_PARTITIONS=$p SPARK_DRIVER_MEM=48g \
      SPARK_GRAFT_BENCH_FILTER="^${q}\$" SPARK_GRAFT_BENCH_WARMUP=1 \
      SPARK_GRAFT_BENCH_OUT="$out" \
      tools/run_main.sh graft.Bench 2>&1 | grep -E "^\[bench\]|^\{" || true
      echo "== $q p=$p -> $out"
    done
  done
fi

if [[ "$PHASE" == "fanout" || "$PHASE" == "all" ]]; then
  for n in 1 8 32; do
    SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g \
    tools/run_main.sh graft.EpochBudget /tmp/graft_sf1 10 fanout "$n" \
      2>&1 | grep -E "^\{" || true
  done
fi
