#!/bin/bash
# Definitive N->4N scaling-gate window (BENCH/BASELINE.md §0, round-4/5
# revision): local[2] -> local[8] at 4M docs, BOTH forms, one fresh JVM per
# leg, corpus-sized heap, untimed warm-up + min-of-3 reps, mode-interleaved
# legs, tmpfs scratch + snapshot roots (the single-box analog of node-local
# NVMe / object-store bandwidth that scales with cluster size), and a
# whole-window host-noise fingerprint.
#
# Usage: bash tools/run_scaling_window.sh [nDocs] [tag] [legs...]
#   legs default: "2 checkpoint" "8 checkpoint" "2 snapshot" "8 snapshot"
set -euo pipefail
cd "$(dirname "$0")/.."

NDOCS="${1:-4000000}"
TAG="${2:-r5d}"
shift 2 2>/dev/null || true
if [ $# -gt 0 ]; then LEGS=("$@"); else
  LEGS=("2 checkpoint" "8 checkpoint" "2 snapshot" "8 snapshot")
fi

export SPARK_GRAFT_CORPUS_DIR=/dev/shm/graftcorpus_${NDOCS}
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/graft_scratch
export SPARK_GRAFT_SNAP_ROOT=/dev/shm/graft_snap
export SPARK_DRIVER_MEM=24g
export SPARK_GRAFT_BENCH_REPS="${SPARK_GRAFT_BENCH_REPS:-3}"
mkdir -p "$SPARK_GRAFT_CORPUS_DIR" BENCH

python3 tools/host_window_monitor.py "BENCH/${TAG}_window.json" --interval 10 &
MON=$!
trap 'kill -TERM $MON 2>/dev/null || true' EXIT

for leg in "${LEGS[@]}"; do
  set -- $leg
  CORES=$1; MODE=$2
  echo "=== leg local[$CORES] $MODE (reps=$SPARK_GRAFT_BENCH_REPS) $(date -u +%H:%M:%S) ===" >&2
  SPARK_GRAFT_CORES=$CORES SPARK_GRAFT_SCALING_MODE=$MODE \
    sbt -batch "runMain graft.ScalingBench $NDOCS BENCH/${TAG}_c${CORES}_${MODE}.json" \
    > "/tmp/${TAG}_c${CORES}_${MODE}.log" 2>&1
  grep -E '^\[scaling\]|cascade_time' "/tmp/${TAG}_c${CORES}_${MODE}.log" | tail -8 >&2 || true
done

kill -TERM $MON 2>/dev/null || true
wait $MON 2>/dev/null || true
echo "window done: BENCH/${TAG}_*.json" >&2
