#!/bin/bash
# Degraded-window envelope measurement (BENCHNOTES r19, verdict ask #2):
# run the driver-outlier families under a SYNTHETIC CPU antagonist that
# pushes the calib probe to ~1.0 (the degraded end of the r18 driver
# window), so driver lines taken in storms can be adjudicated against a
# MEASURED degraded envelope instead of a stacked guess.
#
# Usage: tools/degraded_window_bench.sh <n_spinners> <out_log>
# (run from /root/repo; requires a quiet box otherwise)
set -u
N="${1:-16}"
OUT="${2:-benchlogs/degraded_window_r19.log}"
PIDS=()
cleanup() { for p in "${PIDS[@]}"; do kill "$p" 2>/dev/null; done; }
trap cleanup EXIT
echo "[antagonist] starting $N cpu spinners" | tee "$OUT"
for _ in $(seq "$N"); do
  bash -c 'while :; do :; done' &
  PIDS+=($!)
done
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_ONLY=token_unigram,table_merge_sync,table_lifecycle,table_profile,table_admin \
  sbt -batch "runMain graft.Bench" >> "$OUT" 2>&1
echo "[antagonist] rc=$? done" | tee -a "$OUT"
