#!/bin/bash
# Reference-scale quality run with auto-resume: the dev tunnel kills long
# device programs every so often, so each attempt is bounded (timeout) and
# relaunched with --resume (state.pkl is snapshotted every save_interval).
#
# Usage: bash tools/run_quality.sh <gt_kind> <config> <out_dir> [max_attempts]
#   e.g. bash tools/run_quality.sh blob configs/synthetic_blob_512_shadowed.json out/blob_q1 24
# Pause between attempts: touch <out_dir>/STOP (remove to allow restart).
# Exits non-zero if every attempt failed (rc of the last attempt).
set -u
cd "$(dirname "$0")/.."
KIND=${1:?gt kind (sphere|skirt|blob)}
CFG=${2:?config json}
OUT=${3:?out dir}
N=${4:-24}
GT=/tmp/${KIND}_gt.obj
mkdir -p "$OUT"
[ -f "$GT" ] || python tools/make_synthetic_gt.py "$KIND" "$GT"

rc=1
for i in $(seq 1 "$N"); do
  if [ -f "$OUT/STOP" ]; then
    echo "=== STOP file present; exiting (resume later with --resume) ===" >> "$OUT/train.log"
    exit 3
  fi
  echo "=== attempt $i/$N $(date -u +%H:%M:%S) ===" >> "$OUT/train.log"
  timeout 3000 python -u train_gshell.py --config "$CFG" \
    --ref-mesh "$GT" -o "$OUT" --resume --snapshot-images 0 \
    --log-interval 25 >> "$OUT/train.log" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== run complete rc=0 ===" >> "$OUT/train.log"
    break
  fi
  echo "=== attempt $i died rc=$rc; waiting for tunnel recovery ===" >> "$OUT/train.log"
  sleep 60
done
exit $rc
