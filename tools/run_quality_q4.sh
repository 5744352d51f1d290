#!/bin/bash
# Shadow-consistent reference-scale quality run (out/skirt_q4) with
# auto-resume: the dev tunnel kills long device programs every so often,
# so each attempt is bounded and relaunched with --resume (state.pkl is
# snapshotted every save_interval=250 iters).
#
# Usage: bash tools/run_quality_q4.sh [max_attempts]
# Pause between attempts: touch out/skirt_q4/STOP (remove to allow restart).
set -u
cd "$(dirname "$0")/.."
N=${1:-24}
CFG=configs/synthetic_skirt_512_shadowed.json
OUT=out/skirt_q4
mkdir -p "$OUT"
[ -f /tmp/skirt.obj ] || python tools/make_synthetic_gt.py skirt /tmp/skirt.obj

rc=1
for i in $(seq 1 "$N"); do
  if [ -f "$OUT/STOP" ]; then
    echo "=== STOP file present; exiting (resume later with --resume) ===" >> "$OUT/train.log"
    exit 3
  fi
  echo "=== attempt $i/$N $(date -u +%H:%M:%S) ===" >> "$OUT/train.log"
  timeout 3000 python -u train_gshell.py --config "$CFG" \
    --ref-mesh /tmp/skirt.obj -o "$OUT" --resume --snapshot-images 0 \
    --log-interval 25 >> "$OUT/train.log" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== run complete rc=0 ===" >> "$OUT/train.log"
    break
  fi
  echo "=== attempt $i died rc=$rc; waiting for tunnel recovery ===" >> "$OUT/train.log"
  sleep 60
done
# exit non-zero when every attempt failed (ADVICE r4)
exit $rc
