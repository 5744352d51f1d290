#!/bin/bash
# Round-5 chip queue, part 2: diffusion-128 retry (subtree grads + bf16
# mu/ema), PSNR-noise-floor diagnostic, spp-32 held-out eval, blob
# watertight quality run.
set -u
cd "$(dirname "$0")/../.."
LOG=out/r5
mkdir -p "$LOG"

probe() {
  for i in $(seq 1 12); do
    if timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray((jnp.ones((64,64))@jnp.ones((64,64))).ravel()[:1]); print('ok')" \
        2>/dev/null | grep -q ok; then
      return 0
    fi
    echo "probe $i failed; waiting 120s" >> "$LOG/queue2.log"
    sleep 120
  done
  return 1
}

stage() {
  name=$1; shift
  echo "=== stage $name $(date -u +%H:%M:%S) ===" >> "$LOG/queue2.log"
  probe || { echo "tunnel dead; skipping $name" >> "$LOG/queue2.log"; return 1; }
  ("$@") > "$LOG/$name.log" 2>&1
  rc=$?
  echo "=== stage $name done rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG/queue2.log"
  sleep 30
}

# 1. diffusion 128^3 retry with the residency fixes
stage diff128_v2 timeout 3400 python tools/bench_diffusion.py 128 1 6

# 2. MC-noise floor of the synthetic GT (PSNR ceiling bisect, VERDICT #1)
stage psnr_floor timeout 3000 python tools/dev/_r5_psnr_floor.py \
  configs/synthetic_skirt_512_shadowed.json /tmp/skirt.obj 2

# 3. held-out eval at spp 32 (same state; pushes the noise floor down)
stage eval_q4_spp32 timeout 3400 python eval_reconstruction.py \
  --state out/skirt_q4/state.pkl \
  --config configs/synthetic_skirt_512_shadowed.json \
  --synthetic-ref-mesh /tmp/skirt.obj --spp 32 \
  --out-dir out/skirt_q4/validate_spp32

# 3b. mc_block sweep (the MC loop is the top stage: ~490 ms of the b1
# step per the fresh ablation; block size trades loop trips vs transient)
stage mcblock16 env GSHELL_MC_BLOCK=16 timeout 3000 python bench.py --one 512,64,8,1
stage mcblock32 env GSHELL_MC_BLOCK=32 timeout 3000 python bench.py --one 512,64,8,1

# 4. watertight quality rung (blob, 1500 iters ~80 min + restarts)
bash tools/run_quality.sh blob configs/synthetic_blob_512_shadowed.json out/blob_q1 24
echo "=== queue2 complete $(date -u +%H:%M:%S) ===" >> "$LOG/queue2.log"
