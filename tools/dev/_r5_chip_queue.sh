#!/bin/bash
# Round-5 chip measurement queue — runs AFTER the skirt_q4 quality run
# completes.  Each stage is bounded, logs to out/r5/, and waits out tunnel
# recovery between stages (killed clients leave server-side claims).
set -u
cd "$(dirname "$0")/../.."
LOG=out/r5
mkdir -p "$LOG"

probe() {
  # wait until a tiny device program completes (tunnel healthy)
  for i in $(seq 1 12); do
    if timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray((jnp.ones((64,64))@jnp.ones((64,64))).ravel()[:1]); print('ok')" \
        2>/dev/null | grep -q ok; then
      return 0
    fi
    echo "probe $i failed; waiting 120s" >> "$LOG/queue.log"
    sleep 120
  done
  return 1
}

stage() {
  name=$1; shift
  echo "=== stage $name $(date -u +%H:%M:%S) ===" >> "$LOG/queue.log"
  probe || { echo "tunnel dead; skipping $name" >> "$LOG/queue.log"; return 1; }
  ("$@") > "$LOG/$name.log" 2>&1
  rc=$?
  echo "=== stage $name done rc=$rc $(date -u +%H:%M:%S) ===" >> "$LOG/queue.log"
  sleep 30
}

# 1. held-out PSNR + Chamfer of the finished skirt_q4 (shadow-consistent)
stage eval_q4 timeout 3000 python eval_reconstruction.py \
  --state out/skirt_q4/state.pkl \
  --config configs/synthetic_skirt_512_shadowed.json \
  --synthetic-ref-mesh /tmp/skirt.obj --gt-mesh /tmp/skirt.obj \
  --out-dir out/skirt_q4/validate

# 2. diffusion working point, measured on-chip (VERDICT #2)
stage diff128 timeout 3000 python tools/bench_diffusion.py 128 1 6

# 3. one full train step at tet-256 (VERDICT #3)
stage tet256 env GSHELL_CAP_SAFETY=0.5 timeout 3400 python bench.py --one 512,256,8,2
grep -q '"value"' "$LOG/tet256.log" || \
  stage tet256_b1 env GSHELL_CAP_SAFETY=0.5 timeout 3400 python bench.py --one 512,256,8,1

# 4. fresh per-stage attribution ladder at the headline point (VERDICT #5)
stage ablate_full  timeout 3000 python bench.py --one 512,64,8,1
stage ablate_spp1  timeout 3000 python bench.py --one 512,64,1,1
stage ablate_kd    env GSHELL_BSDF=kd GSHELL_NO_DENOISER=1 timeout 3000 python bench.py --one 512,64,8,1
stage ablate_nobudget env GSHELL_SHADE_BUDGET=-1 timeout 3000 python bench.py --one 512,64,8,1
stage ablate_jitterfull env GSHELL_JITTER_TAP=1.0 timeout 3000 python bench.py --one 512,64,8,1

# 5. headline bench (also warms the persistent compile cache for the driver)
stage bench_full timeout 3400 python bench.py

echo "=== queue complete $(date -u +%H:%M:%S) ===" >> "$LOG/queue.log"

# 6. device-trace DRAM attribution (VERDICT #7) — measured bytes, not the
# cost model; output parsed by _trace_agg.py
stage trace timeout 3000 python tools/dev/_trace_step.py 512,64,8,1 60
