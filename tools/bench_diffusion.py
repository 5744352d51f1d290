"""G-MeshDiffusion train-step throughput on the real chip.

Reference working point: UNet3D on (4,128^3) grids + (1,256^3) occ, global
batch 8x1x4 over 8 GPUs (SURVEY 2.5).  Single-chip measurement here: one
micro-step at the given grid size; multi-chip scales by DP (see
dryrun_multichip).

Usage: python tools/bench_diffusion.py [grid_size] [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, ".")
    from gshell_tpu.train.diffusion import DiffusionTrainConfig, DiffusionTrainer

    d = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from gshell_tpu.models.unet3d import UNet3DConfig

    cfg = DiffusionTrainConfig(grid_size=d, data_ch=4, use_occ=True,
                               num_grad_acc_steps=1, warmup=10)
    # single-chip memory policy: ResBlock remat + bf16 compute (params f32)
    unet_cfg = UNet3DConfig(data_ch=4, use_occ=True, remat=True,
                            compute_dtype="bfloat16")
    trainer = DiffusionTrainer(cfg, unet_cfg=unet_cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"UNet3D params: {n_params/1e6:.1f}M  grid {d}^3 occ {2*d}^3 batch {b}")

    key = jax.random.PRNGKey(1)
    batch = {
        "grid": jnp.ones((1, b, d, d, d, 4)) * 0.1,
        "occgrid": jnp.ones((1, b, 2 * d, 2 * d, 2 * d, 1)) * 0.1,
    }
    t0 = time.time()
    state, m = trainer.train_step(state, key, batch)
    print(f"compile+first: {time.time()-t0:.1f}s loss={float(m['loss']):.4f}")
    n = 10
    t0 = time.time()
    for i in range(n):
        key, k = jax.random.split(key)
        state, m = trainer.train_step(state, k, batch)
    float(m["loss"])
    dt = (time.time() - t0) / n
    print(f"train step: {dt*1000:.1f} ms  ({1/dt:.2f} it/s)")


if __name__ == "__main__":
    main()
