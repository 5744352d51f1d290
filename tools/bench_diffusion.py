"""G-MeshDiffusion train-step throughput on the real chip.

Reference working point (SURVEY §2.5 / BASELINE.md): dual-head UNet3D on
(4,128³) feature grids + (1,256³) occ grids, global batch = 8 ranks × 1 ×
4 grad-accum, 2.4M optimizer steps
(ref ``GMeshDiffusion/diffusion_configs/config_upper_occgrid_normalized.py:14-34``).

This measures the single-chip micro-step (one (B,128³)+(B,256³) fwd+bwd+
update) and projects the full recipe on v5e-8: DP over 8 chips replaces the
8 NCCL ranks, grad-accum stays a sequential ``lax.scan`` of micro-steps, so

    wall(recipe) ≈ 2.4M × n_accum × t_micro        (chips run their own
                                                    micro-batches in parallel;
                                                    the psum rides ICI)

Usage: python tools/bench_diffusion.py [grid_size] [batch] [n_iters]
Prints one JSON line (ms/step, it/s, params, cost-model MFU/HBM, projection).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from gshell_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from gshell_tpu.models.unet3d import UNet3DConfig
    from gshell_tpu.train.diffusion import DiffusionTrainConfig, DiffusionTrainer

    d = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    cfg = DiffusionTrainConfig(grid_size=d, data_ch=4, use_occ=True,
                               num_grad_acc_steps=1, warmup=10)
    # single-chip memory policy: ResBlock remat + bf16 compute (params f32)
    unet_cfg = UNet3DConfig(data_ch=4, use_occ=True, remat=True,
                            compute_dtype="bfloat16")
    trainer = DiffusionTrainer(cfg, unet_cfg=unet_cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(
        f"# UNet3D params: {n_params/1e6:.1f}M  grid {d}^3 occ {2*d}^3 batch {b}",
        file=sys.stderr,
    )

    key = jax.random.PRNGKey(1)
    batch = {
        "grid": jnp.ones((1, b, d, d, d, 4)) * 0.1,
        "occgrid": jnp.ones((1, b, 2 * d, 2 * d, 2 * d, 1)) * 0.1,
    }
    t0 = time.time()
    state, m = trainer.train_step(state, key, batch)
    loss0 = float(m["loss"])  # scalar transfer syncs (axon: block_until_ready lies)
    compile_sec = time.time() - t0
    print(f"# compile+first: {compile_sec:.1f}s loss={loss0:.4f}", file=sys.stderr)

    step_flops = step_bytes = None
    try:
        ca = type(trainer).train_step.lower(
            trainer, state, key, batch
        ).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_flops = float(ca.get("flops", 0.0))
        step_bytes = float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # best-effort (backends vary)
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    t0 = time.time()
    for _ in range(n):
        key, k = jax.random.split(key)
        state, m = trainer.train_step(state, k, batch)
    float(m["loss"])
    dt = (time.time() - t0) / n
    ips = 1.0 / dt

    # Reference recipe projection on v5e-8 (ref config :32-34): 2.4M optimizer
    # steps × 4 sequential grad-accum micro-steps; 8-way DP is parallel.
    n_accum = 4
    recipe_days = 2.4e6 * n_accum * dt / 86400.0
    out = {
        "metric": f"gmeshdiffusion_train_step(grid{d},occ{2*d},b{b})",
        "value": round(dt * 1000.0, 1),
        "unit": "ms/step",
        "iters_per_sec": round(ips, 3),
        "params_M": round(n_params / 1e6, 1),
        "compile_sec": round(compile_sec, 1),
        "recipe_2p4M_days_v5e8": round(recipe_days, 2),
    }
    if step_flops is not None:
        tflops = step_flops * ips / 1e12
        out["achieved_tflops"] = round(tflops, 2)
        out["mfu"] = round(tflops / 197.0, 4)
    if step_bytes is not None:
        out["hbm_util"] = round(step_bytes * ips / 819e9, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
