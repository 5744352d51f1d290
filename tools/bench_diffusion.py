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

GSHELL_BENCH_COMPILE_ONLY=1 stops after AOT compile + memory_analysis —
the axon compile helper is chipless, so the HBM fit of the 128³ working
point can be iterated on while the chip is busy with another run.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS"):
    # axon plugin overrides the env var; re-apply through jax.config so
    # JAX_PLATFORMS=cpu really runs chipless (see utils/platform.py)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    sys.path.insert(0, ".")
    from gshell_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from gshell_tpu.models.unet3d import UNet3DConfig
    from gshell_tpu.train.diffusion import DiffusionTrainConfig, DiffusionTrainer

    d = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    # 128³: the monolithic fwd+bwd crashes the axon remote-compile helper
    # (HTTP 500; 96³ compiles) — use the segmented-backward step there.
    # Override with GSHELL_SEGMENTED=0/1.
    seg_env = os.environ.get("GSHELL_SEGMENTED")
    segmented = (d >= 128) if seg_env is None else seg_env not in ("0", "")
    up_split = int(os.environ.get("GSHELL_SEG_SPLIT", "5")) if segmented else 0
    up_blocks = int(os.environ.get("GSHELL_SEG_SPLIT_BLOCKS", "1")) if segmented else 0
    cfg = DiffusionTrainConfig(grid_size=d, data_ch=4, use_occ=True,
                               num_grad_acc_steps=1, warmup=10,
                               segmented_grad=segmented,
                               segmented_up_split=up_split,
                               segmented_up_split_blocks=up_blocks,
                               # bf16 mu/EMA: ~1.6 GB less resident state —
                               # needed beside the grad programs' temps at
                               # 128³ (the compile check can't see residency)
                               mu_dtype="bfloat16" if segmented else None,
                               ema_dtype="bfloat16" if segmented else None)
    # single-chip memory policy: ResBlock remat + bf16 compute (params f32)
    unet_cfg = UNet3DConfig(data_ch=4, use_occ=True, remat=True,
                            compute_dtype="bfloat16")
    trainer = DiffusionTrainer(cfg, unet_cfg=unet_cfg)
    compile_only = bool(os.environ.get("GSHELL_BENCH_COMPILE_ONLY"))
    if compile_only:
        # abstract state: no device memory, no device programs — compile-only
        # runs cleanly while another run owns the chip (device transfers
        # would otherwise starve behind its back-to-back steps)
        state = jax.eval_shape(lambda: trainer.init_state(jax.random.PRNGKey(0)))
    else:
        state = trainer.init_state(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(
        f"# UNet3D params: {n_params/1e6:.1f}M  grid {d}^3 occ {2*d}^3 batch {b}",
        file=sys.stderr,
    )

    bshape = {
        "grid": jax.ShapeDtypeStruct((1, b, d, d, d, 4), jnp.float32),
        "occgrid": jax.ShapeDtypeStruct((1, b, 2 * d, 2 * d, 2 * d, 1), jnp.float32),
    }
    if compile_only:
        # fully abstract args (even the PRNG key): a single concrete device
        # put would block behind another process's exclusive chip claim
        key = jax.eval_shape(lambda: jax.random.PRNGKey(1))
        batch = bshape
    else:
        key = jax.random.PRNGKey(1)
        batch = {k: jnp.ones(v.shape, v.dtype) * 0.1 for k, v in bshape.items()}
    # Compile explicitly first: memory_analysis tells us the temp/peak HBM
    # before any execution, and phase markers localize tunnel stalls.
    step_flops = step_bytes = None
    aot_sec = None
    t0 = time.time()
    compiled = None
    if segmented:
        # compile the four segment programs; report memory per program.
        # Execution goes through train_step_segmented (jit cache is warm
        # after these compiles — same programs).
        mb = jax.eval_shape(
            lambda bb: jax.tree_util.tree_map(lambda t: t[0], bb), batch
        )
        akey = jax.eval_shape(lambda: jax.random.PRNGKey(2))
        total_bytes = 0.0
        total_flops = 0.0
        ok = True
        down_out = jax.eval_shape(
            lambda p, k, m: trainer._seg_down_fwd(p, k, m), state.params,
            akey, mb,
        )
        up_out = jax.eval_shape(
            lambda p, *a: trainer._seg_up_grad(p, *a), state.params, *down_out
        )
        down_g = jax.eval_shape(
            lambda p, k, m, *c: trainer._seg_down_bwd(p, k, m, *c),
            state.params, akey, mb, *up_out[2:5],
        )
        progs = [
            ("down_fwd", type(trainer)._seg_down_fwd,
             (state.params, akey, mb)),
            ("up_grad", type(trainer)._seg_up_grad,
             (state.params,) + tuple(down_out)),
            ("down_bwd", type(trainer)._seg_down_bwd,
             (state.params, akey, mb) + tuple(up_out[2:5])),
            ("update", type(trainer)._seg_update,
             (state, up_out[1], down_g, up_out[0])),
        ]
        for name, fn, args in progs:
            t1 = time.time()
            try:
                c = fn.lower(trainer, *args).compile()
                msg = f"# {name}: compiled {time.time()-t1:.1f}s"
                try:
                    ma = c.memory_analysis()
                    if ma is not None:
                        msg += (
                            "  args %.2f out %.2f temp %.2f GB"
                            % (
                                ma.argument_size_in_bytes / 2**30,
                                ma.output_size_in_bytes / 2**30,
                                ma.temp_size_in_bytes / 2**30,
                            )
                        )
                except Exception:
                    pass
                try:
                    ca = c.cost_analysis()
                    if isinstance(ca, (list, tuple)):
                        ca = ca[0]
                    total_flops += float(ca.get("flops", 0.0))
                    total_bytes += float(ca.get("bytes accessed", 0.0))
                except Exception:
                    pass
                print(msg, file=sys.stderr, flush=True)
            except Exception as e:
                ok = False
                print(f"# {name}: FAIL {str(e)[:300]}", file=sys.stderr,
                      flush=True)
        aot_sec = time.time() - t0
        step_flops = total_flops or None
        step_bytes = total_bytes or None
        if compile_only:
            print("# compile-only mode: exiting before execution",
                  file=sys.stderr)
            sys.exit(0 if ok else 1)
        step = lambda s, k, b: trainer.train_step_segmented(s, k, b)
        t0 = time.time()
        state, m = step(state, key, batch)
        loss0 = float(m["loss"])
        compile_sec = time.time() - t0
        print(f"# first step: {compile_sec:.1f}s loss={loss0:.4f}",
              file=sys.stderr)
        t0 = time.time()
        for _ in range(n):
            key, k = jax.random.split(key)
            state, m = step(state, k, batch)
        float(m["loss"])
        dt = (time.time() - t0) / n
        _emit(d, b, dt, n_params, aot_sec, step_flops, step_bytes)
        return
    try:
        lowered = type(trainer).train_step.lower(trainer, state, key, batch)
        print(f"# lowered: {time.time()-t0:.1f}s", file=sys.stderr)
        compiled = lowered.compile()
        aot_sec = time.time() - t0
        print(f"# compiled: {aot_sec:.1f}s", file=sys.stderr)
        try:
            ma = compiled.memory_analysis()
            if ma is not None:
                print(
                    "# memory: args %.2f GB out %.2f GB temp %.2f GB"
                    % (
                        ma.argument_size_in_bytes / 2**30,
                        ma.output_size_in_bytes / 2**30,
                        ma.temp_size_in_bytes / 2**30,
                    ),
                    file=sys.stderr,
                )
        except Exception as e:
            print(f"# memory_analysis unavailable: {e}", file=sys.stderr)
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_flops = float(ca.get("flops", 0.0))
        step_bytes = float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # best-effort (backends vary)
        print(f"# cost_analysis unavailable: {str(e)[:500]}", file=sys.stderr)

    if compile_only:
        print("# compile-only mode: exiting before execution", file=sys.stderr)
        sys.exit(0 if compiled is not None else 1)

    # Execute through the AOT-compiled object (the jit path would compile a
    # second copy of the same program — minutes at the 128³ working point).
    if compiled is None:
        print(
            "# AOT compile failed; falling back to the jit path "
            "(will recompile the same program — minutes at 128^3)",
            file=sys.stderr,
        )
    step = (
        (lambda s, k, b: compiled(s, k, b))
        if compiled is not None
        else trainer.train_step
    )
    t0 = time.time()
    state, m = step(state, key, batch)
    loss0 = float(m["loss"])  # scalar transfer syncs (axon: block_until_ready lies)
    compile_sec = time.time() - t0
    print(f"# first step: {compile_sec:.1f}s loss={loss0:.4f}", file=sys.stderr)

    t0 = time.time()
    for _ in range(n):
        key, k = jax.random.split(key)
        state, m = step(state, k, batch)
    float(m["loss"])
    dt = (time.time() - t0) / n
    _emit(d, b, dt, n_params, aot_sec if aot_sec is not None else compile_sec,
          step_flops, step_bytes)


def _emit(d, b, dt, n_params, compile_sec, step_flops, step_bytes):
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
        "compile_sec": round(compile_sec, 1) if compile_sec else None,
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
