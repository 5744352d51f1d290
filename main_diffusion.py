"""G-MeshDiffusion CLI — twin of ``GMeshDiffusion/main_diffusion.py`` (+ the
DDP variant; on TPU the single program covers both: the train step is
data-parallel over the device mesh automatically).

Modes (ref main_diffusion.py:13-27):
  train            — DDPM training with grad accumulation + EMA + checkpoints
  uncond_gen       — unconditional sampling (PC or DDIM) → saved grids
  uncond_gen_interp— slerp interpolation between prior noises
  cond_gen         — partial-shape inpainting from --cond-file (grid +
                     cond_mask; ref evaler.py:183-263)
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import time

import jax

from gshell_tpu.utils.platform import apply_platform_env

apply_platform_env()  # make JAX_PLATFORMS=cpu actually mean cpu here
import jax.numpy as jnp
import numpy as np


def main():
    from gshell_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument(
        "--mode",
        choices=["train", "uncond_gen", "uncond_gen_interp", "cond_gen"],
        required=True,
    )
    p.add_argument("--cond-file", type=str, default=None,
                   help="cond_gen: .npz with 'grid' (known values) + 'cond_mask'")
    p.add_argument("--workdir", type=str, default="out/diffusion")
    p.add_argument("--data-glob", type=str, default=None, help="glob of .npz baked grids")
    p.add_argument("--grid-size", type=int, default=128)
    p.add_argument("--data-ch", type=int, default=4)
    p.add_argument("--n-iters", type=int, default=2400001)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--grad-acc", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--snapshot-freq", type=int, default=1000)
    p.add_argument("--log-freq", type=int, default=50)
    p.add_argument("--sampling-method", choices=["pc", "ddim"], default="ddim")
    p.add_argument("--n-sampling-steps", type=int, default=100)
    p.add_argument("--n-samples", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mask-file", type=str, default=None,
                   help=".npz with feature_mask/occ_mask (as baked by bake_grids.py)")
    # model-size overrides (defaults = reference config_*_occgrid)
    p.add_argument("--base-channels", type=int, default=None)
    p.add_argument("--ch-mult", type=str, default=None,
                   help="comma-separated, e.g. 1,2,2,4,4,4")
    # multi-host (pod / multi-slice): initialize jax.distributed so the mesh
    # spans all processes; each process then loads only its own batch rows
    # (DistributedGridSampler — the DistributedSampler analogue,
    # ref trainer_ddp.py:30-37,79-83)
    p.add_argument("--segmented", action="store_true",
                   help="segmented backward (4 half-sized programs) — the "
                   "128^3 working point on one 16 GB chip; requires "
                   "--grad-acc 1 (see train/diffusion.py segmented_grad)")
    p.add_argument("--seg-up-split", type=int, default=5)
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port for manual jax.distributed setups")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args()

    if args.multihost:
        from gshell_tpu.parallel.sharding import init_multihost

        init_multihost(args.coordinator, args.num_processes, args.process_id)

    from gshell_tpu.train.diffusion import DiffusionTrainConfig, DiffusionTrainer
    from gshell_tpu.parallel.sharding import make_mesh

    os.makedirs(args.workdir, exist_ok=True)
    feature_mask = occ_mask = None
    if args.mask_file:
        z = np.load(args.mask_file)
        # masks mark valid sites (ref losses.py:110-120); add batch dim
        feature_mask = jnp.asarray(z["feature_mask"])[None]
        occ_mask = jnp.asarray(z["occ_mask"])[None, ..., None]
    cfg = DiffusionTrainConfig(
        grid_size=args.grid_size,
        data_ch=args.data_ch,
        batch_per_step=args.batch,
        num_grad_acc_steps=args.grad_acc,
        lr=args.lr,
        snapshot_freq=args.snapshot_freq,
        segmented_grad=args.segmented,
        segmented_up_split=args.seg_up_split if args.segmented else 0,
        mu_dtype="bfloat16" if args.segmented else None,
        ema_dtype="bfloat16" if args.segmented else None,
    )
    unet_cfg = None
    if args.base_channels or args.ch_mult:
        from gshell_tpu.models.unet3d import UNet3DConfig

        mult = tuple(int(v) for v in (args.ch_mult or "1,2,2,4,4,4").split(","))
        n = len(mult)
        unet_cfg = UNet3DConfig(
            data_ch=args.data_ch,
            use_occ=True,
            base_channels=args.base_channels or 128,
            ch_mult=mult,
            down_block_types=("ResBlock",) * (n - 1) + ("AttnResBlock",),
            up_block_types=("AttnResBlock",) + ("ResBlock",) * (n - 1),
        )
    trainer = DiffusionTrainer(
        cfg, unet_cfg=unet_cfg, feature_mask=feature_mask, occ_mask=occ_mask
    )
    key = jax.random.PRNGKey(args.seed)
    state = trainer.init_state(key)
    ckpt_meta = os.path.join(args.workdir, "checkpoints-meta")
    state = trainer.restore_checkpoint(ckpt_meta, state)

    if args.mode == "train":
        assert args.data_glob, "--data-glob required for training"
        files = sorted(glob.glob(args.data_glob))
        assert files, f"no grids match {args.data_glob}"
        from gshell_tpu.data.multihost import DistributedGridSampler

        d = args.grid_size
        start = int(state.step)
        # per-process shard loading: on a multi-host mesh each process loads
        # only the batch rows its devices own (no cross-host input traffic)
        sampler_in = DistributedGridSampler(
            files, trainer.mesh, d, args.grad_acc, args.batch,
            seed=args.seed, start_step=start,
        )
        for it in range(start, args.n_iters):
            batch = sampler_in()
            key, k = jax.random.split(key)
            if cfg.segmented_grad:
                state, m = trainer.train_step_segmented(state, k, batch)
            else:
                state, m = trainer.train_step(state, k, batch)
            if it % args.log_freq == 0:
                print(f"step {it}: loss={float(m['loss']):.6f}", flush=True)
            if it % args.snapshot_freq == 0 and it > 0:
                trainer.save_checkpoint(ckpt_meta, state)
    else:
        from gshell_tpu.models.sampling import get_ddim_sampler, get_pc_sampler, slerp

        d = args.grid_size
        params = state.ema.params  # sample with EMA weights (ref evaler.py)

        def eps_fn(x, x_occ, labels):
            return trainer.apply_fn(params, x, x_occ, labels, train=False)

        shape = (1, d, d, d, args.data_ch)
        occ_shape = (1, 2 * d, 2 * d, 2 * d, 1)
        if args.mode == "cond_gen":
            from gshell_tpu.models.evaler import cond_gen as _cond_gen

            assert args.cond_file, "--cond-file required for cond_gen"
            z = np.load(args.cond_file)
            condition = jnp.asarray(z["grid"]).reshape(shape)
            cond_mask = jnp.asarray(z["cond_mask"], jnp.float32).reshape(
                (1, d, d, d, -1)
            )
            # optional known-occupancy inpainting from the same cond file
            occ_condition = occ_cond_mask = None
            if "occgrid" in z and "occ_cond_mask" in z:
                occ_condition = jnp.asarray(z["occgrid"]).reshape(occ_shape)
                occ_cond_mask = jnp.asarray(z["occ_cond_mask"], jnp.float32).reshape(
                    (1, 2 * d, 2 * d, 2 * d, -1)
                )
            for i in range(args.n_samples):
                key, k = jax.random.split(key)
                x, x_occ = _cond_gen(
                    trainer.sde, eps_fn, condition, cond_mask, k, shape,
                    feature_mask=feature_mask,
                    occ_shape=occ_shape, occ_mask=occ_mask,
                    occ_condition=occ_condition, occ_cond_mask=occ_cond_mask,
                )
                np.savez_compressed(
                    os.path.join(args.workdir, f"cond_sample_{i:04d}.npz"),
                    grid=np.asarray(x[0]),
                    occgrid=np.asarray(x_occ[0, ..., 0]),
                )
                print(f"cond sample {i} saved", flush=True)
            return
        if args.sampling_method == "ddim":
            sampler = get_ddim_sampler(
                trainer.sde, eps_fn, shape, occ_shape, n_steps=args.n_sampling_steps
            )
        else:
            sampler = get_pc_sampler(trainer.sde, eps_fn, shape, occ_shape)
        sampler = jax.jit(sampler)
        for i in range(args.n_samples):
            key, k = jax.random.split(key)
            x, occ = sampler(k)
            np.savez_compressed(
                os.path.join(args.workdir, f"sample_{i:04d}.npz"),
                grid=np.asarray(x[0]),
                occgrid=np.asarray(occ[0, ..., 0]),
            )
            print(f"sample {i} saved", flush=True)


if __name__ == "__main__":
    main()
