"""Reconstruction training CLI — twin of the reference entry scripts
``train_gshelltet_deepfashion.py`` / ``train_gshelltet_synthetic.py`` /
``train_gflexicubes_deepfashion.py`` (selected by config / --flexicubes).

Usage:
  python train_gshell.py --config configs/deepfashion_mc_256.json \
      --trainset-path /data/deepfashion3d/30 --out-dir out/df30
  python train_gshell.py --config configs/nerf_chair.json \
      --ref-mesh /data/nerf_synthetic/chair --out-dir out/chair
"""
from __future__ import annotations

import argparse
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
    p = argparse.ArgumentParser(description="gshell_tpu reconstruction")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("-i", "--iter", type=int, default=None)
    p.add_argument("-b", "--batch", type=int, default=None)
    p.add_argument("-o", "--out-dir", dest="out_dir", type=str, default="out/run")
    p.add_argument("--trainset-path", dest="trainset_path", type=str, default=None)
    p.add_argument("--testset-path", dest="testset_path", type=str, default=None)
    p.add_argument("--ref-mesh", dest="ref_mesh", type=str, default=None)
    p.add_argument("--n_samples", type=int, default=None)
    p.add_argument("--flexicubes", action="store_true")
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument(
        "--bake-texture", type=int, default=0, metavar="RES",
        help="after training, UV-unwrap the mesh and bake kd/ks atlases at "
        "RES² (the reference's xatlas → render_uv flow)",
    )
    p.add_argument(
        "--snapshot-images", type=int, default=1, metavar="0|1",
        help="render a training-progress image at each save_interval "
        "(default on; disable for unattended runs on flaky links — the "
        "snapshot render compiles fresh shapes and is the one optional "
        "device call in the save path)",
    )
    p.add_argument(
        "--resume", action="store_true",
        help="resume from OUT_DIR/state.pkl if present (state snapshots are "
        "written every save_interval, so a preempted run loses at most one "
        "interval; beyond-reference capability — the reference only saves "
        "final state, train_gshelltet_deepfashion.py:689-700)",
    )
    args = p.parse_args()

    from gshell_tpu.utils.config import load_flags, learning_rates
    from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
    from gshell_tpu.geometry.mlp import MLPConfig
    from gshell_tpu.render.material import MLPTexture3DConfig, default_kd_ks_min_max
    from gshell_tpu.render.render import RenderFlags
    from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig
    from gshell_tpu.data.datasets import DatasetDeepFashion, DatasetNeRF

    flags = load_flags(
        args.config,
        iter=args.iter,
        batch=args.batch,
        out_dir=args.out_dir,
        trainset_path=args.trainset_path,
        ref_mesh=args.ref_mesh,
        n_samples=args.n_samples,
    )
    os.makedirs(flags.out_dir, exist_ok=True)

    gcfg = GeometryConfig(
        grid_res=flags.gshell_grid,
        scale=flags.mesh_scale,
        boxscale=tuple(flags.boxscale),
        use_sdf_mlp=flags.use_sdf_mlp,
        use_msdf_mlp=flags.use_msdf_mlp,
        mlp=MLPConfig(
            n_freq=flags.n_freq,
            d_hidden=flags.d_hidden,
            n_hidden=flags.n_hidden,
            skip_in=tuple(flags.skip_in),
        ),
        msdf_reg_open_scale=flags.msdf_reg_open_scale,
        msdf_reg_close_scale=flags.msdf_reg_close_scale,
        sdf_regularizer=flags.sdf_regularizer,
        eikonal_scale=flags.eikonal_scale,
        lambda_kd=flags.lambda_kd,
        lambda_ks=flags.lambda_ks,
        lambda_nrm=flags.lambda_nrm,
        lambda_chroma=flags.lambda_chroma,
        lambda_diffuse=flags.lambda_diffuse,
        lambda_specular=flags.lambda_specular,
        use_eikonal=flags.use_eikonal,
        use_depth=flags.use_depth,
        use_img_2nd_layer=flags.use_img_2nd_layer,
        use_depth_2nd_layer=flags.use_depth_2nd_layer,
        total_iters=flags.iter,
        view_batch_mode=flags.view_batch_mode,
    )
    if flags.use_flexicubes or args.flexicubes:
        from gshell_tpu.geometry.flexi_geometry import (
            FlexiGeometryConfig,
            GShellFlexiGeometry,
        )

        fcfg = FlexiGeometryConfig(
            **{**gcfg.__dict__, "grid_res": flags.voxel_grid}
        )
        geo = GShellFlexiGeometry(fcfg)
    else:
        geo = GShellGeometry(gcfg)

    aabb = np.asarray(flags.aabb, np.float32).reshape(2, 3)
    mat_cfg = MLPTexture3DConfig(
        channels=6,
        aabb_min=tuple(aabb[0].tolist()),
        aabb_max=tuple(aabb[1].tolist()),
        min_max=default_kd_ks_min_max(
            flags.kd_min[:3], flags.kd_max[:3], flags.ks_min, flags.ks_max
        ),
    )
    rflags = RenderFlags(
        resolution=tuple(flags.train_res),
        n_samples=flags.n_samples,
        spp=flags.spp,
        bsdf=flags.bsdf,
        use_denoiser=flags.denoiser == "bilateral",
        denoiser_demodulate=flags.denoiser_demodulate,
        shade_budget=flags.shade_budget,
        max_pairs=flags.max_pairs,
        max_per_tile=flags.max_per_tile,
    )
    lr_pos, lr_mat, lr_lgt = learning_rates(flags)
    tcfg = TrainConfig(
        lr_pos=lr_pos, lr_mat=lr_mat, lr_lgt=lr_lgt, loss=flags.loss,
        iters=flags.iter, batch=flags.batch,
    )
    rec = Reconstructor(geo, mat_cfg, rflags, tcfg)

    # dataset
    if flags.trainset_path:
        ds = DatasetDeepFashion(flags.trainset_path, train_res=tuple(flags.train_res))
    elif flags.ref_mesh and os.path.isdir(flags.ref_mesh):
        ds = DatasetNeRF(
            os.path.join(flags.ref_mesh, "transforms_train.json"),
            train_res=tuple(flags.train_res),
        )
    elif flags.ref_mesh and flags.ref_mesh.endswith(".obj"):
        # synthetic supervision from a reference OBJ (twin of
        # train_gshelltet_synthetic.py / dataset_mesh.py)
        from gshell_tpu.data.datasets import DatasetMesh
        from gshell_tpu.render.light import create_trainable_env_rnd
        from gshell_tpu.render.material import init_mlp_texture
        from gshell_tpu.render.mesh import load_obj, unit_size

        gt_mesh = unit_size(load_obj(flags.ref_mesh))
        gt_light = create_trainable_env_rnd(jax.random.PRNGKey(42), 256)
        gt_mat = init_mlp_texture(jax.random.PRNGKey(43), mat_cfg)
        ds = DatasetMesh(
            gt_mesh, gt_light, gt_mat, mat_cfg, rflags, n_views=64,
            layers=flags.layers, shadows=flags.gt_shadows,
        )
    else:
        raise SystemExit(
            "need --trainset-path (DeepFashion), --ref-mesh dir (NeRF), or "
            "--ref-mesh file.obj (synthetic)"
        )

    key = jax.random.PRNGKey(0)
    start_it = 0
    state_path = os.path.join(flags.out_dir, "state.pkl")
    if args.resume and os.path.exists(state_path):
        import pickle

        with open(state_path, "rb") as f:
            state = pickle.load(f)
        state = jax.tree_util.tree_map(jnp.asarray, state)
        start_it = int(state.step)
        key = jax.random.fold_in(key, start_it)
        print(f"resumed from {state_path} at iter {start_it}", flush=True)
    else:
        state = rec.init_state(key, pretrain_steps=flags.sdf_mlp_pretrain_steps)

    t_hist = []
    t0 = time.time()
    n_remaining = max(flags.iter - start_it, 0)
    for it_off, target in enumerate(
        # seed=start_it: a resumed run continues the data stream instead of
        # replaying the draws already consumed by iterations 0..start_it
        ds.iterate(flags.batch, n_remaining, background="random", seed=start_it)
    ):
        it = start_it + it_off
        key, k = jax.random.split(key)
        state, m = rec.train_step(state, k, target)
        if it % args.log_interval == 0:
            float(m["total"])  # scalar transfer: block_until_ready returns early on axon
            # time since the last sync ÷ iters in between — non-logged iters
            # queue asynchronously, so per-iter wall time must be amortized
            t_hist.append((time.time() - t0) / max(args.log_interval, 1))
            t0 = time.time()
            rem = (flags.iter - it) * np.mean(t_hist[-10:])
            n_active = m.get("n_valid_tets", m.get("n_surf_cubes", 0))
            print(
                f"iter={it:5d}, img_loss={float(m['img_loss']):.6f}, "
                f"reg_loss={float(m['reg_loss']):.6f}, "
                f"nactive={int(n_active)}, time={t_hist[-1]*1000:.1f} ms, "
                f"rem={rem/60:.1f} min",
                flush=True,
            )
        if flags.save_interval and it > 0 and it % flags.save_interval == 0:
            # state first — the mesh/image dumps are diagnostics, and on the
            # axon tunnel their fresh-shape renders can die to infra flakes
            # (remote_compile drops); a multi-hour run must survive that.
            _save_state(state, flags.out_dir)  # preemption snapshot
            try:
                _save_mesh(geo, state, flags.out_dir, it)
                if args.snapshot_images:
                    _save_snapshot_image(
                        geo, state, mat_cfg, rflags, target, flags.out_dir, it
                    )
            except Exception as e:  # noqa: BLE001 — diagnostics only
                print(f"snapshot dump failed at iter {it}: {e!r}", flush=True)

    _save_mesh(geo, state, flags.out_dir, flags.iter)
    _save_state(state, flags.out_dir)
    # final light probe (ref train_gshelltet_deepfashion.py:694 probe.hdr)
    from gshell_tpu.utils.image import save_image as _save_img

    _save_img(
        os.path.join(flags.out_dir, "probe.hdr"), np.asarray(state.light_base)
    )
    if args.bake_texture:
        _bake_texture(geo, state, mat_cfg, flags.out_dir, args.bake_texture)
    print("done.")


def _bake_texture(geo, state, mat_cfg, out_dir, res):
    """UV-unwrap the final mesh and bake the neural material to kd/ks
    atlases (twin of the reference xatlas → ``render_uv`` bake,
    ``train_gshelltet_deepfashion.py:105-140``)."""
    from gshell_tpu.ops.uv_unwrap import unwrap
    from gshell_tpu.render.mesh import save_obj
    from gshell_tpu.render.render import render_uv
    from gshell_tpu.utils.image import save_image

    mesh = jax.jit(geo.get_mesh)(state.params_geo)
    f = np.asarray(mesh.faces)[np.asarray(mesh.face_valid)]
    keep = ~((f[:, 0] == f[:, 1]) | (f[:, 1] == f[:, 2]) | (f[:, 0] == f[:, 2]))
    f = f[keep]
    used, inv = np.unique(f.reshape(-1), return_inverse=True)
    v2 = np.asarray(mesh.verts)[used]
    f2 = inv.reshape(-1, 3).astype(np.int32)
    uvs, uv_idx = unwrap(v2, f2)
    maskb, kd, ks = render_uv(
        jnp.asarray(uvs), jnp.asarray(uv_idx), jnp.asarray(v2),
        jnp.asarray(f2), (res, res), state.params_mat, mat_cfg,
    )
    save_image(os.path.join(out_dir, "texture_kd.png"), np.asarray(kd))
    save_image(os.path.join(out_dir, "texture_ks.png"), np.asarray(ks))
    save_obj(
        os.path.join(out_dir, "mesh_textured.obj"), v2, f2,
        uvs=uvs, uv_idx=uv_idx, mtl_name="baked",
    )
    with open(os.path.join(out_dir, "baked.mtl"), "w") as m:
        m.write(
            "newmtl baked\nbsdf pbr\nmap_Kd texture_kd.png\nmap_Ks texture_ks.png\n"
        )
    print(f"baked {res}x{res} kd/ks atlases -> {out_dir}")


def _save_snapshot_image(geo, state, mat_cfg, rflags, target, out_dir, it):
    """Training-progress image dump (ref train_gshelltet_deepfashion.py
    :377-393 img_*.png snapshots): render the current model on the batch's
    first camera, save [render | reference] side by side as sRGB PNG."""
    import jax.numpy as jnp

    from gshell_tpu.ops.math import rgb_to_srgb
    from gshell_tpu.render.light import update_pdf
    from gshell_tpu.render.render import render_mesh
    from gshell_tpu.utils.image import save_image

    mesh = jax.jit(geo.get_mesh)(state.params_geo)
    buf = render_mesh(
        jax.random.PRNGKey(it), mesh.verts, mesh.faces, mesh.v_nrm, mesh.msdf,
        state.params_mat, mat_cfg, target["mvp"][0], target["campos"][0],
        update_pdf(state.light_base), rflags,
        background=target["background"][0], shadow_scale=0.0,
    )
    opt = np.asarray(jnp.clip(rgb_to_srgb(buf["shaded"][..., 0:3]), 0.0, 1.0))
    ref = np.asarray(
        jnp.clip(rgb_to_srgb(target["img"][0, ..., 0:3]), 0.0, 1.0)
    )
    save_image(
        os.path.join(out_dir, f"img_{it:06d}.png"),
        np.concatenate([opt, ref], axis=1),
    )


def _save_mesh(geo, state, out_dir, it):
    from gshell_tpu.render.mesh import save_obj

    mesh = jax.jit(geo.get_mesh)(state.params_geo)
    save_obj(
        os.path.join(out_dir, f"mesh_{it:06d}.obj"),
        np.asarray(mesh.verts),
        np.asarray(mesh.faces),
        np.asarray(mesh.face_valid),
    )


def _save_state(state, out_dir):
    import pickle

    path = os.path.join(out_dir, "state.pkl")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, state), f)
    os.replace(tmp, path)  # atomic: a kill mid-write can't corrupt the snapshot


if __name__ == "__main__":
    main()
