"""Evaluate a fitted reconstruction: held-out PSNR table + Chamfer distance.

Twin of the reference validation flow (``train_gshelltet_deepfashion.py:227-272``
validate → metrics.txt) plus the DeepFashion3D Chamfer check (BASELINE.md).

Usage:
  python eval_reconstruction.py --state out/df30/state.pkl \
      --config configs/deepfashion_mc_256.json \
      --testset-path /data/df3d_test/30 --gt-mesh /data/df3d/30/gt.obj \
      --out-dir out/df30/validate
"""
from __future__ import annotations

import argparse
import os
import pickle

import jax

from gshell_tpu.utils.platform import apply_platform_env

apply_platform_env()  # make JAX_PLATFORMS=cpu actually mean cpu here
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--state", type=str, required=True)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--testset-path", type=str, default=None)
    p.add_argument("--gt-mesh", type=str, default=None)
    p.add_argument("--synthetic-ref-mesh", type=str, default=None,
                   help="held-out PSNR for synthetic runs: rebuilds the GT "
                   "DatasetMesh (same seeded GT light/material as "
                   "train_gshell.py) with a DIFFERENT view seed")
    p.add_argument("--out-dir", type=str, default="out/validate")
    p.add_argument("--n-views", type=int, default=None)
    p.add_argument("--dump-images", action="store_true",
                   help="write per-view [render|ref|5x diff] triptychs")
    p.add_argument("--spp", type=int, default=None,
                   help="override n_samples for BOTH the GT render and the "
                   "eval render (the spp-8 GT has an MC-noise floor of its "
                   "own — see tools/dev/_r5_psnr_floor.py)")
    p.add_argument("--gt-unit-size", action="store_true",
                   help="unit_size-normalize --gt-mesh before the Chamfer "
                   "(REQUIRED for synthetic runs: DatasetMesh trains against "
                   "the unit_size'd GT, so the reconstruction lives in that "
                   "frame; omit for datasets whose GT is already in scene "
                   "units, e.g. DeepFashion3D)")
    args = p.parse_args()

    from gshell_tpu.data.datasets import DatasetDeepFashionTestset, DatasetDeepFashion
    from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
    from gshell_tpu.geometry.mlp import MLPConfig
    from gshell_tpu.render.light import update_pdf
    from gshell_tpu.render.material import MLPTexture3DConfig, default_kd_ks_min_max
    from gshell_tpu.render.render import RenderFlags, render_mesh
    from gshell_tpu.train.validate import chamfer_distance, validate
    from gshell_tpu.utils.config import load_flags

    flags = load_flags(args.config)
    with open(args.state, "rb") as f:
        state = pickle.load(f)
    params_geo = state.params_geo if hasattr(state, "params_geo") else state["params_geo"]
    params_mat = state.params_mat if hasattr(state, "params_mat") else state["params_mat"]
    light_base = state.light_base if hasattr(state, "light_base") else state["light_base"]
    # state.pkl stores numpy leaves; convert so closure constants can be
    # indexed by tracers (numpy_array[BatchTracer] raises)
    params_geo, params_mat, light_base = jax.tree_util.tree_map(
        jnp.asarray, (params_geo, params_mat, light_base)
    )

    gcfg = GeometryConfig(
        grid_res=flags.gshell_grid,
        scale=flags.mesh_scale,
        boxscale=tuple(flags.boxscale),
        use_sdf_mlp=flags.use_sdf_mlp,
        mlp=MLPConfig(
            n_freq=flags.n_freq, d_hidden=flags.d_hidden,
            n_hidden=flags.n_hidden, skip_in=tuple(flags.skip_in),
        ),
        total_iters=flags.iter,
    )
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
        n_samples=args.spp or flags.n_samples,
        bsdf=flags.bsdf, use_denoiser=flags.denoiser == "bilateral",
    )
    light = update_pdf(jnp.asarray(light_base))
    mesh = jax.jit(geo.get_mesh)(params_geo)

    # When the run trained with shadowed GT (flags.gt_shadows), the model's
    # materials were fit under its own shadowing — evaluating shadow-free
    # would systematically over-brighten.  Mirror the training render: the
    # surface-splat occupancy of the FITTED cut mesh (the same occluder
    # tick builds each training step; train/reconstruct shadow_source
    # 'mesh_splat').
    vis_cfg, vis_consts, eval_shadow_scale = None, {}, 0.0
    if getattr(flags, "gt_shadows", False):
        from gshell_tpu.ops.mesh_ops import compact_faces
        from gshell_tpu.ops.shade import make_shadow_field_parts
        from gshell_tpu.train.reconstruct import TrainConfig as _TC

        faces_c, fvalid_c, _ = compact_faces(
            mesh.faces, mesh.face_valid, cap=geo.extractor.max_tets
        )
        occ, amin, asz = geo.splat_occupancy(
            jax.random.PRNGKey(191), mesh.verts, faces_c, fvalid_c
        )
        # shadow_ko follows TrainConfig defaults, which is what
        # train_gshell.py trains with (it exposes no override today)
        vis_cfg, vis_consts = make_shadow_field_parts(
            occ, amin, asz, ko=_TC().shadow_ko,
        )
        eval_shadow_scale = 1.0

    results = {}

    def _render_batch_fn():
        # mesh/material/light ride as jit arguments: closed-over arrays
        # become HLO constants and XLA constant-folds entire raster
        # pipelines over them at compile time (7–16 s per folded op).
        @jax.jit
        def _render_batch(batch, msh, mp, lt, vc):
            vfn = None if vis_cfg is None else (vis_cfg, vc)

            def one(k, mvp, campos, bg):
                return render_mesh(
                    k, msh.verts, msh.faces, msh.v_nrm, msh.msdf,
                    mp, mat_cfg, mvp, campos, lt, rflags,
                    background=bg, shadow_scale=eval_shadow_scale,
                    visibility_fn=vfn,
                )

            keys = jax.random.split(jax.random.PRNGKey(0), batch["mvp"].shape[0])
            return jax.vmap(one)(
                keys, batch["mvp"], batch["campos"], batch["background"]
            )

        return lambda batch: _render_batch(
            batch, mesh, params_mat, light, vis_consts
        )

    if args.synthetic_ref_mesh:
        # Held-out synthetic views: GT light/material seeds match
        # train_gshell.py's synthetic path (42/43); view seed differs.
        from gshell_tpu.data.datasets import DatasetMesh
        from gshell_tpu.render.light import create_trainable_env_rnd
        from gshell_tpu.render.material import init_mlp_texture
        from gshell_tpu.render.mesh import load_obj, unit_size

        gt_mesh = unit_size(load_obj(args.synthetic_ref_mesh))
        gt_light = create_trainable_env_rnd(jax.random.PRNGKey(42), 256)
        gt_mat = init_mlp_texture(jax.random.PRNGKey(43), mat_cfg)
        ds = DatasetMesh(
            gt_mesh, gt_light, gt_mat, mat_cfg, rflags,
            n_views=args.n_views or 16, seed=777,
            shadows=getattr(flags, "gt_shadows", False),
        )
        metrics = validate(
            _render_batch_fn(), ds, out_dir=args.out_dir,
            n_views=args.n_views or 16, dump_images=args.dump_images,
        )
        print(f"held-out synthetic PSNR: {metrics['psnr']:.3f}  "
              f"MSE: {metrics['mse']:.6f}")
        results.update(metrics)

    if args.testset_path:
        try:
            ds = DatasetDeepFashionTestset(
                args.testset_path,
                os.path.join(args.testset_path, "masks"),
                train_res=tuple(flags.train_res),
            )
        except Exception:
            ds = DatasetDeepFashion(args.testset_path, train_res=tuple(flags.train_res))

        metrics = validate(
            _render_batch_fn(), ds, out_dir=args.out_dir,
            n_views=args.n_views, dump_images=args.dump_images,
        )
        print(f"PSNR: {metrics['psnr']:.3f}  MSE: {metrics['mse']:.6f}")
        results.update(metrics)

    if args.gt_mesh:
        from gshell_tpu.render.mesh import load_obj, unit_size

        gt = load_obj(args.gt_mesh)
        if args.gt_unit_size or args.synthetic_ref_mesh:
            gt = unit_size(gt)
        cd = chamfer_distance(
            jax.random.PRNGKey(1),
            mesh.verts, mesh.faces, gt.v_pos, gt.t_pos_idx,
            mask1=mesh.face_valid, n_samples=50000 // 4096 * 4096,
        )
        print(f"Chamfer-L2: {float(cd):.6f}")
        results["chamfer"] = float(cd)

    return results


if __name__ == "__main__":
    main()
