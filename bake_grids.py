"""Bake fitted G-Shell reconstructions into diffusion training grids.

Twin of ``GMeshDiffusion/metadata/tet_to_cubic_grid_dataset.py`` (the offline
prep tool): for each fitted shape (state.pkl from train_gshell.py), emit one
.npz with the (D,D,D,4) feature grid, (2D)³ occ grid, and masks.

Usage:
  python bake_grids.py --states 'out/df*/state.pkl' --grid-res 64 --out-dir baked/
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle

import jax

from gshell_tpu.utils.platform import apply_platform_env

apply_platform_env()  # make JAX_PLATFORMS=cpu actually mean cpu here
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--states", type=str, required=True)
    p.add_argument("--grid-res", type=int, default=64)
    p.add_argument("--out-dir", type=str, default="baked")
    p.add_argument("--scale", type=float, default=1.4)
    args = p.parse_args()

    from gshell_tpu.geometry.generative_decode import GenerativeCodec
    from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry

    os.makedirs(args.out_dir, exist_ok=True)
    geo = codec = bake = None
    for path in sorted(glob.glob(args.states)):
        with open(path, "rb") as f:
            state = pickle.load(f)
        params = state.params_geo if hasattr(state, "params_geo") else state["params_geo"]
        if geo is None:
            # infer the field parameterization from the fitted state
            gcfg = GeometryConfig(
                grid_res=args.grid_res,
                scale=args.scale,
                use_sdf_mlp="sdf_net" in params,
                use_msdf_mlp="msdf_net" in params,
            )
            geo = GShellGeometry(gcfg)
            codec = GenerativeCodec(geo.extractor)
            bake = jax.jit(
                lambda pos, sdf, msdf, deform: codec.bake(pos, sdf, msdf, deform)
            )
        params = jax.tree_util.tree_map(jnp.asarray, params)
        v_def, sdf, msdf = geo.fields(params)
        baked = bake(v_def, sdf, msdf, jnp.asarray(params["deform"]))
        name = os.path.basename(os.path.dirname(path)) or "shape"
        np.savez_compressed(
            os.path.join(args.out_dir, f"{name}.npz"),
            grid=np.asarray(baked.grid),
            occgrid=np.asarray(baked.occgrid),
            feature_mask=np.asarray(baked.feature_mask),
            occ_mask=np.asarray(baked.occ_mask),
        )
        print(f"baked {name}", flush=True)


if __name__ == "__main__":
    main()
