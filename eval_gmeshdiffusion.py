"""Decode G-MeshDiffusion samples into open meshes and write OBJs.

Twin of ``eval_gmeshdiffusion_generated_samples.py:137-203``: load sampled
(grid, occgrid) pairs, threshold/clean them, run the grid-driven G-Shell
marching (``generative_decode.GenerativeCodec.decode``), rescale, and save
OBJ files.  The reference's pymeshlab remesh+smooth post-pass is replaced by
an optional in-repo Laplacian smoothing (pure numpy).

Usage:
  python eval_gmeshdiffusion.py --samples 'out/diff/sample_*.npz' \
      --grid-res 64 --out-dir out/meshes
"""
from __future__ import annotations

import argparse
import glob
import os

import jax

from gshell_tpu.utils.platform import apply_platform_env

apply_platform_env()  # make JAX_PLATFORMS=cpu actually mean cpu here
import jax.numpy as jnp
import numpy as np


def laplacian_smooth(verts: np.ndarray, faces: np.ndarray, iterations: int = 3, lam: float = 0.5):
    """Umbrella Laplacian smoothing (replaces the pymeshlab post-pass,
    ref :192-201)."""
    n = verts.shape[0]
    nbr_sum = np.zeros_like(verts)
    nbr_cnt = np.zeros((n, 1))
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    for _ in range(iterations):
        nbr_sum[:] = 0
        nbr_cnt[:] = 0
        np.add.at(nbr_sum, edges[:, 0], verts[edges[:, 1]])
        np.add.at(nbr_sum, edges[:, 1], verts[edges[:, 0]])
        np.add.at(nbr_cnt, edges[:, 0], 1)
        np.add.at(nbr_cnt, edges[:, 1], 1)
        avg = nbr_sum / np.maximum(nbr_cnt, 1)
        verts = verts + lam * (avg - verts) * (nbr_cnt > 0)
    return verts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=str, required=True)
    p.add_argument("--grid-res", type=int, default=64)
    p.add_argument("--out-dir", type=str, default="out/meshes")
    p.add_argument("--scale", type=float, default=1.4)
    p.add_argument("--smooth-iters", type=int, default=3)
    args = p.parse_args()

    from gshell_tpu.geometry.generative_decode import BakedGrids, GenerativeCodec
    from gshell_tpu.geometry.gshell_tets import GShellTets
    from gshell_tpu.geometry.tet_grid import build_tet_grid
    from gshell_tpu.render.mesh import save_obj

    grid = build_tet_grid(args.grid_res)
    ex = GShellTets(grid)
    codec = GenerativeCodec(ex)
    base_verts = jnp.asarray(grid.verts * args.scale)
    max_disp = 1.0 / args.grid_res * args.scale / 2.1

    os.makedirs(args.out_dir, exist_ok=True)
    decode = jax.jit(codec.decode)

    for path in sorted(glob.glob(args.samples)):
        z = np.load(path)
        feat = np.asarray(z["grid"], np.float32)
        occ = np.asarray(z["occgrid"], np.float32)
        d1 = codec.d1
        d2 = codec.d2
        # samples are masked 128³/256³ volumes; pad/crop to site space
        fg = np.zeros((d1, d1, d1, feat.shape[-1] if feat.ndim == 4 else 4), np.float32)
        s = min(d1, feat.shape[0])
        fg[:s, :s, :s] = feat[:s, :s, :s]
        og = np.zeros((d2, d2, d2), np.float32)
        so = min(d2, occ.shape[0])
        og[:so, :so, :so] = occ[:so, :so, :so]
        # quantize signs like the reference eval (ref :163-179)
        vc = np.asarray(codec.vert_coords)
        fg[vc[:, 0], vc[:, 1], vc[:, 2], 0] = np.sign(fg[vc[:, 0], vc[:, 1], vc[:, 2], 0])

        deform = fg[vc[:, 0], vc[:, 1], vc[:, 2], 1:4]
        pos = np.asarray(base_verts) + max_disp * np.clip(deform, -1, 1)
        # BakedGrids carries the reference-shaped (2R)³/(4R)³ crop; decode
        # zero-pads the outermost plane back itself
        fg_c = fg[: d1 - 1, : d1 - 1, : d1 - 1]
        og_c = og[: d2 - 1, : d2 - 1, : d2 - 1]
        baked = BakedGrids(
            grid=jnp.asarray(fg_c),
            occgrid=jnp.asarray(og_c),
            feature_mask=jnp.ones_like(jnp.asarray(fg_c)),
            occ_mask=jnp.ones_like(jnp.asarray(og_c)),
        )
        mesh = decode(jnp.asarray(pos), baked)
        v = np.asarray(mesh.verts)
        f = np.asarray(mesh.faces)[np.asarray(mesh.face_valid)]
        if args.smooth_iters > 0 and f.shape[0] > 0:
            v = laplacian_smooth(v, f, iterations=args.smooth_iters)
        name = os.path.splitext(os.path.basename(path))[0]
        save_obj(os.path.join(args.out_dir, f"{name}.obj"), v, f)
        print(f"{name}: {f.shape[0]} faces", flush=True)


if __name__ == "__main__":
    main()
