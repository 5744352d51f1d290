"""Validation metrics: held-out-view PSNR/MSE and mesh Chamfer distance.

Twin of the reference validation path ``train_gshelltet_deepfashion.py:190-272``
(validate_itr / validate → metrics.txt with per-view rows + AVERAGES) and the
Chamfer evaluation used for DeepFashion3D quality checks.
"""
from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import mse_to_psnr, rgb_to_srgb
from ..ops.mesh_ops import sample_surface


def validate_view(buffers: dict, ref_img: jax.Array):
    """MSE + PSNR on tonemapped sRGB (ref :253-256)."""
    opt = jnp.clip(rgb_to_srgb(buffers["shaded"][..., 0:3]), 0.0, 1.0)
    ref = jnp.clip(rgb_to_srgb(ref_img[..., 0:3]), 0.0, 1.0)
    mse = jnp.mean((opt - ref) ** 2)
    return mse, mse_to_psnr(mse)


def validate(render_fn: Callable, dataset, out_dir: str | None = None, n_views: int | None = None,
             dump_images: bool = False):
    """Render every held-out view, compute MSE/PSNR, optionally write
    metrics.txt (ref :238-271).  ``dump_images`` also writes per-view
    ``val_{i}.png`` triptychs [render | reference | 5×|diff|] (sRGB) —
    the ref dumps opt/ref pairs at :261-264; the diff panel localizes
    where the PSNR is lost (silhouette vs albedo vs shading)."""
    rows = []
    n = n_views or len(dataset)
    for i in range(n):
        batch = dataset.batch(np.asarray([i]), background="black")
        buffers = render_fn(batch)
        single = {k: v[0] for k, v in buffers.items() if hasattr(v, "ndim") and v.ndim >= 3}
        mse, psnr = validate_view(single, batch["img"][0])
        if dump_images and out_dir:
            from ..utils.image import save_image

            os.makedirs(out_dir, exist_ok=True)
            opt = np.clip(np.asarray(rgb_to_srgb(single["shaded"][..., 0:3])), 0, 1)
            ref = np.clip(np.asarray(rgb_to_srgb(batch["img"][0][..., 0:3])), 0, 1)
            diff = np.clip(5.0 * np.abs(opt - ref), 0, 1)
            save_image(
                os.path.join(out_dir, f"val_{i:03d}.png"),
                np.concatenate([opt, ref, diff], axis=1),
            )
        rows.append((float(mse), float(psnr)))
    mses, psnrs = zip(*rows)
    avg = (float(np.mean(mses)), float(np.mean(psnrs)))
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "metrics.txt"), "w") as f:
            f.write("ID, MSE, PSNR\n")
            for i, (m, p) in enumerate(rows):
                f.write(f"{i}, {m:1.8f}, {p:2.3f}\n")
            f.write(f"AVERAGES: {avg[0]:1.4f}, {avg[1]:2.3f}\n")
    return {"mse": avg[0], "psnr": avg[1], "per_view": rows}


def chamfer_distance(
    key: jax.Array,
    v1: jax.Array,
    f1: jax.Array,
    v2: jax.Array,
    f2: jax.Array,
    n_samples: int = 50000,
    mask1=None,
    mask2=None,
    chunk: int = 4096,
):
    """Symmetric Chamfer-L2 between two triangle meshes via area-weighted
    surface samples (the DeepFashion3D evaluation metric; BASELINE.md)."""
    k1, k2 = jax.random.split(key)
    p1 = sample_surface(k1, v1, f1, n_samples, face_mask=mask1)
    p2 = sample_surface(k2, v2, f2, n_samples, face_mask=mask2)

    def one_way(a, b):
        # chunked nearest-neighbor to bound memory: (chunk, M) distances
        def body(carry, idx):
            sl = jax.lax.dynamic_slice_in_dim(a, idx * chunk, chunk, axis=0)
            d = jnp.sum((sl[:, None, :] - b[None, :, :]) ** 2, -1)
            return carry + jnp.min(d, axis=1).sum(), None

        n_chunks = a.shape[0] // chunk
        total, _ = jax.lax.scan(body, 0.0, jnp.arange(n_chunks))
        return total / (n_chunks * chunk)

    return one_way(p1, p2) + one_way(p2, p1)
