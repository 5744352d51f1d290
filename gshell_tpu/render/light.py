"""Monte-Carlo environment light with importance-sampling PDF/CDF tables.

TPU-native twin of ``render/light.py:21-105`` (EnvironmentLight): a trainable
lat-long radiance texture plus sin-weighted PDF and row/column CDFs for light
importance sampling.

CDF inversion at sample time is a **branchless vectorized binary search**
(log₂N rounds of batched gathers across all samples at once) — the lane-
parallel counterpart of the per-thread loop in the reference's OptiX kernel
(``envsampling/kernel.cu:140-169``).  Unlike ``jnp.searchsorted`` under
``vmap`` (one search per row), every round is a single take_along_axis over
the whole sample batch.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.math import dir_to_latlong_uv, latlong_uv_to_dir

LIGHT_MIN_RES = 16
MIN_ROUGHNESS = 0.08
MAX_ROUGHNESS = 0.5


class EnvLight(NamedTuple):
    """Trainable state is ``base`` only; pdf/cdf are derived (no_grad) —
    recomputed whenever the optimizer updates ``base``
    (ref ``light.py:46-59`` update_pdf)."""

    base: jax.Array  # (H, W, 3) HDR lat-long radiance
    pdf: jax.Array  # (H, W) normalized selection pdf
    rows: jax.Array  # (H,) row CDF
    cols: jax.Array  # (H, W) per-row column CDF


def update_pdf(base: jax.Array) -> EnvLight:
    h, w = base.shape[0], base.shape[1]
    base_ng = jax.lax.stop_gradient(base)
    y = (jnp.arange(h, dtype=base.dtype) + 0.5) / h
    pdf = jnp.max(base_ng, axis=-1) * jnp.sin(y * math.pi)[:, None]
    pdf = pdf / jnp.maximum(jnp.sum(pdf), 1e-12)

    cols = jnp.cumsum(pdf, axis=1)
    rows = jnp.cumsum(cols[:, -1])
    cols = cols / jnp.where(cols[:, -1:] > 0, cols[:, -1:], 1.0)
    rows = rows / jnp.where(rows[-1] > 0, rows[-1], 1.0)
    return EnvLight(base=base, pdf=pdf, rows=rows, cols=cols)


def create_trainable_env_rnd(
    key: jax.Array, base_res: int = 512, scale: float = 0.5, bias: float = 0.25
) -> EnvLight:
    """ref ``light.py:102-105``."""
    base = jax.random.uniform(key, (base_res, base_res, 3)) * scale + bias
    return update_pdf(base)


def eval_light(light: EnvLight, dirs: jax.Array) -> jax.Array:
    """Nearest-neighbor radiance lookup (ref ``kernel.cu:195-201``).
    Differentiable w.r.t. ``light.base`` (gather transpose = scatter-add,
    replacing the reference's atomicAdd backward ``kernel.cu:203-211``)."""
    h, w = light.base.shape[:2]
    uv = dir_to_latlong_uv(dirs)
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return light.base[y, x]


def light_pdf(light: EnvLight, dirs: jax.Array) -> jax.Array:
    """Selection pdf of a direction (ref ``kernel.cu:171-182``)."""
    h, w = light.pdf.shape
    uv = dir_to_latlong_uv(dirs)
    x = jnp.clip((uv[..., 0:1] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1:2] * h).astype(jnp.int32), 0, h - 1)
    sin_t = jnp.maximum(jnp.sin(uv[..., 1:2] * math.pi), 1e-4)
    weight = (h * w) / (2.0 * math.pi * math.pi * sin_t)
    return light.pdf[y[..., 0], x[..., 0]][..., None] * weight


def _bsearch(cdf, x):
    """First index with cdf[idx] > x, branchless over the batch.

    cdf: (N,) shared or (P, N) per-sample rows; x: (P,).  log₂N rounds,
    each one batched gather — no per-sample while loops."""
    n = cdf.shape[-1]
    p = x.shape[0]
    per_row = cdf.ndim == 2
    if not per_row:
        # shared CDF: compare-all beats binary search on the VPU —
        # (P, N) compares + row-sum, zero gathers
        idx = jnp.sum((cdf[None, :] <= x[:, None]).astype(jnp.int32), axis=-1)
        return jnp.clip(idx, 0, n - 1)

    def at(i):
        return jnp.take_along_axis(cdf, i[:, None], axis=-1)[:, 0]

    idx = jnp.zeros((p,), jnp.int32)  # lower bound (exclusive count)
    width = 1 << (n - 1).bit_length()
    step = width
    while step > 0:
        cand = idx + step
        ok = (cand <= n) & (at(jnp.minimum(cand, n) - 1) <= x)
        idx = jnp.where(ok, cand, idx)
        step >>= 1
    # idx = #entries <= x  ==  searchsorted(..., 'right')
    return jnp.clip(idx, 0, n - 1)


def _sample_cdf(cdf, x):
    """Inverse-CDF: (index, residual); exact 'right' semantics
    (ref ``kernel.cu:140-169`` sample_cdf)."""
    n = cdf.shape[-1]
    x = jnp.minimum(x, 0.99999994)
    idx = _bsearch(cdf, x)

    def at(i):
        if cdf.ndim == 2:
            return jnp.take_along_axis(cdf, i[:, None], axis=-1)[:, 0]
        return cdf[i]

    hi = at(idx)
    lo = jnp.where(idx > 0, at(jnp.maximum(idx - 1, 0)), 0.0)
    pdf = jnp.maximum(hi - lo, 1e-12)
    residual = jnp.minimum((x - lo) / pdf, 0.99999994)
    return idx, residual


def _sample_cdf_2d(cols: jax.Array, y: jax.Array, x: jax.Array):
    """Per-row inverse CDF via galloping search with direct 2D gathers —
    never materializes the (P, W) row gather (½ GB at 512² × W=512)."""
    n = cols.shape[-1]
    x = jnp.minimum(x, 0.99999994)

    def at(i):
        return cols[y, i]

    idx = jnp.zeros(y.shape, jnp.int32)
    step = 1 << (n - 1).bit_length()
    while step > 0:
        cand = idx + step
        ok = (cand <= n) & (at(jnp.minimum(cand, n) - 1) <= x)
        idx = jnp.where(ok, cand, idx)
        step >>= 1
    idx = jnp.clip(idx, 0, n - 1)
    hi = at(idx)
    lo = jnp.where(idx > 0, at(jnp.maximum(idx - 1, 0)), 0.0)
    pdf = jnp.maximum(hi - lo, 1e-12)
    residual = jnp.minimum((x - lo) / pdf, 0.99999994)
    return idx, residual


def sample_light(light: EnvLight, u: jax.Array, v: jax.Array):
    """Importance-sample directions from the environment
    (ref ``kernel.cu:184-193`` lightSample).  u, v: (...,) uniforms.
    Returns (dirs (..., 3), pdf (..., 1))."""
    h, w = light.pdf.shape
    shp = u.shape
    uf, vf = u.reshape(-1), v.reshape(-1)
    y, ry = _sample_cdf(light.rows, vf)
    x, rx = _sample_cdf_2d(light.cols, y, uf)
    uv = jnp.stack(
        [(x.astype(u.dtype) + rx) / w, (y.astype(v.dtype) + ry) / h], axis=-1
    )
    dirs = latlong_uv_to_dir(uv).reshape(*shp, 3)
    return dirs, light_pdf(light, dirs)


def generate_image(light: EnvLight, res) -> jax.Array:
    """Bilinear resample of the base map (ref ``light.py:61-64``)."""
    return jax.image.resize(light.base, (res[0], res[1], 3), method="linear")
