"""2D textures with mip pyramids and differentiable sampling.

Twin of ``render/texture.py`` (Texture2D): auto/custom mip chains with the
gradient-upscaling backward (the custom ``texture2d_mip`` autograd op,
ref :20-30, falls out of autodiff through ``avg_pool``), trilinear
mip sampling through the LOD computed from uv screen derivatives
(replacing ``dr.texture``), plus clamp/normalize and sRGB helpers.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..ops.math import avg_pool_nhwc, srgb_to_rgb


class Texture2D(NamedTuple):
    """Trainable texture; ``mips[0]`` is the base level (H, W, C)."""

    mips: tuple  # tuple of (H/2^k, W/2^k, C) arrays

    @property
    def base(self):
        return self.mips[0]


def create_trainable(init, res: Sequence[int] | None = None, auto_mipmaps: bool = True) -> Texture2D:
    """ref ``texture.py`` create_trainable / Texture2D.__init__."""
    init = jnp.asarray(init, jnp.float32)
    if init.ndim == 1 and res is not None:
        init = jnp.broadcast_to(init, (res[0], res[1], init.shape[0]))
    return Texture2D(mips=(init,)) if not auto_mipmaps else build_mips(init)


def build_mips(base: jax.Array) -> Texture2D:
    """Average-pool mip chain down to 1×1 (ref texture2d_mip)."""
    mips = [base]
    while min(mips[-1].shape[0], mips[-1].shape[1]) > 1:
        mips.append(avg_pool_nhwc(mips[-1][None], 2)[0])
    return Texture2D(mips=tuple(mips))


def _bilinear(tex: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear fetch, clamp boundary.  uv ∈ [0,1]², tex (H, W, C)."""
    h, w, _ = tex.shape
    x = jnp.clip(uv[..., 0] * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    c00 = tex[y0, x0]
    c01 = tex[y0, x1]
    c10 = tex[y1, x0]
    c11 = tex[y1, x1]
    return (
        c00 * (1 - tx) * (1 - ty)
        + c01 * tx * (1 - ty)
        + c10 * (1 - tx) * ty
        + c11 * tx * ty
    )


def sample(tex: Texture2D, uv: jax.Array, uv_deriv: jax.Array | None = None) -> jax.Array:
    """Trilinear (mip) sampling (replaces ``dr.texture``, ref :57-68).

    uv_deriv: (..., 4) = (du/dx, du/dy, dv/dx, dv/dy) in uv units/pixel;
    None → base level only."""
    if uv_deriv is None or len(tex.mips) == 1:
        return _bilinear(tex.mips[0], uv)
    h, w, _ = tex.mips[0].shape
    # LOD from the max screen-space footprint (OpenGL-style)
    fx = jnp.sqrt((uv_deriv[..., 0] * w) ** 2 + (uv_deriv[..., 2] * h) ** 2)
    fy = jnp.sqrt((uv_deriv[..., 1] * w) ** 2 + (uv_deriv[..., 3] * h) ** 2)
    rho = jnp.maximum(jnp.maximum(fx, fy), 1e-8)
    lod = jnp.clip(jnp.log2(rho), 0.0, len(tex.mips) - 1.0)
    lo = jnp.floor(lod).astype(jnp.int32)
    t = (lod - lo)[..., None]
    out = jnp.zeros(uv.shape[:-1] + (tex.mips[0].shape[-1],))
    # static unrolled blend over levels (few mips; masks select)
    for k in range(len(tex.mips) - 1):
        sel = (lo == k)[..., None]
        blend = _bilinear(tex.mips[k], uv) * (1 - t) + _bilinear(tex.mips[k + 1], uv) * t
        out = jnp.where(sel, blend, out)
    sel_last = (lo >= len(tex.mips) - 1)[..., None]
    out = jnp.where(sel_last, _bilinear(tex.mips[-1], uv), out)
    return out


def clamp(tex: Texture2D, min_val=0.0, max_val=1.0) -> Texture2D:
    return Texture2D(mips=tuple(jnp.clip(m, min_val, max_val) for m in tex.mips))


def normalize(tex: Texture2D) -> Texture2D:
    """Re-normalize a normal-map texture (ref normalize_)."""
    def nrm(m):
        n = m * 2.0 - 1.0
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
        return n * 0.5 + 0.5

    return Texture2D(mips=tuple(nrm(m) for m in tex.mips))


def srgb_to_linear(tex: Texture2D) -> Texture2D:
    return Texture2D(mips=tuple(srgb_to_rgb(m) for m in tex.mips))
