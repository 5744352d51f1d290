"""Cubemap pre-filtering for split-sum image-based lighting.

Twin of the reference renderutils CUDA kernels
``render/renderutils/c_src/cubemap.cu`` (diffuse_cubemap, specular_cubemap,
specular_bounds): cosine- and GGX-weighted integrals of an environment
cubemap, used by the nvdiffrecmc-inherited light pipelines.  (The main
G-Shell training path uses Monte-Carlo sampling instead — ``ops/shade.py`` —
these exist for capability parity and for fast preview shading.)

Pure jnp: the integral over source texels is one big weighted contraction
that XLA maps onto the MXU; differentiable w.r.t. the cubemap by autodiff.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .math import safe_normalize


def cube_dirs(res: int) -> jax.Array:
    """(6, res, res, 3) outward direction of every cubemap texel (OpenGL
    face order: +x, −x, +y, −y, +z, −z)."""
    t = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res * 2.0 - 1.0
    gy, gx = jnp.meshgrid(t, t, indexing="ij")
    one = jnp.ones_like(gx)
    faces = [
        jnp.stack([one, -gy, -gx], -1),
        jnp.stack([-one, -gy, gx], -1),
        jnp.stack([gx, one, gy], -1),
        jnp.stack([gx, -one, -gy], -1),
        jnp.stack([gx, -gy, one], -1),
        jnp.stack([-gx, -gy, -one], -1),
    ]
    return safe_normalize(jnp.stack(faces, 0))


def texel_solid_angles(res: int) -> jax.Array:
    """(6, res, res) solid angle of each texel (cube-face Jacobian)."""
    t = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res * 2.0 - 1.0
    gy, gx = jnp.meshgrid(t, t, indexing="ij")
    r2 = gx * gx + gy * gy + 1.0
    w = 4.0 / (res * res) / (r2 * jnp.sqrt(r2))
    return jnp.broadcast_to(w, (6, res, res))


def diffuse_cubemap(cubemap: jax.Array) -> jax.Array:
    """Cosine-weighted irradiance prefilter (ref cubemap.cu diffuse_cubemap).
    cubemap: (6, H, H, 3) → same shape."""
    res = cubemap.shape[1]
    dirs = cube_dirs(res).reshape(-1, 3)  # (N, 3)
    sa = texel_solid_angles(res).reshape(-1)  # (N,)
    src = cubemap.reshape(-1, 3)
    cosw = jnp.clip(dirs @ dirs.T, min=0.0) * sa[None, :]  # (N, N)
    out = (cosw @ src) / jnp.maximum(cosw.sum(-1, keepdims=True), 1e-8)
    return out.reshape(cubemap.shape)


def _ndf_ggx(alpha_sqr, cos_theta):
    d = (cos_theta * alpha_sqr - cos_theta) * cos_theta + 1.0
    return alpha_sqr / (d * d * math.pi)


def specular_cubemap(cubemap: jax.Array, roughness: float, cutoff: float = 0.99) -> jax.Array:
    """GGX-filtered radiance prefilter for one roughness level
    (ref cubemap.cu specular_cubemap + specular_bounds lobe cutoff).
    Returns (6, H, H, 4): rgb premultiplied by total weight + weight in .a
    (the reference normalizes by .a after accumulating)."""
    res = cubemap.shape[1]
    dirs = cube_dirs(res).reshape(-1, 3)
    sa = texel_solid_angles(res).reshape(-1)
    src = cubemap.reshape(-1, 3)
    alpha = max(roughness * roughness, 1e-3)
    cosw = dirs @ dirs.T  # N = V = R assumption of the split-sum prefilter
    w = _ndf_ggx(alpha * alpha, jnp.clip(cosw, 0.0, 1.0)) * jnp.clip(cosw, min=0.0)
    w = w * sa[None, :]  # full-sphere integration (the reference's
    # specular_bounds cutoff is a GPU-side work-saving bound, not needed here)
    rgb = w @ src
    wsum = w.sum(-1, keepdims=True)
    out = jnp.concatenate([rgb, wsum], axis=-1)
    return out.reshape(cubemap.shape[0], res, res, 4)


def specular_mip_chain(cubemap: jax.Array, min_roughness: float = 0.08, max_roughness: float = 0.5):
    """Roughness mip chain as built by the reference light pipeline:
    level k filters with roughness lerp(min, max, k/(n-1))."""
    res = cubemap.shape[1]
    levels = max(int(math.log2(res)) - 1, 2)
    out = []
    base = cubemap
    for k in range(levels):
        r = min_roughness + (max_roughness - min_roughness) * k / max(levels - 1, 1)
        filt = specular_cubemap(base, r)
        out.append(filt[..., :3] / jnp.maximum(filt[..., 3:], 1e-8))
        if min(base.shape[1], base.shape[2]) > 1:
            base = base.reshape(6, base.shape[1] // 2, 2, base.shape[2] // 2, 2, 3).mean((2, 4))
    return out
