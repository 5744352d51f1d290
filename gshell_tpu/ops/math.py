"""Core vector / image / camera math (pure jnp).

TPU-native twin of the reference math zoo ``render/util.py`` (lzzcd001/GShell,
``render/util.py:19-521``).  Everything here is shape-polymorphic pure-jnp and
safe under ``jit``/``vmap``/``grad``.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# Vector ops
# --------------------------------------------------------------------------


def dot(x: jax.Array, y: jax.Array, keepdims: bool = True) -> jax.Array:
    """Row-wise dot product over the last axis (reference ``util.dot``)."""
    return jnp.sum(x * y, axis=-1, keepdims=keepdims)


def length(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Safe L2 norm over the last axis; sqrt clamped away from 0.

    Floor is 1e-12 on the *squared* norm (norm ≥ 1e-6), bounding the
    normalize Jacobian at ~1e6.  The reference's 1e-20 floor admits 1e10
    Jacobian factors, whose products overflow f32 to inf in chained
    normalizations (e.g. half-vector of near-opposite directions) and then
    poison gradients through 0·inf = NaN."""
    return jnp.sqrt(jnp.clip(dot(x, x), min=eps))


def safe_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize over last axis, safe at 0 (reference ``util.safe_normalize``)."""
    return x / length(x, eps)


def reflect(x: jax.Array, n: jax.Array) -> jax.Array:
    """Mirror ``x`` about normal ``n`` (reference ``util.reflect``)."""
    return 2 * dot(x, n) * n - x


def luminance(c: jax.Array) -> jax.Array:
    """Rec. 709 luminance of an RGB color (last axis = 3)."""
    w = jnp.asarray([0.212671, 0.715160, 0.072169], dtype=c.dtype)
    return jnp.sum(c * w, axis=-1, keepdims=True)


def lerp(a: jax.Array, b: jax.Array, t: jax.Array) -> jax.Array:
    return a + (b - a) * t


def cross(a: jax.Array, b: jax.Array) -> jax.Array:
    """3-vector cross product over the last axis."""
    return jnp.cross(a, b)


def build_orthonormal_basis(n: jax.Array):
    """Branchless ONB from a (normalized) normal.

    Frisvad-style basis as used by the reference device code
    (``render/optixutils/c_src/bsdf.h`` branchlessONB).  Returns ``(t, b)``
    with ``t × b = n``.
    """
    sign = jnp.where(n[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2:3])
    b = n[..., 0:1] * n[..., 1:2] * a
    t0 = jnp.concatenate(
        [1.0 + sign * n[..., 0:1] * n[..., 0:1] * a, sign * b, -sign * n[..., 0:1]],
        axis=-1,
    )
    t1 = jnp.concatenate(
        [b, sign + n[..., 1:2] * n[..., 1:2] * a, -n[..., 1:2]], axis=-1
    )
    return t0, t1


def cosine_sample(n: jax.Array, u: jax.Array, v: jax.Array):
    """Cosine-weighted hemisphere sample around ``n``.

    Returns ``(direction, pdf)``; matches the reference device helper
    ``render/optixutils/c_src/envsampling/kernel.cu:57-79``.
    """
    n = safe_normalize(n)
    dx, dy = build_orthonormal_basis(n)
    phi = 2.0 * math.pi * u
    costheta = jnp.sqrt(jnp.clip(v, 0.0, 1.0))
    sintheta = jnp.sqrt(jnp.clip(1.0 - v, 0.0, 1.0))
    x = jnp.cos(phi) * sintheta
    y = jnp.sin(phi) * sintheta
    pdf = jnp.maximum(costheta / math.pi, 1e-6)
    vec = dx * x[..., None] + dy * y[..., None] + n * costheta[..., None]
    return safe_normalize(vec), pdf


# --------------------------------------------------------------------------
# Color space
# --------------------------------------------------------------------------


def _rgb_to_srgb_scalar(f: jax.Array) -> jax.Array:
    return jnp.where(
        f <= 0.0031308, f * 12.92, 1.055 * jnp.power(jnp.clip(f, 0.0031308), 1.0 / 2.4) - 0.055
    )


def rgb_to_srgb(f: jax.Array) -> jax.Array:
    """Linear→sRGB on the first 3 channels; alpha passthrough."""
    if f.shape[-1] == 4:
        return jnp.concatenate([_rgb_to_srgb_scalar(f[..., :3]), f[..., 3:]], axis=-1)
    return _rgb_to_srgb_scalar(f)


def _srgb_to_rgb_scalar(f: jax.Array) -> jax.Array:
    return jnp.where(
        f <= 0.04045, f / 12.92, jnp.power((jnp.clip(f, 0.04045) + 0.055) / 1.055, 2.4)
    )


def srgb_to_rgb(f: jax.Array) -> jax.Array:
    if f.shape[-1] == 4:
        return jnp.concatenate([_srgb_to_rgb_scalar(f[..., :3]), f[..., 3:]], axis=-1)
    return _srgb_to_rgb_scalar(f)


def reinhard(f: jax.Array) -> jax.Array:
    return f / (1.0 + f)


# --------------------------------------------------------------------------
# Metrics
# --------------------------------------------------------------------------


def mse_to_psnr(mse: jax.Array) -> jax.Array:
    """reference ``render/util.py:122-126``."""
    return -10.0 * jnp.log10(jnp.clip(mse, 1e-10))


def psnr_to_mse(psnr: jax.Array) -> jax.Array:
    return jnp.power(10.0, -psnr / 10.0)


# --------------------------------------------------------------------------
# Image resize / pooling (NHWC)
# --------------------------------------------------------------------------


def avg_pool_nhwc(x: jax.Array, size: int) -> jax.Array:
    """Average pool NHWC by integer factor (reference ``util.avg_pool_nhwc``)."""
    if size == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n, h // size, size, w // size, size, c)
    return x.mean(axis=(2, 4))


def scale_img_nhwc(x: jax.Array, size: Sequence[int], method: str = "nearest") -> jax.Array:
    """Resize NHWC image to (H, W) = size (reference ``util.scale_img_nhwc``)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method=method)


def pixel_grid(width: int, height: int, dtype=jnp.float32) -> jax.Array:
    """(H, W, 2) pixel-center uv grid in [0,1] (reference ``util.pixel_grid``)."""
    y = (jnp.arange(height, dtype=dtype) + 0.5) / height
    x = (jnp.arange(width, dtype=dtype) + 0.5) / width
    gy, gx = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


# --------------------------------------------------------------------------
# Lat-long environment map coordinates
# --------------------------------------------------------------------------


def dir_to_latlong_uv(d: jax.Array) -> jax.Array:
    """Direction → lat-long uv.  Matches the reference convention
    ``envsampling/kernel.cu:124-129`` (``u = atan2(x, -z)/2π + 0.5``).

    The clip stays 1e-6 inside ±1: d(arccos)/dy → ∞ at the poles, and rays
    sampled exactly along ±y would otherwise send inf gradients back through
    the light-pdf MIS weight into shading normals and positions."""
    u = jnp.arctan2(d[..., 0:1], -d[..., 2:3]) / (2.0 * math.pi) + 0.5
    v = jnp.arccos(jnp.clip(d[..., 1:2], -1.0 + 1e-6, 1.0 - 1e-6)) / math.pi
    return jnp.concatenate([u, v], axis=-1)


def latlong_uv_to_dir(uv: jax.Array) -> jax.Array:
    """Lat-long uv → direction (reference ``kernel.cu:131-138``)."""
    phi = (uv[..., 0:1] * 2.0 - 1.0) * math.pi
    theta = uv[..., 1:2] * math.pi
    sinphi, cosphi = jnp.sin(phi), jnp.cos(phi)
    sintheta, costheta = jnp.sin(theta), jnp.cos(theta)
    return jnp.concatenate([sintheta * sinphi, costheta, -sintheta * cosphi], axis=-1)


def latlong_to_cubemap(latlong: jax.Array, res: int) -> jax.Array:
    """Sample a lat-long map into a 6×res×res cubemap (reference
    ``util.latlong_to_cubemap``)."""
    # Cube face bases (OpenGL order: +x, -x, +y, -y, +z, -z)
    uv = pixel_grid(res, res) * 2.0 - 1.0
    gx, gy = uv[..., 0], uv[..., 1]
    ones = jnp.ones_like(gx)
    faces = [
        jnp.stack([ones, -gy, -gx], -1),
        jnp.stack([-ones, -gy, gx], -1),
        jnp.stack([gx, ones, gy], -1),
        jnp.stack([gx, -ones, -gy], -1),
        jnp.stack([gx, -gy, ones], -1),
        jnp.stack([-gx, -gy, -ones], -1),
    ]
    dirs = safe_normalize(jnp.stack(faces, axis=0))
    tuv = dir_to_latlong_uv(dirs)
    h, w, _ = latlong.shape
    px = jnp.clip((tuv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    py = jnp.clip((tuv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return latlong[py, px]


# --------------------------------------------------------------------------
# Camera matrices (row conventions match the reference: right-multiplied
# column vectors, OpenGL clip space)
# --------------------------------------------------------------------------


def perspective(fovy: float, aspect: float = 1.0, n: float = 0.1, f: float = 1000.0) -> jnp.ndarray:
    """OpenGL perspective projection (reference ``util.perspective``)."""
    y = math.tan(fovy / 2.0)
    return jnp.array(
        [
            [1.0 / (y * aspect), 0, 0, 0],
            [0, -1.0 / y, 0, 0],
            [0, 0, -(f + n) / (f - n), -(2 * f * n) / (f - n)],
            [0, 0, -1, 0],
        ],
        dtype=jnp.float32,
    )


def translate(x: float, y: float, z: float) -> jnp.ndarray:
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(jnp.array([x, y, z], dtype=jnp.float32))


def rotate_x(a: float) -> jnp.ndarray:
    s, c = math.sin(a), math.cos(a)
    return jnp.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=jnp.float32
    )


def rotate_y(a: float) -> jnp.ndarray:
    s, c = math.sin(a), math.cos(a)
    return jnp.array(
        [[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]], dtype=jnp.float32
    )


def lookat(eye: jax.Array, at: jax.Array, up: jax.Array) -> jax.Array:
    """View matrix (reference ``util.lookAt``)."""
    eye = jnp.asarray(eye, jnp.float32)
    at = jnp.asarray(at, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    w = safe_normalize(eye - at)
    u = safe_normalize(jnp.cross(up, w))
    v = safe_normalize(jnp.cross(w, u))
    rot = jnp.stack([u, v, w], axis=0)  # (3,3)
    t = -rot @ eye
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(rot)
    m = m.at[:3, 3].set(t)
    return m


def xfm_points(points: jax.Array, matrix: jax.Array) -> jax.Array:
    """Transform (..., N, 3) points by (..., 4, 4) matrices → homogeneous
    (..., N, 4).  TPU-native twin of renderutils ``xfm_points``
    (``render/renderutils/c_src/mesh.cu:22``): one batched matmul on the MXU
    instead of a hand-written CUDA kernel."""
    pts_h = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    return jnp.einsum("...ij,...nj->...ni", matrix, pts_h)


def xfm_vectors(vectors: jax.Array, matrix: jax.Array) -> jax.Array:
    """Transform direction vectors (w=0) by 4×4 matrices → (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", matrix[..., :3, :3], vectors)


# --------------------------------------------------------------------------
# Gradient scaling (the reference rescales hash-grid grads ÷8 and light
# grads ×64 between backward and the optimizer step,
# train_gshelltet_deepfashion.py:432-437).  In JAX we fold the same hack into
# the computation graph with a custom VJP so a single jitted train step keeps
# the behavior.
# --------------------------------------------------------------------------


@jax.custom_vjp
def scale_grad(x, scale: float):
    return x


def _scale_grad_fwd(x, scale):
    return x, scale


def _scale_grad_bwd(scale, g):
    return (jax.tree_util.tree_map(lambda t: t * scale, g), None)


scale_grad.defvjp(_scale_grad_fwd, _scale_grad_bwd)
