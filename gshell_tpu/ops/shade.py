"""Monte-Carlo environment-light shading with MIS — the shading hot loop.

TPU-native rebuild of the reference's hottest kernel, the OptiX raygen
program ``render/optixutils/c_src/envsampling/kernel.cu:463-541``: per pixel,
``n_samples_x²`` stratified sample pairs of
  * light importance sampling (row/col CDF inversion), and
  * BSDF importance sampling (cosine diffuse lobe or GGX-VNDF specular lobe),
combined with the MIS balance heuristic, each sample shadow-tested.

TPU-first design decisions:
  * One fused jnp program — forward AND backward (autodiff + rematerialization
    via ``jax.checkpoint`` around the per-sample body) instead of the
    reference's hand-fused atomic-add backward (``kernel.cu:424-459``).
  * Shadow rays: **fixed-step ray marching against the trilinear SDF volume**
    that the tet lattice already carries (see ``geometry/tet_grid.py``),
    replacing the OptiX BVH.  The reference ignores shadow boundary gradients
    (``kernel.cu:97-99``), so visibility is stop-gradiented here too.
  * Stratification: per-pixel Cranley-Patterson rotation of an n×n stratum
    grid (replaces the reference's 32k host-side permutation tables,
    ``optixutils/ops.py:86-91``) — same variance-reduction role, zero host
    traffic.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..render.light import EnvLight, eval_light, sample_light
from .bsdf import lambert, pbr_specular
from .math import (
    build_orthonormal_basis,
    cosine_sample,
    dir_to_latlong_uv,
    dot,
    luminance,
    safe_normalize,
)

# ----------------------------------------------------------------------------
# GGX-VNDF importance sampling (ref kernel.cu:217-331)
# ----------------------------------------------------------------------------


def _eval_ndf_ggx(alpha, cos_theta):
    a2 = alpha * alpha
    d = (cos_theta * a2 - cos_theta) * cos_theta + 1.0
    return a2 / (d * d * math.pi)


def _eval_g1_ggx(alpha_sqr, cos_theta):
    ct2 = cos_theta * cos_theta
    tan2 = jnp.maximum(1.0 - ct2, 0.0) / jnp.maximum(ct2, 1e-12)
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + alpha_sqr * tan2))
    return jnp.where(cos_theta > 0, g, 0.0)


def _eval_pdf_ggx_vndf(alpha, wo_l, h_l):
    g1 = _eval_g1_ggx(alpha * alpha, wo_l[..., 2:3])
    d = _eval_ndf_ggx(alpha, h_l[..., 2:3])
    return g1 * d * jnp.maximum(0.0, dot(wo_l, h_l)) / jnp.maximum(wo_l[..., 2:3], 1e-6)


def _sample_ggx_vndf(alpha, wo_l, ux, uy):
    """Heitz VNDF sampling (ref kernel.cu:241-266). Returns (h_l, pdf)."""
    vh = safe_normalize(
        jnp.concatenate(
            [alpha * wo_l[..., 0:1], alpha * wo_l[..., 1:2], wo_l[..., 2:3]], -1
        )
    )
    z_axis = jnp.zeros_like(vh).at[..., 2].set(1.0)
    t1 = jnp.where(
        vh[..., 2:3] < 0.9999,
        safe_normalize(jnp.cross(z_axis, vh)),
        jnp.zeros_like(vh).at[..., 0].set(1.0),
    )
    t2 = jnp.cross(vh, t1)

    r = jnp.sqrt(jnp.clip(ux, 0.0, 1.0))[..., None]
    phi = (2.0 * math.pi) * uy[..., None]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2:3])
    p2 = (1.0 - s) * jnp.sqrt(jnp.clip(1.0 - p1 * p1, 0.0, 1.0)) + s * p2

    nh = (
        t1 * p1
        + t2 * p2
        + vh * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    )
    h = safe_normalize(
        jnp.concatenate(
            [alpha * nh[..., 0:1], alpha * nh[..., 1:2], jnp.maximum(0.0, nh[..., 2:3])],
            -1,
        )
    )
    pdf = _eval_pdf_ggx_vndf(alpha, wo_l, h)
    return h, pdf


def _to_local(v, u_ax, v_ax, w_ax):
    return jnp.concatenate([dot(v, u_ax), dot(v, v_ax), dot(v, w_ax)], axis=-1)


def _to_world(v, u_ax, v_ax, w_ax):
    return u_ax * v[..., 0:1] + v_ax * v[..., 1:2] + w_ax * v[..., 2:3]


def ggx_sample(n, wo, u, v, alpha):
    """Sample a GGX reflection direction (ref kernel.cu:268-291).
    Returns (wi, pdf)."""
    w_ax = safe_normalize(n)
    u_ax, v_ax = build_orthonormal_basis(w_ax)
    wo_l = safe_normalize(_to_local(wo, u_ax, v_ax, w_ax))
    cos_no = wo_l[..., 2:3]

    h, pdf = _sample_ggx_vndf(alpha, wo_l, u, v)
    wo_dot_h = dot(wo_l, h)
    wi_l = h * wo_dot_h * 2.0 - wo_l
    pdf = pdf / jnp.maximum(4.0 * wo_dot_h, 1e-6)
    wi = safe_normalize(_to_world(wi_l, u_ax, v_ax, w_ax))
    ok = cos_no > 0
    return jnp.where(ok, wi, 0.0), jnp.where(ok, pdf, 0.0)


def ggx_pdf(n, wo, wi, alpha):
    """PDF of GGX-VNDF sampling for a given wi (ref kernel.cu:301-323)."""
    w_ax = safe_normalize(n)
    u_ax, v_ax = build_orthonormal_basis(w_ax)
    wo_l = _to_local(wo, u_ax, v_ax, w_ax)
    wi_l = _to_local(wi, u_ax, v_ax, w_ax)
    m = safe_normalize(wi_l + wo_l)
    wo_dot_h = dot(m, wo_l)
    d = _eval_ndf_ggx(alpha, m[..., 2:3])
    g1 = _eval_g1_ggx(alpha * alpha, wo_l[..., 2:3])
    pdf = g1 * d * jnp.maximum(0.0, wo_dot_h) / jnp.maximum(wo_l[..., 2:3], 1e-6)
    pdf = pdf / jnp.maximum(4.0 * wo_dot_h, 1e-6)
    ok = (wo_l[..., 2:3] > 0) & (wi_l[..., 2:3] > 0)
    return jnp.where(ok, pdf, 0.0)


def _cosine_pdf(n, wi):
    return jnp.maximum(dot(n, wi), 0.0) / math.pi


def bsdf_pdf(p_diffuse, n, wo, wi, alpha):
    """Mixture pdf of the BSDF sampling strategy (ref kernel.cu:374-397).

    Each lobe term is gated with ``where`` rather than multiplied by a
    possibly-zero weight: where *selects* in the VJP, so an inf Jacobian
    inside the unused lobe cannot produce 0·inf = NaN gradients (the update_pdf
    b>1e-6 guard in the reference kernel plays the same role)."""
    n_dot_l = dot(n, wi)
    n_dot_v = dot(n, wo)
    degenerate = jnp.minimum(n_dot_v, n_dot_l) < 1e-6
    p_spec = 1.0 - p_diffuse
    diff_term = jnp.where(p_diffuse > 1e-6, p_diffuse * _cosine_pdf(n, wi), 0.0)
    spec_term = jnp.where(p_spec > 1e-6, p_spec * ggx_pdf(n, wo, wi, alpha), 0.0)
    return jnp.where(degenerate, 1.0, diff_term + spec_term)


def bsdf_sample(p_diffuse, n, wo, sx, sy, sz, alpha, diffuse_only: bool = False):
    """Sample the diffuse/specular lobe mixture (ref kernel.cu:334-372).
    Returns (wi, pdf).  ``diffuse_only`` statically skips the GGX lobe
    (params.BSDF 1/2 in the reference kernel never touches it)."""
    wi_d, pdf_d = cosine_sample(n, sx, sy)
    if diffuse_only:
        return wi_d, jnp.maximum(pdf_d[..., None], 1e-6)
    wi_s, pdf_s = ggx_sample(n, wo, sx, sy, alpha)

    take_diffuse = (sz < p_diffuse[..., 0])[..., None]
    wi = jnp.where(take_diffuse, wi_d, wi_s)
    # Full mixture pdf at the chosen direction (ref update_pdf logic);
    # where-gated terms — see bsdf_pdf.
    p_spec = 1.0 - p_diffuse
    pdf = jnp.where(p_diffuse > 1e-6, p_diffuse * _cosine_pdf(n, wi), 0.0)
    pdf = pdf + jnp.where(p_spec > 1e-6, p_spec * ggx_pdf(n, wo, wi, alpha), 0.0)
    # Degenerate diffuse case (pDiffuse ≈ 0 but chosen): return normal, pdf 1
    degen = take_diffuse & (p_diffuse < 1e-4)
    wi = jnp.where(degen, n, wi)
    pdf = jnp.where(degen, 1.0, pdf)
    return wi, pdf


# ----------------------------------------------------------------------------
# SDF-volume shadow rays
# ----------------------------------------------------------------------------


def trilinear_sdf(grid: jax.Array, p: jax.Array, aabb_min, aabb_scale) -> jax.Array:
    """Trilinear SDF sample; grid (R+1, R+1, R+1), p (..., 3) world.
    Out-of-volume points return -1 (outside ≡ empty)."""
    r = grid.shape[0] - 1
    q = (p - aabb_min) * aabb_scale * r  # voxel coords in [0, r]
    inside = ((q >= 0.0) & (q <= r)).all(axis=-1)
    q = jnp.clip(q, 0.0, r - 1e-4)
    q0 = jnp.floor(q).astype(jnp.int32)
    t = q - q0
    ix, iy, iz = q0[..., 0], q0[..., 1], q0[..., 2]
    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]

    def g(dx, dy, dz):
        return grid[
            jnp.minimum(ix + dx, r), jnp.minimum(iy + dy, r), jnp.minimum(iz + dz, r)
        ]

    c00 = g(0, 0, 0) * (1 - tz) + g(0, 0, 1) * tz
    c01 = g(0, 1, 0) * (1 - tz) + g(0, 1, 1) * tz
    c10 = g(1, 0, 0) * (1 - tz) + g(1, 0, 1) * tz
    c11 = g(1, 1, 0) * (1 - tz) + g(1, 1, 1) * tz
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    val = c0 * (1 - tx) + c1 * tx
    return jnp.where(inside, val, -1.0)


class VisibilityCfg(NamedTuple):
    """Static marching parameters (python scalars — safe to close over)."""

    t0: float
    dt: float
    n_steps: int
    threshold: float
    mode: str
    r: int
    aabb_min: tuple
    aabb_scale: tuple


def make_sdf_visibility_parts(
    sdf_grid: jax.Array,
    aabb_min,
    aabb_size,
    n_steps: int = 24,
    t_min_vox: float = 2.0,
    occlusion_threshold: float = 0.0,
    mode: str = "nearest",
    max_grid_res: int = 65,
):
    """(VisibilityCfg, consts) form of :func:`make_sdf_visibility` — the
    traced grid travels through the consts pytree so the shading loop's
    custom VJP never closes over tracers (closures over values created
    inside an outer scan leak during its transpose)."""
    import numpy as np

    diag = float(np.linalg.norm(np.asarray(aabb_size, np.float64)))
    grid = _downsample_occupancy(jax.lax.stop_gradient(sdf_grid), max_grid_res)
    r = grid.shape[0] - 1
    vox = diag / max(r, 1)
    t0 = t_min_vox * vox
    cfg = VisibilityCfg(
        t0=t0,
        dt=(diag - t0) / n_steps,
        n_steps=n_steps,
        threshold=occlusion_threshold,
        mode=mode,
        r=r,
        aabb_min=tuple(float(v) for v in np.asarray(aabb_min, np.float64)),
        aabb_scale=tuple(
            float(v) for v in 1.0 / np.asarray(aabb_size, np.float64)
        ),
    )
    return cfg, {"grid": grid}


def apply_visibility(cfg, consts: dict, ro: jax.Array, rd: jax.Array) -> jax.Array:
    """Shadow-test rays: dispatch to the marcher (VisibilityCfg) or the swept
    shadow field (ShadowFieldCfg)."""
    if isinstance(cfg, ShadowFieldCfg):
        return _apply_shadow_field(cfg, consts, ro, rd)
    grid = consts["grid"]
    n = grid.shape[0]
    r = cfg.r
    flat = grid.reshape(-1)
    aabb_min = jnp.asarray(cfg.aabb_min, ro.dtype)
    aabb_scale = jnp.asarray(cfg.aabb_scale, ro.dtype)

    if cfg.mode == "trilinear":
        def body(i, occ):
            t = cfg.t0 + cfg.dt * (i + 0.5)
            s = trilinear_sdf(grid, ro + rd * t, aabb_min, aabb_scale)
            return jnp.maximum(occ, s)
    else:
        def body(i, occ):
            t = cfg.t0 + cfg.dt * (i + 0.5)
            q = (ro + rd * t - aabb_min) * aabb_scale * r
            inside = ((q >= 0.0) & (q <= r)).all(axis=-1)
            qi = jnp.clip(jnp.round(q).astype(jnp.int32), 0, r)
            idx = (qi[..., 0] * n + qi[..., 1]) * n + qi[..., 2]
            s = jnp.where(inside, flat[idx], -1.0)
            return jnp.maximum(occ, s)

    init = jnp.zeros_like(ro[..., 0]) - jnp.inf
    max_sdf = jax.lax.fori_loop(0, cfg.n_steps, body, init)
    return (max_sdf <= cfg.threshold).astype(ro.dtype)[..., None]


def make_sdf_visibility(
    sdf_grid: jax.Array,
    aabb_min,
    aabb_size,
    n_steps: int = 24,
    t_min_vox: float = 2.0,
    occlusion_threshold: float = 0.0,
    mode: str = "nearest",
    max_grid_res: int = 65,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build a shadow-test callable (closure form — fine outside scans; use
    :func:`make_sdf_visibility_parts` inside custom-VJP loops).  See
    :func:`make_sdf_visibility_parts` for semantics and the TPU cost model.
    """
    cfg, consts = make_sdf_visibility_parts(
        sdf_grid, aabb_min, aabb_size, n_steps, t_min_vox,
        occlusion_threshold, mode, max_grid_res,
    )
    return lambda ro, rd: apply_visibility(cfg, consts, ro, rd)


# ----------------------------------------------------------------------------
# Swept directional shadow field (gather-free precompute, 1 gather per query)
# ----------------------------------------------------------------------------
#
# The per-ray occupancy march above costs n_steps gathers per shadow ray —
# measured gather-bound at ~8-12 ns/element, it dominates the shading step
# (the reference instead traces a BVH per ray, kernel.cu:101-118).  The
# TPU-idiomatic alternative: shadow tests only ever ask "is any occupied
# voxel along direction ω from point p", and ω is drawn from ONE environment
# light shared by every pixel.  So precompute, once per training step, a
# *directional shadow field*: for K fixed directions (octahedral binning of
# the sphere), sweep the occupancy volume far→near along the direction with
# a per-slice DDA shift — a lax.scan of shifted-slice maxima, pure VPU work,
# zero gathers — and bit-pack the K binary volumes along z.  Each shadow
# query then quantizes its direction to the nearest bin and does a SINGLE
# word gather.  Direction quantization error (≈ half a bin, ~5-7° at ko=16)
# is dithered away by the stratified MC sampling that averages n² samples
# per pixel; visibility carries no gradients in the reference either
# (kernel.cu:97-99), so the approximation only touches variance, not bias
# of the gradient estimator.


class ShadowFieldCfg(NamedTuple):
    """Static config for the swept shadow field (python scalars only)."""

    ko: int  # octahedral bins per side (K = ko²)
    r: int  # volume res (n = r+1 samples per side)
    words: int  # uint32 words per z-column
    t0: float  # self-shadow offset along the TRUE sample direction (world)
    aabb_min: tuple
    aabb_scale: tuple


def _oct_bin_centers(ko: int):
    """Unit direction at the center of each octahedral-map bin (numpy)."""
    import numpy as np

    c = (np.arange(ko) + 0.5) / ko * 2.0 - 1.0
    fx, fy = np.meshgrid(c, c, indexing="ij")
    z = 1.0 - np.abs(fx) - np.abs(fy)
    t = np.clip(-z, 0.0, 1.0)
    x = fx - np.where(fx >= 0, 1.0, -1.0) * t
    y = fy - np.where(fy >= 0, 1.0, -1.0) * t
    d = np.stack([x, y, z], -1).reshape(-1, 3)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def oct_bin_index(rd: jax.Array, ko: int) -> jax.Array:
    """Flat octahedral bin index of unit directions rd (..., 3) (traced)."""
    ax = jnp.abs(rd)
    s = jnp.maximum(ax[..., 0] + ax[..., 1] + ax[..., 2], 1e-12)
    px, py = rd[..., 0] / s, rd[..., 1] / s
    sgn = lambda v: jnp.where(v >= 0, 1.0, -1.0)
    px2 = (1.0 - jnp.abs(py)) * sgn(px)
    py2 = (1.0 - jnp.abs(px)) * sgn(py)
    neg = rd[..., 2] < 0
    u = jnp.where(neg, px2, px) * 0.5 + 0.5
    v = jnp.where(neg, py2, py) * 0.5 + 0.5
    iu = jnp.clip((u * ko).astype(jnp.int32), 0, ko - 1)
    iv = jnp.clip((v * ko).astype(jnp.int32), 0, ko - 1)
    return iu * ko + iv


def _downsample_occupancy(grid: jax.Array, max_grid_res: int) -> jax.Array:
    """Conservative (max-pool) 2× downsampling until res ≤ max_grid_res."""
    while grid.shape[0] > max_grid_res and (grid.shape[0] - 1) % 2 == 0:
        rr = grid.shape[0] - 1
        g = grid
        sub = jnp.max(
            jnp.stack(
                [
                    g[dx : dx + rr : 2, dy : dy + rr : 2, dz : dz + rr : 2]
                    for dx in (0, 1)
                    for dy in (0, 1)
                    for dz in (0, 1)
                ]
            ),
            axis=0,
        )
        sub = jnp.pad(sub, ((0, 1), (0, 1), (0, 1)), mode="edge")
        sub = sub.at[-1, :, :].set(jnp.maximum(sub[-1], g[-1, ::2, ::2]))
        grid = sub
    return grid


def _sweep_shadow_group(vol: jax.Array, shifts_u, shifts_v) -> jax.Array:
    """Occlusion sweep for D directions sharing a dominant axis/sign.

    ``vol`` (n, nu, nv) binary occupancy, axis 0 = travel direction (toward
    the light).  ``shifts_u/v`` (n, D) int32 per-slice DDA increments in
    {-1, 0, 1}.  Returns (D, n, nu, nv): out[d, k] = 1 where some occupied
    voxel lies along direction d strictly beyond slice k.  One scan, six
    pad/slice ops per step — no gathers.
    """
    n, nu, nv = vol.shape
    d = shifts_u.shape[1]

    def shift1(b, delta, axis):
        # b (D, nu, nv); sample b at (index + delta) with zero fill
        pad = [(0, 0)] * 3
        pad[axis] = (1, 1)
        bp = jnp.pad(b, pad)
        sl = lambda j: jax.lax.slice_in_dim(bp, j, j + b.shape[axis], axis=axis)
        dexp = delta.reshape((d,) + (1, 1))
        return jnp.where(dexp == -1, sl(0), jnp.where(dexp == 0, b, sl(2)))

    def step(carry, x):
        slice_k, su, sv = x
        out = carry  # A_k: occlusion beyond slice k
        b = jnp.maximum(slice_k[None], carry)
        nxt = shift1(shift1(b, su, 1), sv, 2)  # A_{k-1}
        return nxt, out

    _, outs = jax.lax.scan(
        step,
        jnp.zeros((d, nu, nv), vol.dtype),
        (vol, shifts_u.astype(jnp.int32), shifts_v.astype(jnp.int32)),
        reverse=True,
    )
    return jnp.moveaxis(outs, 0, 1)  # (D, n, nu, nv)


def make_shadow_field_parts(
    sdf_grid: jax.Array,
    aabb_min,
    aabb_size,
    ko: int = 16,
    t_min_vox: float = 2.0,
    occlusion_threshold: float = 0.0,
    max_grid_res: int = 65,
):
    """(ShadowFieldCfg, consts) shadow tester — drop-in for
    :func:`make_sdf_visibility_parts` with ~n_steps× fewer gathers."""
    import numpy as np

    grid = _downsample_occupancy(jax.lax.stop_gradient(sdf_grid), max_grid_res)
    occ = (grid > occlusion_threshold).astype(jnp.float32)
    n = occ.shape[0]
    r = n - 1
    k_total = ko * ko
    dirs = _oct_bin_centers(ko)  # (K, 3) static

    field = jnp.zeros((k_total, n, n, n), jnp.float32)
    axes_dom = np.argmax(np.abs(dirs), axis=-1)
    signs = np.sign(dirs[np.arange(k_total), axes_dom])
    for a in range(3):
        perm = (a, (a + 1) % 3, (a + 2) % 3)
        inv = tuple(int(np.argsort(perm)[i]) for i in range(3))
        for s in (1.0, -1.0):
            sel = np.nonzero((axes_dom == a) & (signs == s))[0]
            if sel.size == 0:
                continue
            dgrp = dirs[sel]
            dom = np.abs(dgrp[:, a])
            du = dgrp[:, perm[1]] / dom  # per-slice drift, |du| ≤ 1
            dv = dgrp[:, perm[2]] / dom
            # DDA increments at absolute slice index k (k=0 unused)
            ks = np.arange(n)[:, None]
            su = np.round(ks * du[None]) - np.round((ks - 1) * du[None])
            sv = np.round(ks * dv[None]) - np.round((ks - 1) * dv[None])
            vol = jnp.transpose(occ, perm)
            if s < 0:
                vol = jnp.flip(vol, axis=0)
            out = _sweep_shadow_group(
                vol, jnp.asarray(su, jnp.int32), jnp.asarray(sv, jnp.int32)
            )
            if s < 0:
                out = jnp.flip(out, axis=1)
            out = jnp.transpose(out, (0,) + tuple(i + 1 for i in inv))
            field = field.at[jnp.asarray(sel)].set(out)

    # bit-pack along z: (K, n, n, W) uint32 → bitcast f32 (rides custom-VJP
    # accumulator args; integer/bool leaves would produce float0 cotangents)
    words = (n + 31) // 32
    pad_z = words * 32 - n
    bits = jnp.pad(field, ((0, 0),) * 3 + ((0, pad_z),)).astype(jnp.uint32)
    bits = bits.reshape(k_total, n, n, words, 32)
    packed = (bits << jnp.arange(32, dtype=jnp.uint32)).sum(
        axis=-1, dtype=jnp.uint32
    )
    packed_f = jax.lax.bitcast_convert_type(packed, jnp.float32)

    diag = float(np.linalg.norm(np.asarray(aabb_size, np.float64)))
    cfg = ShadowFieldCfg(
        ko=ko,
        r=r,
        words=words,
        t0=t_min_vox * diag / max(r, 1),
        aabb_min=tuple(float(v) for v in np.asarray(aabb_min, np.float64)),
        aabb_scale=tuple(float(v) for v in 1.0 / np.asarray(aabb_size, np.float64)),
    )
    return cfg, {"field": packed_f}


def _apply_shadow_field(
    cfg: ShadowFieldCfg, consts: dict, ro: jax.Array, rd: jax.Array
) -> jax.Array:
    field = jax.lax.bitcast_convert_type(consts["field"], jnp.uint32).reshape(-1)
    n = cfg.r + 1
    aabb_min = jnp.asarray(cfg.aabb_min, ro.dtype)
    aabb_scale = jnp.asarray(cfg.aabb_scale, ro.dtype)
    k = oct_bin_index(rd, cfg.ko)
    q = (ro + rd * cfg.t0 - aabb_min) * aabb_scale * cfg.r
    inside = ((q >= 0.0) & (q <= cfg.r)).all(axis=-1)
    qi = jnp.clip(jnp.round(q).astype(jnp.int32), 0, cfg.r)
    z = qi[..., 2]
    idx = (((k * n + qi[..., 0]) * n + qi[..., 1]) * cfg.words) + z // 32
    word = field[idx]
    occluded = (word >> (z % 32).astype(jnp.uint32)) & jnp.uint32(1)
    vis = jnp.where(inside, 1.0 - occluded.astype(ro.dtype), 1.0)
    return vis[..., None]


# ----------------------------------------------------------------------------
# Memory-free Monte-Carlo accumulation
# ----------------------------------------------------------------------------


def _mc_accumulate(
    step_contrib: Callable, n_steps: int, args, init_of: Callable, block: int = 1
):
    """Σᵢ step_contrib(args, i, aux_i)₀ with O(pixels) memory under AD.

    A scan's backward normally stores per-iteration residuals — for an
    n²-sample MC loop over a 512² image that's gigabytes.  But for a pure
    accumulation the upstream gradient of every per-sample contribution is
    the SAME cotangent, so the backward can re-walk the loop computing each
    sample's VJP independently and summing the argument gradients:
    memory O(P), compute ≈ 2× forward.  (This is the same structure as the
    reference's fused forward+backward OptiX kernel, kernel.cu:424-459 —
    the backward re-traces the same rays and accumulates atomically.)

    ``step_contrib(args, i, aux)`` returns ``(contribution, aux_out)``:
    ``aux_out`` carries small per-sample *detached* intermediates (shadow
    visibilities) that the forward saves so the backward re-walk skips the
    most expensive recomputation (the 32-step shadow march).  The forward
    pass is called with ``aux=None``; the backward with the saved slice.

    ``args`` must be a float-only pytree (pack RNG keys via bitcast).

    ``block``: number of MC steps evaluated per loop iteration (vmapped over
    the step index).  The per-pixel VPU math of one step is shallow, so a
    64-trip sequential loop is launch/latency-bound at compacted pixel
    counts; blocking k steps multiplies per-iteration parallelism by k at
    k× transient (never resident) memory.  Must divide ``n_steps``.
    """
    block = max(1, min(block, n_steps))
    while n_steps % block:
        block -= 1
    n_blocks = n_steps // block

    def block_contrib(a, j, aux_blk):
        s_vec = j * block + jnp.arange(block)
        if block == 1:
            c, aux = step_contrib(
                a, s_vec[0], None if aux_blk is None else aux_blk[0]
            )
            return c, aux[None] if aux is not None else None
        if aux_blk is None:
            c, aux = jax.vmap(lambda s: step_contrib(a, s, None))(s_vec)
        else:
            c, aux = jax.vmap(lambda s, x: step_contrib(a, s, x))(s_vec, aux_blk)
        return c.sum(axis=0), aux

    @jax.custom_vjp
    def run(args):
        def body(j, acc):
            c, _ = block_contrib(args, j, None)
            return acc + c

        # init derived from args: keeps shard_map varying-axis tracking
        # consistent AND avoids closing over outer-scope tracers
        return jax.lax.fori_loop(0, n_blocks, body, init_of(args))

    def fwd(args):
        def body(acc, j):
            c, aux = block_contrib(args, j, None)
            return acc + c, aux

        total, aux_stack = jax.lax.scan(
            lambda acc, j: body(acc, j), init_of(args), jnp.arange(n_blocks)
        )
        return total, (args, jax.lax.stop_gradient(aux_stack))

    def bwd(res, g):
        args, aux_stack = res

        def body(j, acc):
            aux_j = jax.tree_util.tree_map(lambda t: t[j], aux_stack)
            _, vjp = jax.vjp(lambda a: block_contrib(a, j, aux_j)[0], args)
            (gi,) = vjp(g)
            return jax.tree_util.tree_map(jnp.add, acc, gi)

        zero = jax.tree_util.tree_map(jnp.zeros_like, args)
        return (jax.lax.fori_loop(0, n_blocks, body, zero),)

    run.defvjp(fwd, bwd)
    return run(args)


def _key_to_float(key: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(jax.random.key_data(key), jnp.float32)


def _key_from_float(bits: jax.Array) -> jax.Array:
    return jax.random.wrap_key_data(
        jax.lax.bitcast_convert_type(bits, jnp.uint32)
    )


# ----------------------------------------------------------------------------
# The shading loop
# ----------------------------------------------------------------------------


class ShadeBuffers(NamedTuple):
    diffuse: jax.Array  # (P, 3) demodulated diffuse light accumulation
    specular: jax.Array  # (P, 3) specular accumulation


def _pixel_probabilities(kd, ks, wo, nrm):
    """Lobe selection probability (ref kernel.cu:495-502)."""
    metallic = ks[..., 2:3]
    spec_col = 0.04 * (1.0 - metallic) + kd * metallic
    diffuse_weight = (1.0 - metallic) * luminance(kd)
    cos_no = dot(wo, nrm)
    f = spec_col + (1.0 - spec_col) * (1.0 - jnp.clip(cos_no, 1e-4, 1.0 - 1e-4)) ** 5
    specular_weight = jnp.where(cos_no > 0, luminance(f), 0.0)
    total = diffuse_weight + specular_weight
    return jnp.where(total > 0, diffuse_weight / jnp.maximum(total, 1e-12), 1.0)


def env_shade(
    key: jax.Array,
    mask: jax.Array,
    ro: jax.Array,
    gb_pos: jax.Array,
    gb_normal: jax.Array,
    view_pos: jax.Array,
    kd: jax.Array,
    ks: jax.Array,
    light: EnvLight,
    n_samples_x: int = 8,
    bsdf: str = "pbr",
    shadow_scale: float = 1.0,
    visibility_fn: Callable | None = None,
    light_pool: int = 4096,
    mc_block: int = 8,
    light_bf16: bool = True,
) -> ShadeBuffers:
    """Estimate (demodulated diffuse, specular) radiance per pixel.

    Twin of ``optix_env_shade`` (``render/optixutils/ops.py:128``,
    ``kernel.cu:463-541``).  Inputs are flattened pixel arrays (P, 3)/(P, 1).
    ``bsdf``: 'pbr' | 'diffuse' | 'white' (diffuse/white skip the specular
    lobe exactly like params.BSDF 1/2 in the reference kernel).
    """
    p = gb_pos.shape[0]
    n2 = n_samples_x * n_samples_x
    strata = 1.0 / n_samples_x

    diffuse_only = bsdf in ("diffuse", "white")

    # Per-pixel Cranley-Patterson rotations decorrelate strata across pixels
    # (BSDF-strategy (u,v) only; the light strategy decorrelates via the pool
    # rotation, so its rot columns were dead reads — (P, 2) not (P, 6) keeps
    # the per-step HBM traffic of this buffer at 8 B/pixel).
    k_rot, k_pool, k_loop = jax.random.split(key, 3)
    rot = jax.random.uniform(k_rot, (p, 2))

    # --- Stratified light-sample pool (ref ops.py:86-91 permutation pool) ---
    # CDF inversion is gather-bound (~10 search rounds/pixel/step); but every
    # pixel samples the SAME environment CDF.  The reference already shares a
    # 32k-entry host-side jitter pool across all pixels; here the pool holds
    # fully inverted samples — per stratum, `light_pool` independent draws of
    # (direction, pdf, radiance) — built ONCE per step.  Pixel p in step s
    # reads pool row ((p + c_s) mod N) where c_s is a fresh random offset —
    # a ROTATION of the pool (jnp.roll + broadcast), not a random gather:
    # this removes one of the two HBM gathers in every MC step of every
    # walk (fwd + custom-VJP re-walks), measured ~35% of the loop cost.
    # Marginally each pixel still draws fresh samples from the exact light
    # distribution each step (unbiased); the only cross-pixel correlation is
    # between pixel pairs exactly N apart (N=4096 ⇒ 8 rows at 512 width),
    # strictly weaker than the reference's shared 32k jitter pool.
    np_pool = int(light_pool)
    sx_idx = jnp.arange(n2, dtype=jnp.float32) % n_samples_x
    sy_idx = jnp.arange(n2, dtype=jnp.float32) // n_samples_x
    ju = jax.random.uniform(k_pool, (n2, np_pool, 2))
    lu_pool = (sx_idx[:, None] + ju[..., 0]) * strata
    lv_pool = (sy_idx[:, None] + ju[..., 1]) * strata
    pool_dirs, pool_pdf = sample_light(
        light, lu_pool.reshape(-1), lv_pool.reshape(-1)
    )
    pool_col = eval_light(light, pool_dirs)
    pool = jnp.concatenate([pool_dirs, pool_pdf, pool_col], axis=-1)
    pool = pool.reshape(n2, np_pool, 7)  # (step, entry, feature)

    # base radiance + selection pdf packed in one texel: the BSDF strategy's
    # eval_light + light_pdf share the same (y, x) — one 4-wide gather.
    # bf16 halves the bytes of this per-pixel-per-step random gather (the
    # hottest light access: 64 steps × 3 walks); the ~0.3% radiance/pdf
    # quantization is far below the n²-sample MC noise floor, and the cast
    # transpose still routes the gather's scatter-add gradient to the f32
    # light.base (the reference keeps f32 textures but reads them through
    # HW-filtered texture units, kernel.cu:195-201 — bf16 is the TPU
    # equivalent of that cheaper read path).
    light_packed = jnp.concatenate(
        [light.base, light.pdf[..., None].astype(light.base.dtype)], axis=-1
    )
    if light_bf16:
        light_packed = light_packed.astype(jnp.bfloat16)

    # ALL traced values travel through the custom-VJP accumulator's args —
    # the backward of an outer scan (lax.map over views) transposes the
    # custom_vjp in a context where closed-over tracers have died.  Non-
    # differentiable entries (rot, RNG bits, detached shadow volume) simply
    # get discarded zero cotangents, matching the reference's gradient
    # surface (kernel.cu:424-459).
    if isinstance(visibility_fn, tuple):
        vis_cfg, vis_consts = visibility_fn
    else:
        vis_cfg, vis_consts = None, {}
    wo_pre = safe_normalize(view_pos - gb_pos)
    alpha_pre = ks[..., 1:2] * ks[..., 1:2]
    p_diffuse_pre = (
        jnp.ones_like(alpha_pre)
        if diffuse_only
        else _pixel_probabilities(kd, ks, wo_pre, gb_normal)
    )
    args = {
        "ro": ro,
        "gb_pos": gb_pos,
        "gb_normal": gb_normal,
        "view_pos": view_pos,
        "kd": kd,
        "ks": ks,
        "wo": wo_pre,
        "alpha": alpha_pre,
        "p_diffuse": p_diffuse_pre,
        "pool": pool,
        "light_packed": light_packed,
        "rot": rot,
        "key_bits": _key_to_float(k_loop),
        "shadow_scale": jnp.asarray(shadow_scale, jnp.float32),
        "vis": vis_consts,
    }

    def step_contrib(a, s, aux):
        gb_normal = a["gb_normal"]
        kd, ks = a["kd"], a["ks"]
        rot = a["rot"]
        k_loop = _key_from_float(a["key_bits"])
        shadow_scale_t = a["shadow_scale"]
        # step-invariants travel through args (computed ONCE outside the
        # loop; their cotangents accumulate across steps and chain upstream
        # through the custom-VJP args gradient)
        wo, alpha, p_diffuse = a["wo"], a["alpha"], a["p_diffuse"]

        def eval_sample(ray_dir, pdf_sum, vis, light_col):
            mis = 1.0 / jnp.maximum(pdf_sum, 1e-4)
            if diffuse_only:
                diff = lambert(gb_normal, ray_dir)
                spec = jnp.zeros_like(diff)
            else:
                metallic = ks[..., 2:3]
                spec_col = 0.04 * (1.0 - metallic) + kd * metallic
                diff = lambert(gb_normal, ray_dir)
                spec = pbr_specular(
                    spec_col, gb_normal, wo, ray_dir, alpha, min_roughness=0.08
                )
            v = vis * shadow_scale_t + (1.0 - shadow_scale_t)
            w = mis * (1.0 / n2) * v
            return diff * light_col * w, spec * light_col * w

        def shadow(ray_dir, slot):
            if aux is not None:  # backward re-walk: reuse saved visibility
                return aux[:, slot : slot + 1]
            if vis_cfg is not None:
                return jax.lax.stop_gradient(
                    apply_visibility(vis_cfg, a["vis"], a["ro"], ray_dir)
                )
            if visibility_fn is None:
                return jnp.ones_like(ray_dir[..., :1])
            # legacy callable form — fine outside outer scans
            return jax.lax.stop_gradient(visibility_fn(a["ro"], ray_dir))

        ku = jax.random.fold_in(k_loop, s)
        u = jax.random.uniform(ku, (p, 3))
        sx_i = s % n_samples_x
        sy_i = s // n_samples_x

        # --- strategy 1: light importance sampling (ref :512-519) —
        # gather-free pool rotation: pixel p ← pool_s[(p + c_s) mod N]
        c_s = jax.random.randint(jax.random.fold_in(ku, 1), (), 0, np_pool)
        pool_s = jax.lax.dynamic_index_in_dim(a["pool"], s, 0, keepdims=False)
        rolled = jnp.roll(pool_s, -c_s, axis=0)  # (N, 7)
        reps = -(-p // np_pool)
        entry = jnp.broadcast_to(rolled[None], (reps, np_pool, 7)).reshape(-1, 7)[
            :p
        ]  # (P, 7)
        ray_dir = entry[:, 0:3]
        pdf_l = entry[:, 3:4]
        light_col1 = entry[:, 4:7]
        if diffuse_only:
            pdf_b = _cosine_pdf(gb_normal, ray_dir)
        else:
            pdf_b = bsdf_pdf(p_diffuse, gb_normal, wo, ray_dir, alpha)
        vis1 = shadow(ray_dir, 0)
        d1, s1 = eval_sample(ray_dir, pdf_l + pdf_b, vis1, light_col1)

        # --- strategy 2: BSDF sampling (ref :521-529)
        bu = jnp.mod((sx_i + u[:, 0]) * strata + rot[:, 0], 1.0)
        bv = jnp.mod((sy_i + u[:, 1]) * strata + rot[:, 1], 1.0)
        ray_dir2, pdf_b2 = bsdf_sample(
            p_diffuse, gb_normal, wo, bu, bv, u[:, 2], alpha,
            diffuse_only=diffuse_only,
        )
        lp = a["light_packed"]
        hh, ww = lp.shape[0], lp.shape[1]
        uv2 = dir_to_latlong_uv(ray_dir2)
        lx = jnp.clip((uv2[..., 0] * ww).astype(jnp.int32), 0, ww - 1)
        ly = jnp.clip((uv2[..., 1] * hh).astype(jnp.int32), 0, hh - 1)
        texel = lp[ly, lx].astype(jnp.float32)  # (P, 4): radiance + sel. pdf
        light_col2 = texel[:, 0:3]
        sin_t = jnp.maximum(jnp.sin(uv2[..., 1:2] * math.pi), 1e-4)
        pdf_l2 = texel[:, 3:4] * (hh * ww) / (2.0 * math.pi * math.pi * sin_t)
        vis2 = shadow(ray_dir2, 1)
        d2, s2 = eval_sample(ray_dir2, pdf_l2 + pdf_b2, vis2, light_col2)

        contrib = jnp.concatenate([d1 + d2, s1 + s2], axis=-1)  # (P, 6)
        return contrib, jnp.concatenate([vis1, vis2], axis=-1)  # aux (P, 2)

    init_of = lambda a: jnp.concatenate(
        [jnp.zeros_like(a["gb_pos"]), jnp.zeros_like(a["gb_pos"])], -1
    )
    acc = _mc_accumulate(step_contrib, n2, args, init_of, block=mc_block)
    diff_acc, spec_acc = acc[:, :3], acc[:, 3:]

    m = mask.reshape(p, 1).astype(diff_acc.dtype)
    return ShadeBuffers(diffuse=diff_acc * m, specular=spec_acc * m)
