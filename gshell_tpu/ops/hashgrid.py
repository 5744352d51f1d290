"""Multiresolution hash-grid encoding (instant-NGP style) in pure JAX.

TPU-native replacement for tiny-cuda-nn's ``HashGrid`` encoding used by the
reference's neural material (``render/mlptexture.py:58-74``): 16 levels,
2 features/level, 2^19-entry tables, base resolution 16 → 4096.

The forward is a batched gather + trilinear blend; the backward (scatter-add
into the tables) is XLA's gather-transpose — efficient sorted-segment sums on
TPU.  The reference's ÷128 gradient-scaling hook on the encoder
(``render/mlptexture.py:72-74``) is reproduced by the caller with
``ops.math.scale_grad``.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Spatial-hash primes (Müller et al., instant-ngp; same as tiny-cuda-nn).
_PRIMES = (1, 2654435761, 805459861)


class HashGridParams(NamedTuple):
    tables: jax.Array  # (L, T, F) feature tables


class HashGridConfig(NamedTuple):
    n_levels: int = 16
    n_features: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    desired_resolution: int = 4096
    # Pack 2-feature tables fp16×2 into one u32 gather on the exact-forward
    # path (halves the hottest HBM access; matches tiny-cuda-nn's fp16
    # tables).  False = full-precision f32 gathers, bit-identical to
    # hashgrid_encode.
    packed_fp16: bool = True

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def per_level_scale(self) -> float:
        return math.exp(
            math.log(self.desired_resolution / self.base_resolution)
            / (self.n_levels - 1)
        )

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    def level_resolutions(self):
        s = self.per_level_scale
        return [
            int(math.floor(self.base_resolution * (s**l))) for l in range(self.n_levels)
        ]


def init_hashgrid(key: jax.Array, cfg: HashGridConfig, dtype=jnp.float32) -> HashGridParams:
    """Uniform init in [-1e-4, 1e-4] (tiny-cuda-nn default)."""
    tables = jax.random.uniform(
        key,
        (cfg.n_levels, cfg.table_size, cfg.n_features),
        dtype=dtype,
        minval=-1e-4,
        maxval=1e-4,
    )
    return HashGridParams(tables=tables)


def _corner_index(ix: jax.Array, iy: jax.Array, iz: jax.Array, res: int, table_size: int):
    """Grid-cell corner → table index.  Dense indexing when the level grid
    fits in the table, spatial hash otherwise (instant-ngp §4)."""
    n_dense = (res + 1) ** 3
    if n_dense <= table_size:
        return (ix * (res + 1) + iy) * (res + 1) + iz
    h = (
        ix * _PRIMES[0]
        ^ iy * jnp.uint32(_PRIMES[1]).astype(jnp.int32)
        ^ iz * jnp.uint32(_PRIMES[2]).astype(jnp.int32)
    )
    return jnp.abs(h) % table_size


def _corner_weight_arrays(x: jax.Array, cfg: HashGridConfig, with_jac: bool):
    """(idx (P, 8L) int32, wgt (P, 8L), [dwx, dwy, dwz (P, 8L)]) — corner
    indices, trilinear weights, and (optionally) the weight derivatives, all
    as LANE-ALIGNED (·, 8L = 128 at default config) arrays.  Column order is
    level-major: column l·8 + c with corner bit order c = cx·4 + cy·2 + cz.

    Vectorized over (level, corner) — the former 16×8 Python loop emitted
    ~1000 scalar-indexing HLO ops (×4 with the jacobian, ×2 in the
    stochastic path) and alone cost ~12 s of the train step's compile; this
    batched form compiles in ~1 s with identical values.

    Shape discipline: every tensor here is (P, 8L) — column c' = l·8 + c
    with per-COLUMN constant vectors (level resolution, corner bits, level
    offset) broadcast along the 128-lane minor axis.  A first draft shaped
    the math (P, L, 8, 3); the minor dims pad 3 → 128 lanes on TPU and the
    step's compile-time HBM check blew past one chip
    (16.58 G needed vs 15.75 G at 512²/grid96/spp8/b2).  The per-level
    floor/fraction is recomputed per corner column (8× redundant elementwise
    work) — trivially fused, and it keeps everything lane-aligned."""
    T = cfg.table_size
    L = cfg.n_levels
    p = x.shape[0]
    res_list = cfg.level_resolutions()

    # per-column (8L,) constants: column c' = l·8 + c, corner bit order
    # c = cx·4 + cy·2 + cz
    import numpy as _np

    lvl = _np.repeat(_np.arange(L), 8)
    cx = _np.tile(_np.array([0, 0, 0, 0, 1, 1, 1, 1]), L)
    cy = _np.tile(_np.array([0, 0, 1, 1, 0, 0, 1, 1]), L)
    cz = _np.tile(_np.array([0, 1, 0, 1, 0, 1, 0, 1]), L)
    res_np = _np.asarray(res_list)[lvl]
    dense_np = (res_np + 1) ** 3 <= T
    res_col = jnp.asarray(res_np.astype(_np.float32), x.dtype)[None, :]
    res_i_col = jnp.asarray(res_np, jnp.int32)[None, :]
    # dense formula runs with a masked resolution (1 on hash levels) so its
    # products stay in int32 range at the fine levels
    res_d_col = jnp.asarray(
        _np.where(dense_np, res_np + 1, 1), jnp.int32
    )[None, :]
    dense_col = jnp.asarray(dense_np)[None, :]
    off_col = jnp.asarray(lvl * T, jnp.int32)[None, :]
    cxb = jnp.asarray(cx, jnp.int32)[None, :]
    cyb = jnp.asarray(cy, jnp.int32)[None, :]
    czb = jnp.asarray(cz, jnp.int32)[None, :]

    def axis(xd, cb):
        """per-axis (P, 8L): corner index i and interp factor f."""
        xs = xd[:, None] * res_col
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, res_i_col - 1)
        t = xs - x0.astype(xs.dtype)
        i = x0 + cb
        f = jnp.where(cb == 1, t, 1.0 - t)
        return i, f

    ix, fx = axis(x[:, 0], cxb)
    iy, fy = axis(x[:, 1], cyb)
    iz, fz = axis(x[:, 2], czb)

    # dense indexing where the level grid fits the table, spatial hash
    # otherwise (instant-ngp §4)
    idx_dense = (ix * res_d_col + iy) * res_d_col + iz
    h = (
        ix * _PRIMES[0]
        ^ iy * jnp.uint32(_PRIMES[1]).astype(jnp.int32)
        ^ iz * jnp.uint32(_PRIMES[2]).astype(jnp.int32)
    )
    idx_hash = jnp.abs(h) % T
    idx = jnp.where(dense_col, idx_dense, idx_hash) + off_col  # (P, 8L)

    wgt = fx * fy * fz
    if not with_jac:
        return idx, wgt, None
    sx = jnp.where(cxb == 1, res_col, -res_col)
    sy = jnp.where(cyb == 1, res_col, -res_col)
    sz = jnp.where(czb == 1, res_col, -res_col)
    dwx = sx * fy * fz
    dwy = fx * sy * fz
    dwz = fx * fy * sz
    return idx, wgt, (dwx, dwy, dwz)


def _feature_tables(params: HashGridParams, cfg: HashGridConfig):
    """Tables as F separate 1-D (L·T,) arrays.

    TPU layout rule (measured, docs/STATUS.md): a materialized (·, ·, F=2)
    tensor is lane-padded 128/F = 64× — gathering (P, 8L, F) corner features
    at 512² inflates 0.5 GB of data to 8 GB of HLO temps (this OOMed the
    b2 step).  Gathering each feature from a 1-D table instead yields
    (P, 8L) = (P, 128) outputs — zero padding."""
    L, T, F = params.tables.shape
    return [params.tables[..., f].reshape(L * T) for f in range(F)]


def _packed_feature_table(params: HashGridParams) -> jax.Array:
    """Both features of a 2-feature table packed fp16×2 → one u32 per row.

    The exact-forward gather is the hottest per-pixel HBM access in the
    whole train step (measured ~4–5 ns/row × P·8L rows per feature at 512²);
    packing halves the gathered rows.  fp16 feature precision matches
    tiny-cuda-nn's fp16 tables exactly (ref ``render/mlptexture.py:58-74``);
    this path treats tables as constants (x-gradients only), so quantization
    never touches the table-gradient path.  Callers needing full-precision
    parity with :func:`hashgrid_encode` set ``HashGridConfig.packed_fp16 =
    False`` (falls back to the two per-feature f32 gathers)."""
    t = jax.lax.stop_gradient(params.tables)  # (L, T, 2)
    u = jax.lax.bitcast_convert_type(t.astype(jnp.float16), jnp.uint16)
    u = u.astype(jnp.uint32)
    return (u[..., 0] | (u[..., 1] << 16)).reshape(-1)  # (L·T,)


def _unpack_features(fu: jax.Array, dtype):
    lo = jax.lax.bitcast_convert_type(
        (fu & 0xFFFF).astype(jnp.uint16), jnp.float16
    ).astype(dtype)
    hi = jax.lax.bitcast_convert_type(
        (fu >> 16).astype(jnp.uint16), jnp.float16
    ).astype(dtype)
    return lo, hi


def _encode_with_xjac(params: HashGridParams, x: jax.Array, cfg: HashGridConfig):
    """Forward encode + analytic position-Jacobian.

    Returns (out (P, L·F) feature-major [f·L + l], jac (P, 3·L·F) dim-major
    blocks matching out's order) — the per-level trilinear weight
    derivatives are contracted against the gathered features DURING the
    forward, so a backward w.r.t. x never re-gathers (XLA otherwise
    rematerializes the 67M-element gather in the transpose — measured as
    expensive as the forward itself).  Every materialized intermediate is
    (P, 8L) or (P, L)-shaped — see :func:`_feature_tables`.  For the default
    2-feature config both features ride ONE u32 gather
    (:func:`_packed_feature_table`)."""
    p = x.shape[0]
    L = cfg.n_levels
    idx, wgt, (dwx, dwy, dwz) = _corner_weight_arrays(x, cfg, with_jac=True)

    if params.tables.shape[-1] == 2 and cfg.packed_fp16:
        fu = _packed_feature_table(params)[idx]  # (P, 8L) u32 — one gather
        feats_per_f = _unpack_features(fu, x.dtype)
    else:
        feats_per_f = [flat_f[idx] for flat_f in _feature_tables(params, cfg)]

    outs, jacs = [], {0: [], 1: [], 2: []}
    for feats in feats_per_f:
        red = lambda w: (feats * w).reshape(p, L, 8).sum(axis=2)  # (P, L)
        outs.append(red(wgt))
        jacs[0].append(red(dwx))
        jacs[1].append(red(dwy))
        jacs[2].append(red(dwz))
    out = jnp.concatenate(outs, axis=1)  # (P, F·L) feature-major
    jac = jnp.concatenate(jacs[0] + jacs[1] + jacs[2], axis=1)  # (P, 3·F·L)
    return out, jac


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hashgrid_encode_x_grads(params: HashGridParams, x: jax.Array, cfg: HashGridConfig):
    """:func:`hashgrid_encode` variant whose gradient flows ONLY to ``x``
    (tables treated as constants), with a gather-free backward.  Used as the
    exact-forward path of :func:`hashgrid_encode_stochastic`."""
    out, _ = _encode_with_xjac(params, x, cfg)
    return out


def _hg_x_fwd(params, x, cfg):
    out, jac = _encode_with_xjac(params, x, cfg)
    return out, (jac, params)


def _hg_x_bwd(cfg, res, g):
    jac, params = res  # jac: (P, 3·L·F) dim-major
    k = cfg.out_dim
    dx = jnp.stack(
        [(g * jac[:, d * k : (d + 1) * k]).sum(axis=1) for d in range(3)],
        axis=-1,
    )
    dt = jax.tree_util.tree_map(jnp.zeros_like, params)  # tables: constants
    return dt, dx


hashgrid_encode_x_grads.defvjp(_hg_x_fwd, _hg_x_bwd)


def hashgrid_encode(params: HashGridParams, x: jax.Array, cfg: HashGridConfig) -> jax.Array:
    """Encode points x ∈ [0,1]^(...,3) → (..., L*F) features.

    TPU shape: all L levels × 8 corners are folded into ONE (P, 8L) index
    array per feature; each feature gathers from its own 1-D (L·T,) table so
    every materialized tensor is lane-aligned (see :func:`_feature_tables`).
    Output is feature-major [f·L + l] — the SAME order as
    :func:`_encode_with_xjac` (load-bearing: the stochastic-gradient path
    routes this function's table cotangents through positions produced by
    the other)."""
    shp = x.shape[:-1]
    x = x.reshape(-1, 3)
    x = jnp.clip(x, 0.0, 1.0)
    p = x.shape[0]
    L = cfg.n_levels
    idx, wgt, _ = _corner_weight_arrays(x, cfg, with_jac=False)
    outs = [
        (flat_f[idx] * wgt).reshape(p, L, 8).sum(axis=2)
        for flat_f in _feature_tables(params, cfg)
    ]
    return jnp.concatenate(outs, axis=1).reshape(*shp, cfg.out_dim)


def hashgrid_encode_stochastic(
    params: HashGridParams,
    x: jax.Array,
    cfg: HashGridConfig,
    key: jax.Array,
    frac: float,
) -> jax.Array:
    """:func:`hashgrid_encode` with an EXACT forward but UNBIASED stochastic
    table gradients from a random point subset.

    Motivation (measured, v5e): the backward of the fused (P, 8L) gather is
    a scatter-add at ~80 ns/row into the 4 MB-per-level tables — ≈2 s for
    512² inputs, dominating the whole training step.  Sampling ``frac`` of
    the points (with replacement, scaled 1/frac) gives an unbiased gradient
    estimator whose variance is far below the Monte-Carlo shading noise
    already present — and the reference itself rescales these gradients by
    1/8 (``train_gshelltet_deepfashion.py:432-437``), so exact magnitudes
    were never load-bearing.  Gradients w.r.t. ``x`` (geometry) stay exact:
    their backward is elementwise, no scatter.
    """
    shp = x.shape[:-1]
    xf = x.reshape(-1, 3)
    p = xf.shape[0]
    # exact-forward path carrying ONLY x-gradients, via the custom-VJP
    # encode whose backward contracts a forward-saved position-Jacobian
    # instead of re-gathering the tables
    full = hashgrid_encode_x_grads(params, xf, cfg)
    n_sub = max(int(p * frac), 1)
    sel = jax.random.randint(key, (n_sub,), 0, p)
    sub = hashgrid_encode(params, jax.lax.stop_gradient(xf[sel]), cfg)
    # exactly zero in value; routes table cotangents through the subset
    delta = (sub - jax.lax.stop_gradient(sub)) * (p / n_sub)
    return full.at[sel].add(delta).reshape(*shp, cfg.out_dim)
