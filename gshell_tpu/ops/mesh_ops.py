"""Mesh attribute ops: normals, tangents, edges, surface sampling.

TPU-native twins of:
  * ``geometry/gshell_tets.py:9-78`` (auto_normals / compute_tangents on the
    extraction hot path),
  * ``render/mesh.py:177-286`` (auto_normals / compute_tangents on Mesh),
  * kaolin ``ops.mesh.sample_points`` (used at
    ``geometry/gshell_tets_geometry.py:236`` for Eikonal sampling).

Scatter-adds become ``jax.ops.segment_sum`` so XLA lowers them to efficient
TPU sorted-segment reductions.  All functions tolerate *padded* face lists:
faces with all-identical vertex indices (degenerate sentinels) contribute a
zero normal / zero area and are therefore harmless.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from gshell_tpu.ops.compact import nonzero_compact

from .math import dot, safe_normalize


def face_normals(v_pos: jax.Array, t_pos_idx: jax.Array, normalize: bool = True) -> jax.Array:
    """Per-face normals; zero for degenerate (padded) faces."""
    v0 = v_pos[t_pos_idx[:, 0]]
    v1 = v_pos[t_pos_idx[:, 1]]
    v2 = v_pos[t_pos_idx[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    return safe_normalize(n) if normalize else n


def auto_normals(v_pos: jax.Array, t_pos_idx: jax.Array, face_mask: jax.Array | None = None) -> jax.Array:
    """Area-weighted smooth vertex normals (reference ``gshell_tets.py:9-34``).

    ``face_mask``: optional (F,) bool marking real (non-padding) faces.
    """
    fn = face_normals(v_pos, t_pos_idx, normalize=False)
    if face_mask is not None:
        fn = fn * face_mask[:, None].astype(fn.dtype)
    num_v = v_pos.shape[0]
    v_nrm = jnp.zeros_like(v_pos)
    for k in range(3):
        v_nrm = v_nrm + jax.ops.segment_sum(fn, t_pos_idx[:, k], num_segments=num_v)
    default = jnp.asarray([0.0, 0.0, 1.0], dtype=v_pos.dtype)
    v_nrm = jnp.where(dot(v_nrm, v_nrm) > 1e-20, v_nrm, default)
    return safe_normalize(v_nrm)


def compute_tangents(
    v_pos: jax.Array,
    v_tex: jax.Array,
    v_nrm: jax.Array,
    t_pos_idx: jax.Array,
    t_tex_idx: jax.Array,
    face_mask: jax.Array | None = None,
) -> jax.Array:
    """Per-vertex tangents, mikktspace conventions (reference
    ``gshell_tets.py:40-78`` / ``render/mesh.py:244-286``)."""
    pos = [v_pos[t_pos_idx[:, i]] for i in range(3)]
    tex = [v_tex[t_tex_idx[:, i]] for i in range(3)]

    uve1 = tex[1] - tex[0]
    uve2 = tex[2] - tex[0]
    pe1 = pos[1] - pos[0]
    pe2 = pos[2] - pos[0]

    nom = pe1 * uve2[..., 1:2] - pe2 * uve1[..., 1:2]
    denom = uve1[..., 0:1] * uve2[..., 1:2] - uve1[..., 1:2] * uve2[..., 0:1]
    # Avoid division by zero for degenerate texture coordinates
    tang = nom / jnp.where(
        denom > 0.0, jnp.clip(denom, min=1e-6), jnp.clip(denom, max=-1e-6)
    )
    if face_mask is not None:
        tang = tang * face_mask[:, None].astype(tang.dtype)

    num_v = v_pos.shape[0]
    tangents = jnp.zeros_like(v_nrm)
    tansum = jnp.zeros_like(v_nrm)
    ones = jnp.ones_like(tang)
    if face_mask is not None:
        ones = ones * face_mask[:, None].astype(ones.dtype)
    for i in range(3):
        idx = t_pos_idx[:, i]
        tangents = tangents + jax.ops.segment_sum(tang, idx, num_segments=num_v)
        tansum = tansum + jax.ops.segment_sum(ones, idx, num_segments=num_v)
    tangents = tangents / jnp.maximum(tansum, 1.0)

    tangents = safe_normalize(tangents)
    tangents = safe_normalize(tangents - dot(tangents, v_nrm) * v_nrm)
    return tangents


def compute_edges(t_pos_idx: jax.Array) -> jax.Array:
    """All (unsorted, duplicated) mesh edges (reference ``mesh.py`` compute_edges)."""
    e = jnp.concatenate(
        [t_pos_idx[:, [0, 1]], t_pos_idx[:, [1, 2]], t_pos_idx[:, [2, 0]]], axis=0
    )
    return jnp.sort(e, axis=1)


def face_areas(v_pos: jax.Array, t_pos_idx: jax.Array) -> jax.Array:
    v0 = v_pos[t_pos_idx[:, 0]]
    v1 = v_pos[t_pos_idx[:, 1]]
    v2 = v_pos[t_pos_idx[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    return 0.5 * jnp.sqrt(jnp.clip(jnp.sum(n * n, axis=-1), min=1e-20))


def compact_faces(faces: jax.Array, face_valid: jax.Array, cap: int):
    """Gather valid faces to the front of a ``cap``-slot buffer.

    The slot-addressed extractors emit mostly-padding face buffers (4 slots
    per tet, ~2.2 used on average); rasterization cost scales with *slots*,
    so compacting to a tight static capacity before rendering cuts the
    coverage scan ~4×.  Overflowing faces (beyond ``cap``) are dropped —
    monitor via the returned count."""
    idx = nonzero_compact(face_valid, cap, 0)
    n = face_valid.sum()
    valid_c = jnp.arange(cap) < n
    fc = jnp.where(valid_c[:, None], faces[idx], 0)
    return fc, valid_c, n


def sample_surface(
    key: jax.Array,
    v_pos: jax.Array,
    t_pos_idx: jax.Array,
    n_samples: int,
    face_mask: jax.Array | None = None,
) -> jax.Array:
    """Area-weighted uniform surface sampling — TPU-native replacement for
    kaolin ``ops.mesh.sample_points`` (``gshell_tets_geometry.py:24,236``).

    Degenerate padded faces have zero area and are never selected (as long as
    at least one real face exists)."""
    areas = face_areas(v_pos, t_pos_idx)
    if face_mask is not None:
        areas = areas * face_mask.astype(areas.dtype)
    k_face, k_uv = jax.random.split(key)
    # Gumbel-free categorical via inverse-CDF on sorted cumsum
    cdf = jnp.cumsum(areas)
    total = jnp.maximum(cdf[-1], 1e-12)
    u = jax.random.uniform(k_face, (n_samples,)) * total
    fid = jnp.clip(jnp.searchsorted(cdf, u), 0, t_pos_idx.shape[0] - 1)
    r = jax.random.uniform(k_uv, (n_samples, 2))
    su = jnp.sqrt(r[:, 0:1])
    b0 = 1.0 - su
    b1 = su * (1.0 - r[:, 1:2])
    b2 = su * r[:, 1:2]
    v0 = v_pos[t_pos_idx[fid, 0]]
    v1 = v_pos[t_pos_idx[fid, 1]]
    v2 = v_pos[t_pos_idx[fid, 2]]
    return v0 * b0 + v1 * b1 + v2 * b2
