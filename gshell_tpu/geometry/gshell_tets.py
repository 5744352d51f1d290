"""G-Shell marching tetrahedra with mSDF open-surface cutting (JAX, static shapes).

TPU-native rebuild of the core novel op of the reference,
``geometry/gshell_tets.py:245-443`` (``GShell_Tets.__call__``):

  stage 1 — classic marching tets on SDF signs → watertight template mesh,
            with per-vertex mSDF interpolated onto the template vertices;
  stage 2 — per-face mSDF-sign lookup-table cutting of the template's
            tri/quad patches into open-boundary triangles, appending boundary
            vertices interpolated along template mesh edges.

Differences from the reference that make it a *TPU program* rather than a port:

  * **No per-step ``torch.unique``** — edge identity comes from the static
    analytic incidence of :class:`~gshell_tpu.geometry.tet_grid.TetGrid`.
  * **Fixed-capacity compaction** — valid tets and crossing edges are
    compacted with ``jnp.nonzero(size=...)`` into static-shape buffers with
    validity masks, so the whole extractor jits once and never recompiles.
  * **Slot-addressed outputs** — tet slot ``t`` owns face slots
    ``[2t, 2t+1]`` (template) and ``[4t..4t+3]`` (cut mesh), and boundary
    vertex slots ``[4t..4t+3]``; no data-dependent concatenation.

Gradient semantics match the reference exactly:
  * SDF-interp weights carry gradients to ``sdf`` and positions (ref :277-290).
  * ``msdf_vert_stopvgd`` uses stop-gradiented SDF weights (ref :290).
  * Boundary-vertex positions carry gradients through the mSDF cut
    coefficients (this is what moves the open boundary; ref :368-380), but
    the *output mSDF values* at boundary vertices detach those coefficients
    (ref :382-390).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from gshell_tpu.ops.compact import nonzero_compact
import numpy as np

from ..ops.math import build_orthonormal_basis
from ..ops.mesh_ops import auto_normals
from . import tet_tables as tt
from .tet_grid import EDGE_OFFSETS, TetGrid, _PATHS, default_capacities


def _tet_corner_offsets():
    """(6, 4, 3) lattice offsets of each path-tet's corners (Freudenthal)."""
    out = np.zeros((6, 4, 3), np.int64)
    for p, path in enumerate(_PATHS):
        for s, ax in enumerate(path):
            out[p, s + 1] = out[p, s]
            out[p, s + 1, ax] += 1
    return out


_TET_CORNERS = _tet_corner_offsets()


def _volume_occ4(vol: jax.Array, res: int) -> jax.Array:
    """(T, 4) per-tet corner values via shifted slices of the (R+1)³ volume —
    zero gathers.  Tet order matches ``build_tet_grid`` (cube-major, 6 path
    tets per cube)."""
    per_path = []
    for p in range(6):
        corners = [
            vol[dx : dx + res, dy : dy + res, dz : dz + res].reshape(-1)
            for dx, dy, dz in _TET_CORNERS[p]
        ]
        per_path.append(jnp.stack(corners, axis=-1))  # (R³, 4)
    return jnp.stack(per_path, axis=1).reshape(-1, 4)  # (R³, 6, 4) → (T, 4)


def _volume_edge_vals(vol: jax.Array, res: int):
    """Per unique edge, (value_lo, value_hi) via shifted slices — the
    class-major ravel matches the analytic edge numbering exactly."""
    n = res + 1
    lo_list, hi_list = [], []
    for ox, oy, oz in EDGE_OFFSETS:
        lo = vol[: n - ox, : n - oy, : n - oz].reshape(-1)
        hi = vol[ox:, oy:, oz:].reshape(-1)
        lo_list.append(lo)
        hi_list.append(hi)
    return jnp.concatenate(lo_list), jnp.concatenate(hi_list)


class GShellMesh(NamedTuple):
    """Extraction result. All shapes static; padding marked by masks.

    Vertex buffer layout (rows of ``verts``):
      ``[0 : V)``               template (watertight) vertices, slot per
                                crossing edge;
      ``[V]``                   sentinel zero vertex (degenerate-face target);
      ``[V+1 : V+1+4*T)``       boundary vertices, 4 slots per valid-tet slot.
    """

    verts: jax.Array  # (V + 1 + 4*T, 3)
    faces: jax.Array  # (4*T, 3) int32 — mSDF-cut (open-surface) faces
    face_valid: jax.Array  # (4*T,) bool
    v_nrm: jax.Array  # (V + 1 + 4*T, 3) smooth normals of the cut mesh
    v_tng: jax.Array  # (V + 1 + 4*T, 3)
    msdf: jax.Array  # (V + 1 + 4*T,) stop-vgrad mSDF at every vertex
    msdf_watertight: jax.Array  # (V + 1,)
    msdf_boundary: jax.Array  # (4*T,)
    faces_wt: jax.Array  # (2*T, 3) int32 — watertight template faces
    face_wt_valid: jax.Array  # (2*T,) bool
    n_verts_watertight: int  # static: V + 1 (boundary rows start after this)
    n_valid_tets: jax.Array  # () int32 — true count (overflow monitoring)
    n_crossing_edges: jax.Array  # () int32
    # () int32 — true active-cube count; compare against the extractor's
    # max_cubes / max_tets / max_verts budgets to detect slot saturation
    n_active_cubes: jax.Array | int = 0
    # (V, 2) SDF values at each crossing-edge slot's endpoints (invalid
    # slots hold (+1, +1): same-sign → excluded from sign-consistency
    # losses).  Gradient-carrying — with ``sdf_fn`` these are the ONLY
    # differentiated SDF evaluations, so the sign-consistency BCE
    # (ref gshell_tets.py:33-39) must read them instead of the lattice.
    edge_sdf: jax.Array | int = 0


def _safe_inv_denominator(d: jax.Array, valid: jax.Array) -> jax.Array:
    """Reference's denominator guard (ref :281-283) with NaN-safe gradients.

    The floor is 1e-8 (not the reference's 1e-12): the backward of 1/d is
    −1/d², and 1e-12 floors let f32 gradients overflow to inf once crossing
    edges have both SDF endpoints ≈ 0 (which sharpening *encourages*).  At
    1e-8 the worst-case weight gradient is ~1e8 — large but finite, and Adam
    normalizes it away.  Geometrically the placements are identical: when
    both endpoints are within 1e-8 of the level set, any point on the edge
    is on the surface."""
    d = jnp.where(valid, d, 1.0)
    mag = jnp.maximum(jnp.abs(d), 1e-8)
    sign = jnp.where(d >= 0, 1.0, -1.0)
    return sign / mag


def map_uv(num_tets: int):
    """Procedural per-tet UV atlas (ref ``gshell_tets.py:210-239`` map_uv):
    each tet owns a small square island; its ≤2 template triangles index the
    island's 4 corners.  Returns (uvs (N²·4, 2), uv_idx (2·num_tets, 3)) for
    the slot-addressed template face layout (face slot s = 2·tet + tri)."""
    import math as _math

    n = int(_math.ceil(_math.sqrt(num_tets)))
    tex = jnp.linspace(0.0, 1.0 - 1.0 / n, n)
    ty, tx = jnp.meshgrid(tex, tex, indexing="ij")
    pad = 0.9 / n
    uvs = jnp.stack(
        [tx, ty, tx + pad, ty, tx + pad, ty + pad, tx, ty + pad], axis=-1
    ).reshape(-1, 2)

    t_ids = jnp.arange(num_tets, dtype=jnp.int32)
    base = t_ids * 4
    tri0 = jnp.stack([base, base + 1, base + 2], -1)
    tri1 = jnp.stack([base, base + 2, base + 3], -1)
    uv_idx = jnp.stack([tri0, tri1], axis=1).reshape(-1, 3)
    return uvs, uv_idx


class GShellTets:
    """Statically-shaped G-Shell marching tets over a :class:`TetGrid`.

    Args:
      grid: static lattice topology.
      max_tets: capacity for valid (surface-crossing) tets.
      max_verts: capacity for crossing edges (= template vertices).
    """

    def __init__(self, grid: TetGrid, max_tets: int | None = None, max_verts: int | None = None):
        if max_tets is None or max_verts is None:
            d_tets, d_verts = default_capacities(grid.res, grid.n_tets, grid.n_edges)
            max_tets = max_tets or d_tets
            max_verts = max_verts or d_verts
        self.grid = grid
        self.max_tets = int(max_tets)
        self.max_verts = int(max_verts)

        n, t, e = grid.n_verts, grid.n_tets, grid.n_edges
        self.n_grid_verts = n
        self.n_grid_tets = t
        self.n_grid_edges = e
        # Active-cube budget: an active cube yields ~4.5 valid tets
        # (measured 9 tets / 2 cubes per res² across test iso-surfaces), so
        # MT/4 cubes saturate the tet budget before the cube budget fills.
        self.max_cubes = max(self.max_tets // 4, 1)
        # Dilated active-vertex budget (crossing-edge lower corners): the
        # dilated vertex set of a shell of MC cubes measures ≈ 2·MC; budget
        # 3·MC for thin/isolated-feature headroom.
        self.max_lat_verts = min(3 * self.max_cubes, grid.n_verts)

        # Analytic incidence constants (the lattice topology is closed-form;
        # no O(T)/O(E) tables — 4 GB at res 256 in the materialized form).
        from .tet_grid import _edge_class_bases

        self._edge_bases = jnp.asarray(_edge_class_bases(grid.res), jnp.int32)
        self._edge_offsets = jnp.asarray(EDGE_OFFSETS, jnp.int32)  # (7, 3)
        self._tet_corners = jnp.asarray(_TET_CORNERS, jnp.int32)  # (6, 4, 3)
        # |Δ| bit-key (4x+2y+z) → edge class
        key_to_cls = np.full(8, -1, np.int64)
        for i, o in enumerate(EDGE_OFFSETS):
            key_to_cls[o[0] * 4 + o[1] * 2 + o[2]] = i
        self._key_to_cls = jnp.asarray(key_to_cls, jnp.int32)

        # Tables.
        self.triangle_table = jnp.asarray(tt.TRIANGLE_TABLE)
        self.mesh_edge_table = jnp.asarray(tt.MESH_EDGE_TABLE)
        self.tri_table = jnp.asarray(tt.TRIANGLE_TABLE_TRI)
        self.quad_table = jnp.asarray(tt.TRIANGLE_TABLE_QUAD)
        self.num_tri_table = jnp.asarray(tt.NUM_TRIANGLES_TABLE)
        self.num_tri_tri = jnp.asarray(tt.NUM_TRIANGLES_TRI_TABLE)
        self.num_tri_quad = jnp.asarray(tt.NUM_TRIANGLES_QUAD_TABLE)

    # Materialized padded topology — only the generative bake/decode tooling
    # reads these (res ≤ 128 grids); built lazily, requires grid topology.
    @property
    def tets_pad(self):
        if not hasattr(self, "_tets_pad"):
            assert self.grid.tets is not None, (
                "grid built with build_topology=False; the generative "
                "bake/decode path needs build_tet_grid(res, build_topology=True)"
            )
            self._tets_pad = jnp.asarray(
                np.concatenate(
                    [self.grid.tets, np.full((1, 4), self.n_grid_verts, np.int32)],
                    axis=0,
                )
            )
        return self._tets_pad

    @property
    def tet_edges_pad(self):
        if not hasattr(self, "_tet_edges_pad"):
            assert self.grid.tet_edges is not None, (
                "grid built with build_topology=False (see tets_pad)"
            )
            self._tet_edges_pad = jnp.asarray(
                np.concatenate(
                    [self.grid.tet_edges, np.full((1, 6), self.n_grid_edges, np.int32)],
                    axis=0,
                )
            )
        return self._tet_edges_pad

    @property
    def edges_pad(self):
        if not hasattr(self, "_edges_pad"):
            assert self.grid.edges is not None, (
                "grid built with build_topology=False (see tets_pad)"
            )
            self._edges_pad = jnp.asarray(
                np.concatenate(
                    [self.grid.edges, np.full((1, 2), self.n_grid_verts, np.int32)],
                    axis=0,
                )
            )
        return self._edges_pad

    # ---- analytic incidence helpers (closed-form lattice topology) -------
    def _edge_endpoints(self, edge_ids: jax.Array):
        """Edge id → (lo_vertex_id, hi_vertex_id); sentinel id E → (N, N)."""
        n = self.grid.res + 1
        E, N = self.n_grid_edges, self.n_grid_verts
        sentinel = edge_ids >= E
        eid = jnp.where(sentinel, 0, edge_ids)
        cls = jnp.searchsorted(self._edge_bases, eid, side="right").astype(jnp.int32) - 1
        o = self._edge_offsets[cls]  # (..., 3)
        local = eid - self._edge_bases[cls]
        dims1 = n - o[..., 1]
        dims2 = n - o[..., 2]
        lo2 = local % dims2
        rest = local // dims2
        lo1 = rest % dims1
        lo0 = rest // dims1
        v_lo = (lo0 * n + lo1) * n + lo2
        v_hi = ((lo0 + o[..., 0]) * n + (lo1 + o[..., 1])) * n + (lo2 + o[..., 2])
        return (
            jnp.where(sentinel, N, v_lo).astype(jnp.int32),
            jnp.where(sentinel, N, v_hi).astype(jnp.int32),
        )

    def _tet_edge_ids(self, corner_xyz: jax.Array, valid: jax.Array):
        """(..., 4, 3) tet corner lattice coords → (..., 6) edge ids
        ([01,02,03,12,13,23] order); invalid rows → sentinel E."""
        n = self.grid.res + 1
        pairs_a = jnp.asarray([0, 0, 0, 1, 1, 2], jnp.int32)
        pairs_b = jnp.asarray([1, 2, 3, 2, 3, 3], jnp.int32)
        pa = corner_xyz[..., pairs_a, :]  # (..., 6, 3)
        pb = corner_xyz[..., pairs_b, :]
        lo = jnp.minimum(pa, pb)
        off = jnp.abs(pb - pa)
        key = off[..., 0] * 4 + off[..., 1] * 2 + off[..., 2]
        cls = self._key_to_cls[key]
        o = self._edge_offsets[cls]
        dims1 = n - o[..., 1]
        dims2 = n - o[..., 2]
        local = (lo[..., 0] * dims1 + lo[..., 1]) * dims2 + lo[..., 2]
        eid = self._edge_bases[cls] + local
        return jnp.where(valid[..., None], eid, self.n_grid_edges).astype(jnp.int32)

    def tet_edge_lo_cls(self, corner_xyz: jax.Array):
        """Tet corner coords (..., 4, 3) → per-edge (lower corner (..., 6, 3),
        class (..., 6)) in the [01,02,03,12,13,23] order."""
        pairs_a = jnp.asarray([0, 0, 0, 1, 1, 2], jnp.int32)
        pairs_b = jnp.asarray([1, 2, 3, 2, 3, 3], jnp.int32)
        te_pa = corner_xyz[..., pairs_a, :]
        te_pb = corner_xyz[..., pairs_b, :]
        te_lo = jnp.minimum(te_pa, te_pb)
        te_off = jnp.abs(te_pb - te_pa)
        te_cls = self._key_to_cls[
            te_off[..., 0] * 4 + te_off[..., 1] * 2 + te_off[..., 2]
        ]
        return te_lo, te_cls

    def edge_ids_from(self, lo_xyz: jax.Array, cls: jax.Array) -> jax.Array:
        """(lower-corner lattice coords, class) → global edge id."""
        n = self.grid.res + 1
        o = self._edge_offsets[cls]
        dims1 = n - o[..., 1]
        dims2 = n - o[..., 2]
        local = (lo_xyz[..., 0] * dims1 + lo_xyz[..., 1]) * dims2 + lo_xyz[..., 2]
        return self._edge_bases[cls] + local

    # ---- shared hierarchical compaction (used by __call__ AND the
    # generative decode, so training and decode slot layouts match exactly)
    def active_cubes(self, occ_vol: jax.Array, msdf_vol: jax.Array | None = None):
        """Cube-level activity + compacted cube coords.

        A cube is active ⟺ its 8 corners mix signs (⟺ ≥1 of its 6 path
        tets crosses: the tets' corner sets cover the cube and share the
        main diagonal).  Pure shifted-slice sums — O(res³) elementwise."""
        res = self.grid.res

        def corner_sum(vol_i):
            return sum(
                vol_i[dx : dx + res, dy : dy + res, dz : dz + res]
                for dx in (0, 1)
                for dy in (0, 1)
                for dz in (0, 1)
            )

        csum = corner_sum(occ_vol.astype(jnp.int32))
        cube_act = (csum > 0) & (csum < 8)
        if msdf_vol is not None:
            cube_act = cube_act & (corner_sum(msdf_vol.astype(jnp.int32)) > 0)
        MC = self.max_cubes
        n_cubes = res**3
        cube_slots = nonzero_compact(cube_act, MC, n_cubes)
        cube_ok = cube_slots < n_cubes
        cs = jnp.where(cube_ok, cube_slots, 0)
        cube_xyz = jnp.stack(
            [cs // (res * res), (cs // res) % res, cs % res], axis=-1
        ).astype(jnp.int32)
        return cube_act, cube_xyz, cube_ok

    def compact_tets(self, occ_flat, cube_xyz, cube_ok, msdf_flat=None):
        """Candidate tets of active cubes → MT compacted tet slots
        (cube-major, path-minor == ascending global tet id).

        Returns (tet_valid (MT,), corner_xyz (MT,4,3), corner_vid (MT,4),
        n_valid)."""
        res = self.grid.res
        n_lat = res + 1
        MC, MT = self.max_cubes, self.max_tets
        # The 6 path tets draw their 24 corner slots from the cube's 8
        # vertices — gather the 8 once per cube (MC·8 rows) and remap to
        # (MC, 6, 4) with a STATIC minor-axis permutation (a lane shuffle,
        # not a second HBM gather; the naive (MC,6,4) corner gather costs
        # 3× the rows and materializes a (MC,6,4,3) coord tensor).
        corner8 = jnp.arange(8, dtype=jnp.int32)
        off8_vid = (
            (corner8 >> 2) * n_lat + ((corner8 >> 1) & 1)
        ) * n_lat + (corner8 & 1)
        base_vid = (
            cube_xyz[:, 0] * n_lat + cube_xyz[:, 1]
        ) * n_lat + cube_xyz[:, 2]
        vid8 = base_vid[:, None] + off8_vid[None, :]  # (MC, 8)
        occ8 = occ_flat[vid8]  # (MC, 8) bool
        import numpy as _np

        tc = _np.asarray(_TET_CORNERS, _np.int32)  # (6, 4, 3) offsets in {0,1}³
        m64 = (tc[..., 0] * 4 + tc[..., 1] * 2 + tc[..., 2]).reshape(-1)  # (24,) static
        cand_occ = occ8[:, m64].reshape(MC, 6, 4)
        cand_sum = cand_occ.sum(axis=-1)
        valid_cand = (cand_sum > 0) & (cand_sum < 4) & cube_ok[:, None]
        if msdf_flat is not None:
            msdf8 = msdf_flat[vid8]
            valid_cand = valid_cand & msdf8[:, m64].reshape(MC, 6, 4).any(axis=-1)
        n_valid = valid_cand.sum().astype(jnp.int32)

        cand_idx = nonzero_compact(valid_cand, MT, 6 * MC)
        tet_valid = cand_idx < 6 * MC
        ci = jnp.where(tet_valid, cand_idx, 0)
        corner_xyz = cube_xyz[ci // 6][:, None, :] + self._tet_corners[ci % 6]
        corner_vid = (
            (corner_xyz[..., 0] * n_lat + corner_xyz[..., 1]) * n_lat
            + corner_xyz[..., 2]
        )
        return tet_valid, corner_xyz, corner_vid, n_valid

    def compact_edges(self, occ_flat, cube_act):
        """Crossing edges of the dilated active-cube vertex set → V template
        vertex slots (active-vertex-major, class-minor order).

        Returns (slot_valid (V,), ev0, ev1 (V,) endpoint vertex ids,
        lo_xyz (V,3), cls (V,), vert_slot_of_edges fn)."""
        res = self.grid.res
        n_lat = res + 1
        N, V = self.n_grid_verts, self.max_verts
        MVL = self.max_lat_verts

        act_pad = jnp.pad(cube_act, ((1, 1), (1, 1), (1, 1)))
        vert_act = jnp.zeros((n_lat, n_lat, n_lat), jnp.bool_)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    vert_act = vert_act | act_pad[
                        dx : dx + n_lat, dy : dy + n_lat, dz : dz + n_lat
                    ]
        lv_slots = nonzero_compact(vert_act, MVL, N)
        lv_ok = lv_slots < N
        lv = jnp.where(lv_ok, lv_slots, 0)
        lv_xyz = jnp.stack(
            [lv // (n_lat * n_lat), (lv // n_lat) % n_lat, lv % n_lat], axis=-1
        ).astype(jnp.int32)
        slot_of_lv = jnp.full((N + 1,), MVL, jnp.int32)
        slot_of_lv = slot_of_lv.at[jnp.where(lv_ok, lv_slots, N + 1)].set(
            jnp.arange(MVL, dtype=jnp.int32), mode="drop"
        )

        # Crossing test, volumetric: one shifted-slice XOR per edge class,
        # bit-packed into a uint8 per lattice vertex (out-of-range bits stay
        # 0 via the zero pad), then ONE byte gather at the MVL compacted
        # vertices.  Replaces the previous 8·MVL occupancy gather rows
        # (4.7M at res 256) with 0.6M rows + cheap elementwise volume passes.
        occ_vol_ = occ_flat.reshape(n_lat, n_lat, n_lat)
        cross_bits = jnp.zeros((n_lat, n_lat, n_lat), jnp.uint8)
        for c, (ox, oy, oz) in enumerate(EDGE_OFFSETS):
            x = (
                occ_vol_[: n_lat - ox, : n_lat - oy, : n_lat - oz]
                ^ occ_vol_[ox:, oy:, oz:]
            )
            cross_bits = cross_bits + (
                jnp.pad(x, ((0, ox), (0, oy), (0, oz))).astype(jnp.uint8)
                << jnp.uint8(c)
            )
        cb = cross_bits.reshape(-1)[lv]  # (MVL,) uint8
        e_cross = (
            (cb[:, None] >> jnp.arange(7, dtype=jnp.uint8)[None, :]) & 1
        ).astype(jnp.bool_) & lv_ok[:, None]
        ce_idx = nonzero_compact(e_cross, V, 7 * MVL)
        slot_valid = ce_idx < 7 * MVL
        cei = jnp.where(slot_valid, ce_idx, 0)
        li = cei // 7
        cls = (cei % 7).astype(jnp.int32)
        lo_xyz = lv_xyz[li]
        # endpoint vertex ids recomputed analytically on the V slots only
        # (the dense (MVL, 7) hi_vid buffer is never materialized)
        hi_xyz_s = lo_xyz + self._edge_offsets[cls]
        ev0 = jnp.where(slot_valid, lv[li], N)
        ev1 = jnp.where(
            slot_valid,
            (hi_xyz_s[..., 0] * n_lat + hi_xyz_s[..., 1]) * n_lat
            + hi_xyz_s[..., 2],
            N,
        )

        vert_of_cand = jnp.full((7 * MVL + 1,), V, jnp.int32)
        vert_of_cand = vert_of_cand.at[
            jnp.where(slot_valid, ce_idx, 7 * MVL + 1)
        ].set(jnp.arange(V, dtype=jnp.int32), mode="drop")

        def vert_slot_of_edges(e_lo_xyz, e_cls, valid):
            vid = (
                e_lo_xyz[..., 0] * n_lat + e_lo_xyz[..., 1]
            ) * n_lat + e_lo_xyz[..., 2]
            lvs = slot_of_lv[jnp.where(valid, vid, N)]
            cand = jnp.where(lvs < MVL, lvs * 7 + e_cls, 7 * MVL)
            return vert_of_cand[cand]

        return slot_valid, ev0, ev1, lo_xyz, cls, vert_slot_of_edges

    # ------------------------------------------------------------------
    def __call__(
        self,
        pos: jax.Array,
        sdf: jax.Array,
        msdf: jax.Array,
        watertight_template: bool = True,
        compute_aug_normals: bool = True,
        compute_tangents: bool = True,
        shard_mesh=None,
        sdf_fn=None,
        msdf_fn=None,
    ) -> GShellMesh:
        """Extract the open-surface mesh.  Fully jittable.

        Args:
          pos:  (N, 3) deformed lattice vertex positions.
          sdf:  (N,) signed distance values at lattice vertices.
          msdf: (N,) manifold-SDF values at lattice vertices.
          watertight_template: if False, pre-filter tets whose mSDF is all
            non-positive (ref :255-263).
          compute_tangents: tangent frames (and the template normals that
            seed them) cost a segment-sum over 2·MT faces plus (MT, 4)-row
            gathers; the training path re-randomizes tangents per pixel
            (ref render.py:264-267, use_uv=False) and never reads them, so
            tick() passes False and ``v_tng`` comes back zero.
          sdf_fn / msdf_fn: optional lazy-gradient field evaluators,
            ``(rows, 3) points → (rows,) values``.  When given, the dense
            ``sdf``/``msdf`` arrays are used ONLY for occupancy/signs
            (callers should pass them stop-gradiented) and the
            gradient-carrying values are re-evaluated at the ~2·V
            crossing-edge endpoints — for an SDF MLP on a res-256 lattice
            this cuts the differentiated field eval from (res+1)³ ≈ 17M
            rows to ~2·V ≈ 1.6M rows (occupancy stays a cheap fwd-only
            pass).  Occupancy decisions and interpolated values remain
            consistent because both come from the same network; slots whose
            re-evaluated endpoints happen to agree in sign fall back to the
            guarded denominator (same as the reference's 1e-8 guard).
          shard_mesh: optional ``jax.sharding.Mesh``. The per-SLOT stages
            (template-vertex interpolation over V crossing-edge slots, the
            mSDF cut + face emission over MT tet slots — the extraction
            "tail" that dominates at large grids) are annotated sharded
            over the mesh's flattened device axes via
            ``with_sharding_constraint``; the O(res³) compaction stays
            replicated and the mesh outputs are constrained replicated, so
            GSPMD partitions the slot work across devices and inserts ONE
            all_gather of each output buffer (≈10 MB over ICI at res 256).
        """
        N = self.n_grid_verts
        E = self.n_grid_edges
        T = self.n_grid_tets
        V, MT = self.max_verts, self.max_tets

        # Sentinel-padded fields. sdf sentinel = +1 (occupied), msdf = -1.
        pos_p = jnp.concatenate([pos, jnp.zeros((1, 3), pos.dtype)], axis=0)
        sdf_p = jnp.concatenate([sdf, jnp.ones((1,), sdf.dtype)], axis=0)
        msdf_p = jnp.concatenate([msdf, -jnp.ones((1,), msdf.dtype)], axis=0)
        occ_p = sdf_p > 0

        # ---- valid tets (ref :249-263) --------------------------------
        # Two-stage active-region compaction, all O(res³) work at CUBE
        # granularity (8× fewer elements than tets):
        #   1. cube is active ⟺ its 8 corners mix signs (⟺ ≥1 of its 6
        #      tets crosses — corner sets of the 6 path tets cover the cube
        #      and share the main diagonal) — pure shifted-slice sums;
        #   2. exact per-tet test only on the ≤ MC·6 candidate tets of
        #      compacted active cubes, via corner gathers with analytic
        #      lattice indexing (no materialized (T,4)/(T,6) tables —
        #      those are 4 GB at res 256).
        res = self.grid.res
        n_lat = res + 1
        occ_vol = (sdf > 0).reshape(n_lat, n_lat, n_lat)
        occ_flat = occ_vol.reshape(-1)
        msdf_vol = (
            None if watertight_template else (msdf > 0).reshape(n_lat, n_lat, n_lat)
        )
        cube_act, cube_xyz, cube_ok = self.active_cubes(occ_vol, msdf_vol)
        tet_valid, corner_xyz, corner_vid, n_valid = self.compact_tets(
            occ_flat, cube_xyz, cube_ok,
            None if msdf_vol is None else msdf_vol.reshape(-1),
        )

        if shard_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as _P

            _ax = tuple(shard_mesh.axis_names)

            def _rows(t):
                spec = _P(_ax, *([None] * (t.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    t, NamedSharding(shard_mesh, spec)
                )

            _rep_sh = NamedSharding(shard_mesh, _P())
        else:
            _rows = lambda t: t
            _rep_sh = None
        tet_valid = _rows(tet_valid)
        corner_xyz = _rows(corner_xyz)
        corner_vid = _rows(corner_vid)

        # ---- crossing edges → template vertices (ref :266-290) --------
        # Crossing edges are compacted hierarchically too: a crossing edge's
        # lower corner is adjacent to an active cube, so compact the DILATED
        # active-cube vertex set (O(n³) work) and enumerate its ≤7 edge
        # classes — never an O(E)=O(7n³) cumsum or an (E,)-sized slot map.
        e_lo, e_hi = _volume_edge_vals(occ_vol, res)
        n_cross = (e_lo != e_hi).sum().astype(jnp.int32)  # exact (cheap reduce)

        slot_valid, ev0, ev1, _, _, vert_slot_of_edges = self.compact_edges(
            occ_flat, cube_act
        )
        slot_valid = _rows(slot_valid)
        ev0, ev1 = _rows(ev0), _rows(ev1)

        pa, pb = pos_p[ev0], pos_p[ev1]
        if sdf_fn is not None:
            sab = sdf_fn(jnp.concatenate([pa, pb], axis=0))
            sa = jnp.where(slot_valid, sab[:V], 1.0)  # sentinel = +1 (occupied)
            sb = jnp.where(slot_valid, sab[V:], 1.0)
        else:
            sa, sb = sdf_p[ev0], sdf_p[ev1]
        denom_inv = _safe_inv_denominator(sa - sb, slot_valid)
        wa = -sb * denom_inv
        wb = sa * denom_inv
        verts = pa * wa[:, None] + pb * wb[:, None]
        verts = jnp.where(slot_valid[:, None], verts, 0.0)

        if msdf_fn is not None:
            mab = msdf_fn(jnp.concatenate([pa, pb], axis=0))
            ma = jnp.where(slot_valid, mab[:V], -1.0)  # sentinel = -1
            mb = jnp.where(slot_valid, mab[V:], -1.0)
        else:
            ma, mb = msdf_p[ev0], msdf_p[ev1]
        msdf_vert = ma * wa + mb * wb
        wa_sg, wb_sg = jax.lax.stop_gradient(wa), jax.lax.stop_gradient(wb)
        msdf_vert_sg = ma * wa_sg + mb * wb_sg  # stop-vgrad twin (ref :290)
        msdf_vert = jnp.where(slot_valid, msdf_vert, 0.0)
        msdf_vert_sg = jnp.where(slot_valid, msdf_vert_sg, 0.0)

        # Template vertex buffer with sentinel zero row at index V.
        verts_buf = jnp.concatenate([verts, jnp.zeros((1, 3), verts.dtype)], axis=0)
        msdf_buf = jnp.concatenate([msdf_vert, jnp.zeros((1,), msdf_vert.dtype)])
        msdf_sg_buf = jnp.concatenate([msdf_vert_sg, jnp.zeros((1,), msdf_vert_sg.dtype)])

        # ---- per-tet template faces (ref :294-316) ---------------------
        g_occ4 = occ_flat[corner_vid].astype(jnp.int32)  # (MT, 4)
        tetindex = (g_occ4 * jnp.asarray([1, 2, 4, 8], jnp.int32)).sum(axis=-1)
        tetindex = jnp.where(tet_valid, tetindex, 15)  # sentinel → 0 triangles
        num_tri = self.num_tri_table[tetindex]  # (MT,) ∈ {0,1,2}

        # tet edge (lower corner, class) → template vertex slot
        te_lo, te_cls = self.tet_edge_lo_cls(corner_xyz)
        idx6 = vert_slot_of_edges(te_lo, te_cls, tet_valid[:, None])  # (MT, 6)

        trow = self.triangle_table[tetindex]  # (MT, 6)
        trow_c = jnp.clip(trow, 0, 5)
        f01 = jnp.take_along_axis(idx6, trow_c, axis=1)  # (MT, 6)
        face0 = jnp.where((num_tri >= 1)[:, None], f01[:, :3], V)
        face1 = jnp.where((num_tri == 2)[:, None], f01[:, 3:6], V)
        faces_wt = jnp.stack([face0, face1], axis=1).reshape(-1, 3)  # (2*MT, 3)
        face_wt_valid = jnp.stack([num_tri >= 1, num_tri == 2], axis=1).reshape(-1)

        if compute_tangents:
            # Template normals (needed for tangent frame; ref :318-319).
            v_nrm_t = auto_normals(verts_buf, faces_wt, face_wt_valid)
            # Tangents: ONB of the smooth normal. (The reference derives
            # tangents from a synthetic per-tet UV atlas, but the training
            # path uses use_uv=False where tangents are re-randomized per
            # pixel — render/render.py:264-267 — so an ONB tangent is
            # equivalent.)
            v_tng_t, _ = build_orthonormal_basis(v_nrm_t)
        else:
            v_tng_t = jnp.zeros_like(verts_buf)

        # ---- mSDF cutting (ref :321-416) --------------------------------
        me = jnp.clip(self.mesh_edge_table[tetindex], 0, 5)  # (MT, 6)
        corners = jnp.take_along_axis(idx6, me[:, :4], axis=1)  # (MT, 4) ∈ [0, V]
        # For tri patches mesh_edge_table rows are closed cycles
        # [c0, c1, c2, c0, ...] so corners[:, 3] == corners[:, 0].

        # One fused row gather for every per-corner attribute (pos ×3,
        # [tangent ×3,] msdf, msdf_sg): the corner row fetch dominates the
        # cut stage, and fetching an 8-wide row once beats three separate
        # 3/3/1-wide gathers of the same rows.
        attr_cols = (
            [verts_buf, v_tng_t] if compute_tangents else [verts_buf]
        ) + [msdf_buf[:, None], msdf_sg_buf[:, None]]
        attr_buf = jnp.concatenate(attr_cols, axis=1)  # (V+1, 8 or 5)
        cattr = attr_buf[corners]  # (MT, 4, C)
        c_msdf = cattr[..., -2]  # (MT, 4) — gradient-carrying mSDF
        c_msdf_sg = cattr[..., -1]
        mocc = (c_msdf > 0).astype(jnp.int32)

        is_quad = num_tri == 2
        # Flipped bit weights (ref :396-399, 609).
        idx_tri = mocc[:, 0] * 4 + mocc[:, 1] * 2 + mocc[:, 2]
        idx_quad = mocc[:, 0] * 8 + mocc[:, 1] * 4 + mocc[:, 2] * 2 + mocc[:, 3]

        # Boundary vertices on the 4 cycle edges (c_j, c_{j+1 mod 4}).
        # Attributes of corner j+1 are a static axis-1 permutation of the
        # already-gathered corner-j rows — no second gather.
        nxt = jnp.roll(jnp.arange(4), -1)
        mu, mw = c_msdf, c_msdf[:, nxt]
        mu_sg, mw_sg = c_msdf_sg, c_msdf_sg[:, nxt]

        sign_ok = jnp.abs(jnp.sign(mu) + jnp.sign(mw)) != 2  # opposite/zero signs
        denom = mu - mw
        # 1e-8 floor (vs ref 1e-12) — see _safe_inv_denominator: the backward
        # of the cut coefficients is O(1/denom²) and must stay finite in f32.
        cut_ok = sign_ok & (jnp.abs(denom) > 1e-8) & tet_valid[:, None]
        denom_safe = jnp.where(cut_ok, denom, 1.0)
        bu = jnp.where(cut_ok, -mw / denom_safe, 0.0)  # weight of corner j
        bw = jnp.where(cut_ok, mu / denom_safe, 0.0)  # weight of corner j+1

        vu = cattr[..., 0:3]  # (MT, 4, 3)
        vw = vu[:, nxt]
        b_verts = vu * bu[..., None] + vw * bw[..., None]
        if compute_tangents:
            tu = cattr[..., 3:6]
            tw = tu[:, nxt]
            b_tng = tu * bu[..., None] + tw * bw[..., None]
        else:
            b_tng = jnp.zeros_like(b_verts)
        bu_sg, bw_sg = jax.lax.stop_gradient(bu), jax.lax.stop_gradient(bw)
        b_msdf = mu_sg * bu_sg + mw_sg * bw_sg  # detached coefs (ref :383)

        # Global ids of boundary slots.
        t_ids = jnp.arange(MT, dtype=jnp.int32)
        b_gid = (V + 1) + t_ids[:, None] * 4 + jnp.arange(4, dtype=jnp.int32)[None, :]

        # Cut-face emission: tri patches fill face slots 0..1, quads 0..3.
        idx_tri_map = jnp.concatenate([corners[:, :3], b_gid[:, :3]], axis=1)  # (MT, 6)
        idx_quad_map = jnp.concatenate([corners, b_gid], axis=1)  # (MT, 8)

        tri_row = jnp.clip(self.tri_table[idx_tri], 0, 5)  # (MT, 6)
        quad_row = jnp.clip(self.quad_table[idx_quad], 0, 7)  # (MT, 12)
        tri_faces = jnp.take_along_axis(idx_tri_map, tri_row, axis=1).reshape(-1, 2, 3)
        quad_faces = jnp.take_along_axis(idx_quad_map, quad_row, axis=1).reshape(-1, 4, 3)

        n_cut_tri = self.num_tri_tri[idx_tri]  # (MT,)
        n_cut_quad = self.num_tri_quad[idx_quad]
        farange = jnp.arange(4, dtype=jnp.int32)[None, :]
        tri_fvalid = (farange < n_cut_tri[:, None]) & (farange < 2)
        quad_fvalid = farange < n_cut_quad[:, None]

        tri_faces4 = jnp.concatenate(
            [tri_faces, jnp.full((MT, 2, 3), V + 1 + 4 * MT, jnp.int32)], axis=1
        )
        use_quad = is_quad[:, None, None]
        faces_aug = jnp.where(use_quad, quad_faces, tri_faces4)
        face_valid = jnp.where(is_quad[:, None], quad_fvalid, tri_fvalid)
        face_valid = face_valid & tet_valid[:, None] & (num_tri > 0)[:, None]

        # Route invalid faces to the sentinel zero vertex (degenerate).
        faces_aug = jnp.where(face_valid[..., None], faces_aug, V)
        faces_aug = faces_aug.reshape(-1, 3)
        face_valid = face_valid.reshape(-1)

        # ---- assemble augmented buffers ---------------------------------
        b_mask = tet_valid[:, None] & cut_ok
        b_verts = jnp.where(b_mask[..., None], b_verts, 0.0).reshape(-1, 3)
        b_tng = jnp.where(b_mask[..., None], b_tng, 0.0).reshape(-1, 3)
        b_msdf = jnp.where(b_mask, b_msdf, 0.0).reshape(-1)

        verts_aug = jnp.concatenate([verts_buf, b_verts], axis=0)
        v_tng_aug = jnp.concatenate([v_tng_t, b_tng], axis=0)
        msdf_aug = jnp.concatenate([msdf_sg_buf, b_msdf], axis=0)

        # Optional: callers that compact the face buffer first (train tick)
        # compute normals over the compacted faces instead — segment-summing
        # the 4·MT mostly-padding slots is the extractor's largest cost.
        if compute_aug_normals:
            v_nrm_aug = auto_normals(verts_aug, faces_aug, face_valid)
        else:
            v_nrm_aug = jnp.zeros_like(verts_aug)

        if _rep_sh is not None:
            # one all_gather per output buffer; downstream (raster, banded
            # render consts) consumes them replicated
            _rep = lambda t: jax.lax.with_sharding_constraint(t, _rep_sh)
            verts_aug, faces_aug, face_valid = map(
                _rep, (verts_aug, faces_aug, face_valid)
            )
            v_nrm_aug, v_tng_aug, msdf_aug = map(
                _rep, (v_nrm_aug, v_tng_aug, msdf_aug)
            )

        return GShellMesh(
            verts=verts_aug,
            faces=faces_aug,
            face_valid=face_valid,
            v_nrm=v_nrm_aug,
            v_tng=v_tng_aug,
            msdf=msdf_aug,
            msdf_watertight=msdf_sg_buf,
            msdf_boundary=b_msdf,
            faces_wt=faces_wt,
            face_wt_valid=face_wt_valid,
            n_verts_watertight=V + 1,
            n_valid_tets=n_valid,
            n_crossing_edges=n_cross,
            n_active_cubes=cube_act.sum().astype(jnp.int32),
            edge_sdf=jnp.stack([sa, sb], axis=-1),
        )
