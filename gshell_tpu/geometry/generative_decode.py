"""G-Shell ↔ dense cubic grid conversion for the generative pipeline.

Twin of the reference grid-baking tool
``GMeshDiffusion/metadata/tet_to_cubic_grid_dataset.py:7-246`` and the
no-grad decode path ``geometry/gshell_tets.py:446-629``
(``marching_from_auggrid``):

  bake:   fitted G-Shell fields on the res-R tet lattice →
            feature grid (D, D, D, 4), D = 2R: [sdf_sign | 3-ch deform] at
              vertex sites (even coords) — ref :92-150;
            plus SDF-interp coefficients and mSDF signs at edge-midpoint
              sites (odd-sum coords) folded into the same index space;
            occ grid (2D)³: mSDF boundary-cut coefficients at
              inscribed-edge midpoints with canonical endpoint ordering
              (ref :179-226);
            masks marking valid sites (ref :51-60, 221-225).

  decode: the same marching as :class:`GShellTets` but with interpolation
          coefficients and signs read from the baked grids, reproducing
          training-time topology exactly from quantized data.

Because our tet lattice is analytic (``tet_grid.py``), every site address is
a closed-form integer map — vertex (i,j,k) → 2·(i,j,k); edge midpoint →
sum of endpoint coords; inscribed-edge midpoint → sum of the two edge
midpoints — so bake and decode are pure gathers/scatters, fully jittable.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .gshell_tets import GShellMesh, GShellTets
from .tet_grid import TetGrid


class BakedGrids(NamedTuple):
    """Dense cubic training grids, matching the reference's shapes: the
    feature grid side is exactly 2R (128 for tet res 64,
    ``tet_to_cubic_grid_dataset.py:92-243``) and the occ grid 4R (256³) —
    the outermost site plane (coordinate 2R / 4R) is cropped; centered
    shapes never touch it, and :meth:`GenerativeCodec.decode` zero-pads it
    back (sign 0 ≡ outside)."""

    grid: jax.Array  # (2R, 2R, 2R, 4) sdf-sign/coeff + deform/msdf channels
    occgrid: jax.Array  # (4R,)³ boundary-cut coefficients in [-1, 1]
    feature_mask: jax.Array  # (2R, 2R, 2R, 4) valid-site mask
    occ_mask: jax.Array  # occgrid valid-site mask


def _vertex_coords(grid: TetGrid) -> np.ndarray:
    r = grid.res
    n = r + 1
    ids = np.arange(n**3, dtype=np.int64)
    return np.stack([ids // (n * n) * 2, (ids // n) % n * 2, (ids % n) * 2], -1)


class GenerativeCodec:
    """Static site-address tables + bake/decode ops for one lattice."""

    def __init__(self, extractor: GShellTets):
        self.ex = extractor
        grid = extractor.grid
        self.grid = grid
        r = grid.res
        self.d1 = 2 * r + 1  # feature-grid side (vertex/midpoint sites)
        self.d2 = 4 * r + 1  # occ-grid side (inscribed-edge midpoint sites)

        vc = _vertex_coords(grid)  # (N, 3) in [0, 2R]
        self.vert_coords = jnp.asarray(vc.astype(np.int32))
        ec = (vc[grid.edges[:, 0]] + vc[grid.edges[:, 1]]) // 2  # (E, 3)
        self.edge_mid_coords = jnp.asarray(ec.astype(np.int32))

    # ------------------------------------------------------------------
    def bake(self, pos: jax.Array, sdf: jax.Array, msdf: jax.Array,
             deform: jax.Array) -> BakedGrids:
        """Quantize a fitted shape into dense grids (ref :92-243)."""
        ex, grid = self.ex, self.grid
        d1, d2 = self.d1, self.d2
        vc = self.vert_coords

        # vertex sites: sdf sign + deform
        feat = jnp.zeros((d1, d1, d1, 4))
        fmask = jnp.zeros((d1, d1, d1, 4))
        sgn = jnp.sign(sdf)
        feat = feat.at[vc[:, 0], vc[:, 1], vc[:, 2], 0].set(sgn)
        feat = feat.at[vc[:, 0], vc[:, 1], vc[:, 2], 1:4].set(deform)
        fmask = fmask.at[vc[:, 0], vc[:, 1], vc[:, 2], :].set(1.0)

        # edge-midpoint sites: SDF interp coefficient + mSDF value sign
        e = ex.edges_pad[:-1]
        sa, sb = sdf[e[:, 0]], sdf[e[:, 1]]
        crossing = (sa > 0) != (sb > 0)
        denom = sa - sb
        denom = jnp.where(jnp.abs(denom) > 1e-8, denom, 1.0)
        # vertex = (1-c)·pos_a + c·pos_b with c = sa / (sa - sb)
        coeff = jnp.clip(jnp.where(crossing, sa / denom, 0.5), 0.0, 1.0)
        ma, mb = msdf[e[:, 0]], msdf[e[:, 1]]
        m_mid = ma * (1.0 - coeff) + mb * coeff
        mc = self.edge_mid_coords
        feat = feat.at[mc[:, 0], mc[:, 1], mc[:, 2], 0].set(
            jnp.where(crossing, coeff * 2.0 - 1.0, 0.0)
        )
        feat = feat.at[mc[:, 0], mc[:, 1], mc[:, 2], 1].set(
            jnp.where(crossing, jnp.sign(m_mid), 0.0)
        )
        fmask = fmask.at[mc[:, 0], mc[:, 1], mc[:, 2], 0:2].set(
            crossing[:, None].astype(jnp.float32)
        )

        # occ sites: boundary coefficients on inscribed edges.  Recompute the
        # cut coefficients exactly as the extractor does, then scatter at the
        # inscribed-edge midpoint with canonical endpoint order (ref :179-226).
        occ, omask = self._bake_occ(pos, sdf, msdf)
        # crop the outermost site plane → even, reference-shaped grids
        c1, c2 = self.d1 - 1, self.d2 - 1
        return BakedGrids(
            grid=feat[:c1, :c1, :c1],
            occgrid=occ[:c2, :c2, :c2],
            feature_mask=fmask[:c1, :c1, :c1],
            occ_mask=omask[:c2, :c2, :c2],
        )

    def _bake_occ(self, pos, sdf, msdf):
        ex = self.ex
        d2 = self.d2
        mesh = ex(pos, sdf, msdf, watertight_template=True)
        # Recompute cycle pairs like the extractor: use its internals by
        # re-deriving corners from the valid tets.
        # For bake we only need: for each boundary vertex slot (t, j): the
        # template-vertex pair (u, w), the cut weight of u, and validity.
        # These are reproducible from the mesh's buffers:
        pairs, w_u, valid = _cycle_cut_info(ex, pos, sdf, msdf)
        # midpoint coords of template vertices (= their source edges)
        edge_of_slot = self._edge_of_vert_slot(sdf)
        mu = self.edge_mid_coords[edge_of_slot]  # (V, 3) clipped below
        cu = mu[jnp.clip(pairs[..., 0], 0, mu.shape[0] - 1)]
        cw = mu[jnp.clip(pairs[..., 1], 0, mu.shape[0] - 1)]
        site = cu + cw  # ∈ [0, 4R]
        key = (jnp.sign(cu - cw) * jnp.asarray([16, 4, 1])).sum(-1)
        # canonical: first endpoint = larger key
        w_first = jnp.where(key > 0, w_u, 1.0 - w_u)
        val = jnp.where(valid, (w_first - 0.5) * 2.0, 0.0)
        occ = jnp.zeros((d2, d2, d2))
        omask = jnp.zeros((d2, d2, d2))
        site = jnp.clip(site, 0, d2 - 1)
        occ = occ.at[site[..., 0], site[..., 1], site[..., 2]].set(val)
        omask = omask.at[site[..., 0], site[..., 1], site[..., 2]].set(
            valid.astype(jnp.float32)
        )
        return occ, omask

    def _edge_of_vert_slot(self, sdf):
        """Template-vertex slot → source grid edge id (same hierarchical
        compaction order as the extractor — see GShellTets.compact_edges)."""
        ex = self.ex
        r1 = ex.grid.res + 1
        occ_vol = (sdf > 0).reshape(r1, r1, r1)
        cube_act, _, _ = ex.active_cubes(occ_vol)
        _, _, _, lo_xyz, cls, _ = ex.compact_edges(occ_vol.reshape(-1), cube_act)
        return jnp.clip(ex.edge_ids_from(lo_xyz, cls), 0, ex.n_grid_edges - 1)

    # ------------------------------------------------------------------
    def decode(self, pos: jax.Array, baked: BakedGrids) -> GShellMesh:
        """Decode grids → open mesh (ref ``marching_from_auggrid`` :446-629).

        ``pos``: lattice positions (typically verts + max_disp·deform read
        from the baked grid's deform channels)."""
        ex = self.ex
        # zero-pad the cropped outermost plane back (sign 0 ≡ outside)
        grid = jnp.pad(baked.grid, ((0, 1), (0, 1), (0, 1), (0, 0)))
        occgrid = jnp.pad(baked.occgrid, ((0, 1), (0, 1), (0, 1)))
        sdf_sign = grid[
            self.vert_coords[:, 0], self.vert_coords[:, 1], self.vert_coords[:, 2], 0
        ]
        mc = self.edge_mid_coords
        coeff = grid[mc[:, 0], mc[:, 1], mc[:, 2], 0] * 0.5 + 0.5
        msdf_mid_sign = grid[mc[:, 0], mc[:, 1], mc[:, 2], 1]
        return _marching_from_grids(
            ex, pos, sdf_sign, coeff, msdf_mid_sign, occgrid, self.edge_mid_coords
        )


# ----------------------------------------------------------------------------
# internals
# ----------------------------------------------------------------------------


def _cycle_cut_info(ex: GShellTets, pos, sdf, msdf):
    """Reproduce the extractor's per-tet cycle pairs + cut weights.

    Returns (pairs (MT,4,2) template-vertex ids, w_u (MT,4), valid (MT,4))."""
    N = ex.n_grid_verts
    sdf_p = jnp.concatenate([sdf, jnp.ones((1,))])
    msdf_p = jnp.concatenate([msdf, -jnp.ones((1,))])

    r1 = ex.grid.res + 1
    occ_vol = (sdf > 0).reshape(r1, r1, r1)
    occ_flat = occ_vol.reshape(-1)
    cube_act, cube_xyz, cube_ok = ex.active_cubes(occ_vol)
    tet_valid, corner_xyz, corner_vid, _ = ex.compact_tets(
        occ_flat, cube_xyz, cube_ok
    )
    slot_valid, ev0, ev1, _, _, vert_slot_of_edges = ex.compact_edges(
        occ_flat, cube_act
    )

    sa, sb = sdf_p[ev0], sdf_p[ev1]
    d = sa - sb
    d = jnp.where(jnp.abs(d) > 1e-8, d, 1.0)
    wa = -sb / d
    wb = sa / d
    ma, mb = msdf_p[ev0], msdf_p[ev1]
    msdf_vert = jnp.where(slot_valid, ma * wa + mb * wb, 0.0)
    msdf_buf = jnp.concatenate([msdf_vert, jnp.zeros((1,))])

    g_occ4 = occ_flat[corner_vid].astype(jnp.int32)
    tetindex = (g_occ4 * jnp.asarray([1, 2, 4, 8], jnp.int32)).sum(-1)
    tetindex = jnp.where(tet_valid, tetindex, 15)
    idx6 = vert_slot_of_edges(*ex.tet_edge_lo_cls(corner_xyz), tet_valid[:, None])
    me = jnp.clip(ex.mesh_edge_table[tetindex], 0, 5)
    corners = jnp.take_along_axis(idx6, me[:, :4], axis=1)
    nxt = jnp.roll(jnp.arange(4), -1)
    cu, cw = corners, corners[:, nxt]
    mu, mw = msdf_buf[cu], msdf_buf[cw]
    sign_ok = jnp.abs(jnp.sign(mu) + jnp.sign(mw)) != 2
    den = mu - mw
    ok = sign_ok & (jnp.abs(den) > 1e-8) & tet_valid[:, None]
    den_s = jnp.where(ok, den, 1.0)
    w_u = jnp.where(ok, -mw / den_s, 0.0)
    pairs = jnp.stack([cu, cw], axis=-1)
    return pairs, w_u, ok


def _marching_from_grids(ex: GShellTets, pos, sdf_sign, coeff_of_edge_slotless,
                         msdf_mid_sign, occgrid, edge_mid_coords) -> GShellMesh:
    """Static-shape twin of ``marching_from_auggrid`` — the extraction driven
    by quantized grid data instead of continuous fields."""
    N = ex.n_grid_verts
    V, MT = ex.max_verts, ex.max_tets

    sdf = sdf_sign  # signs suffice for occupancy
    pos_p = jnp.concatenate([pos, jnp.zeros((1, 3))])

    r1 = ex.grid.res + 1
    occ_vol = (sdf > 0).reshape(r1, r1, r1)
    occ_flat = occ_vol.reshape(-1)
    cube_act, cube_xyz, cube_ok = ex.active_cubes(occ_vol)
    tet_valid, corner_xyz, corner_vid, _ = ex.compact_tets(
        occ_flat, cube_xyz, cube_ok
    )
    slot_valid, ev0, ev1, lo_xyz, cls, vert_slot_of_edges = ex.compact_edges(
        occ_flat, cube_act
    )

    E = ex.n_grid_edges
    e_clip = jnp.clip(ex.edge_ids_from(lo_xyz, cls), 0, E - 1)
    c = coeff_of_edge_slotless[e_clip]  # (V,) interp coefficient from grid
    verts = pos_p[ev0] * (1.0 - c[:, None]) + pos_p[ev1] * c[:, None]
    verts = jnp.where(slot_valid[:, None], verts, 0.0)
    msdf_vert = jnp.where(slot_valid, msdf_mid_sign[e_clip], 0.0)

    verts_buf = jnp.concatenate([verts, jnp.zeros((1, 3))])
    msdf_buf = jnp.concatenate([msdf_vert, jnp.zeros((1,))])
    # midpoint site coords per template vertex slot: 2·lo + offset
    from .tet_grid import EDGE_OFFSETS as _EO

    mid = 2 * lo_xyz + jnp.asarray(_EO, jnp.int32)[cls]
    mid_pad = jnp.concatenate([mid, jnp.zeros((1, 3), jnp.int32)])

    g_occ4 = occ_flat[corner_vid].astype(jnp.int32)
    tetindex = (g_occ4 * jnp.asarray([1, 2, 4, 8], jnp.int32)).sum(-1)
    tetindex = jnp.where(tet_valid, tetindex, 15)
    num_tri = ex.num_tri_table[tetindex]
    idx6 = vert_slot_of_edges(*ex.tet_edge_lo_cls(corner_xyz), tet_valid[:, None])

    trow = jnp.clip(ex.triangle_table[tetindex], 0, 5)
    f01 = jnp.take_along_axis(idx6, trow, axis=1)
    face0 = jnp.where((num_tri >= 1)[:, None], f01[:, :3], V)
    face1 = jnp.where((num_tri == 2)[:, None], f01[:, 3:6], V)
    faces_wt = jnp.stack([face0, face1], axis=1).reshape(-1, 3)
    face_wt_valid = jnp.stack([num_tri >= 1, num_tri == 2], axis=1).reshape(-1)

    me = jnp.clip(ex.mesh_edge_table[tetindex], 0, 5)
    corners = jnp.take_along_axis(idx6, me[:, :4], axis=1)
    c_msdf = msdf_buf[corners]
    mocc = (c_msdf > 0).astype(jnp.int32)
    idx_tri = mocc[:, 0] * 4 + mocc[:, 1] * 2 + mocc[:, 2]
    idx_quad = mocc[:, 0] * 8 + mocc[:, 1] * 4 + mocc[:, 2] * 2 + mocc[:, 3]
    is_quad = num_tri == 2

    nxt = jnp.roll(jnp.arange(4), -1)
    cu, cw = corners, corners[:, nxt]
    m_u = mid_pad[cu]  # (MT, 4, 3)
    m_w = mid_pad[cw]
    site = jnp.clip(m_u + m_w, 0, occgrid.shape[0] - 1)
    cval = occgrid[site[..., 0], site[..., 1], site[..., 2]] * 0.5 + 0.5
    key = (jnp.sign(m_u - m_w) * jnp.asarray([16, 4, 1])).sum(-1)
    w_u = jnp.where(key > 0, cval, 1.0 - cval)
    w_w = 1.0 - w_u
    pair_ok = (jnp.sign(msdf_buf[cu]) != jnp.sign(msdf_buf[cw])) & tet_valid[:, None]
    w_u = jnp.where(pair_ok, w_u, 0.0)
    w_w = jnp.where(pair_ok, w_w, 0.0)

    b_verts = verts_buf[cu] * w_u[..., None] + verts_buf[cw] * w_w[..., None]
    t_ids = jnp.arange(MT, dtype=jnp.int32)
    b_gid = (V + 1) + t_ids[:, None] * 4 + jnp.arange(4, dtype=jnp.int32)[None, :]

    idx_tri_map = jnp.concatenate([corners[:, :3], b_gid[:, :3]], axis=1)
    idx_quad_map = jnp.concatenate([corners, b_gid], axis=1)
    tri_row = jnp.clip(ex.tri_table[idx_tri], 0, 5)
    quad_row = jnp.clip(ex.quad_table[idx_quad], 0, 7)
    tri_faces = jnp.take_along_axis(idx_tri_map, tri_row, axis=1).reshape(-1, 2, 3)
    quad_faces = jnp.take_along_axis(idx_quad_map, quad_row, axis=1).reshape(-1, 4, 3)
    n_cut_tri = ex.num_tri_tri[idx_tri]
    n_cut_quad = ex.num_tri_quad[idx_quad]
    farange = jnp.arange(4, dtype=jnp.int32)[None, :]
    tri_fvalid = (farange < n_cut_tri[:, None]) & (farange < 2)
    quad_fvalid = farange < n_cut_quad[:, None]
    tri_faces4 = jnp.concatenate([tri_faces, jnp.full((MT, 2, 3), V, jnp.int32)], axis=1)
    faces_aug = jnp.where(is_quad[:, None, None], quad_faces, tri_faces4)
    face_valid = jnp.where(is_quad[:, None], quad_fvalid, tri_fvalid)
    face_valid = face_valid & tet_valid[:, None] & (num_tri > 0)[:, None]
    faces_aug = jnp.where(face_valid[..., None], faces_aug, V).reshape(-1, 3)
    face_valid = face_valid.reshape(-1)

    verts_aug = jnp.concatenate([verts_buf, b_verts.reshape(-1, 3)])
    from ..ops.mesh_ops import auto_normals

    v_nrm = auto_normals(verts_aug, faces_aug, face_valid)
    zeros_b = jnp.zeros((4 * MT,))
    return GShellMesh(
        verts=verts_aug,
        faces=faces_aug,
        face_valid=face_valid,
        v_nrm=v_nrm,
        v_tng=jnp.zeros_like(verts_aug),
        msdf=jnp.concatenate([msdf_buf, zeros_b]),
        msdf_watertight=msdf_buf,
        msdf_boundary=zeros_b,
        faces_wt=faces_wt,
        face_wt_valid=face_wt_valid,
        n_verts_watertight=V + 1,
        n_valid_tets=tet_valid.sum().astype(jnp.int32),
        n_crossing_edges=slot_valid.sum().astype(jnp.int32),
    )
