"""Structured tetrahedral grids with *static, analytically-indexed* topology.

The reference loads irregular quartet grids from ``data/tets/{res}_tets.npz``
(``geometry/gshell_tets_geometry.py:59``) and re-derives edge connectivity
with ``torch.unique`` on every extraction step (``geometry/gshell_tets.py:268``).
On TPU, dynamic uniquification inside the step is a non-starter — and is also
wasted work, because the grid topology never changes.

We instead use a Freudenthal (Kuhn) lattice: each cube of a regular
``res³`` grid is split into 6 tetrahedra sharing the main diagonal.  The key
property is that the edge set is *analytic*: every tet edge connects a lattice
vertex ``v`` to ``v + o`` for one of 7 offsets
(100, 010, 001, 110, 101, 011, 111), so

  * the unique edge list,
  * the (tet → 6 edge ids) incidence map

are closed-form ravelings computed once at startup (numpy), and the per-step
extractor is pure gathers over static arrays.

A second benefit: the lattice vertices form a dense regular grid, so the SDF
values double as a *trilinear SDF volume* for sphere-traced shadow rays
(replacing the reference's OptiX BVH; see ``gshell_tpu.ops.shade``).
"""
from __future__ import annotations

import dataclasses
import itertools

import numpy as np

# The 7 lattice edge-offset classes of the Freudenthal decomposition.
EDGE_OFFSETS = np.array(
    [
        [1, 0, 0],
        [0, 1, 0],
        [0, 0, 1],
        [1, 1, 0],
        [1, 0, 1],
        [0, 1, 1],
        [1, 1, 1],
    ],
    dtype=np.int64,
)

# 6 monotone paths 000→111 (axis permutation order), each a tetrahedron.
_PATHS = list(itertools.permutations([0, 1, 2]))


@dataclasses.dataclass(frozen=True)
class TetGrid:
    """Static topology of a Freudenthal tet lattice over ``[-0.5, 0.5]³``.

    ``tets`` / ``tet_edges`` / ``edges`` may be ``None``
    (``build_tet_grid(..., build_topology=False)``): the lattice topology is
    fully analytic, and the extractor (``gshell_tets.py``) computes incidence
    closed-form — materializing the tables costs O(res³) memory (4 GB at
    res 256) and is only needed by the generative bake/decode tooling."""

    res: int
    verts: np.ndarray  # (N, 3) float32, lattice positions in [-0.5, 0.5]^3
    tets: np.ndarray | None  # (T, 4) int32
    tet_edges: np.ndarray | None  # (T, 6) int32 — edge ids [01,02,03,12,13,23]
    edges: np.ndarray | None  # (E, 2) int32 — unique edges, low index first

    @property
    def n_verts(self) -> int:
        return self.verts.shape[0]

    @property
    def n_tets(self) -> int:
        return 6 * self.res**3

    @property
    def n_edges(self) -> int:
        return int(_edge_class_bases(self.res)[-1])


def _vertex_ids(res: int) -> np.ndarray:
    n = res + 1
    return np.arange(n * n * n, dtype=np.int64).reshape(n, n, n)


def _edge_class_bases(res: int) -> np.ndarray:
    """Start offset of each edge class in the global edge numbering."""
    n = res + 1
    counts = [(n - o[0]) * (n - o[1]) * (n - o[2]) for o in EDGE_OFFSETS]
    return np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)


def _edge_id(res: int, lo_xyz: np.ndarray, cls: np.ndarray, bases: np.ndarray) -> np.ndarray:
    """Edge id from its lower-corner lattice coords and offset class."""
    n = res + 1
    o = EDGE_OFFSETS[cls]
    dims1 = n - o[..., 1]
    dims2 = n - o[..., 2]
    local = (lo_xyz[..., 0] * dims1 + lo_xyz[..., 1]) * dims2 + lo_xyz[..., 2]
    return bases[cls] + local


def build_tet_grid(
    res: int, dtype=np.float32, use_native: bool = True, build_topology: bool = True
) -> TetGrid:
    """Build the lattice, its 6-tets-per-cube decomposition, and the analytic
    edge incidence.  Run once at startup.  Uses the native C++/OpenMP builder
    (``native/gridgen.cpp`` via ``utils.native``) when available — identical
    outputs, much faster at res ≥ 128 — with this numpy path as the twin.

    ``build_topology=False`` skips the O(res³) tets/tet_edges/edges tables
    (the training extractor indexes the lattice analytically and never reads
    them; required above res ≈ 192 where the tables alone exceed host RAM
    budgets)."""
    if not build_topology:
        n = res + 1
        axis = np.linspace(-0.5, 0.5, n, dtype=dtype)
        gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
        verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        return TetGrid(res=res, verts=verts, tets=None, tet_edges=None, edges=None)
    if use_native:
        try:
            from ..utils.native import build_tet_grid_native

            out = build_tet_grid_native(res)
        except Exception:
            out = None
        if out is not None:
            verts, tets, tet_edges, edges = out
            return TetGrid(res=res, verts=verts, tets=tets, tet_edges=tet_edges, edges=edges)
    n = res + 1
    vid = _vertex_ids(res)

    # Vertices
    axis = np.linspace(-0.5, 0.5, n, dtype=dtype)
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

    # Cube lower corners
    cx, cy, cz = np.meshgrid(
        np.arange(res, dtype=np.int64),
        np.arange(res, dtype=np.int64),
        np.arange(res, dtype=np.int64),
        indexing="ij",
    )
    base = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)  # (C, 3)
    ncubes = base.shape[0]

    # 6 tets per cube; vertices of tet p = cumulative steps of the path.
    tets = np.empty((ncubes, 6, 4), dtype=np.int64)
    for p, path in enumerate(_PATHS):
        corner = np.zeros((4, 3), dtype=np.int64)
        for s, ax in enumerate(path):
            corner[s + 1] = corner[s]
            corner[s + 1, ax] += 1
        for s in range(4):
            c = base + corner[s]
            tets[:, p, s] = vid[c[:, 0], c[:, 1], c[:, 2]]
    tets = tets.reshape(-1, 4)

    # Edge ids for the 6 edges [01, 02, 03, 12, 13, 23] of each tet.
    bases = _edge_class_bases(res)
    cls_lut = {tuple(o): i for i, o in enumerate(EDGE_OFFSETS.tolist())}
    xyz = np.stack(np.unravel_index(tets, (n, n, n)), axis=-1)  # (T, 4, 3)
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    tet_edges = np.empty((tets.shape[0], 6), dtype=np.int64)
    for k, (a, b) in enumerate(pairs):
        pa, pb = xyz[:, a], xyz[:, b]
        lo = np.minimum(pa, pb)
        off = np.abs(pb - pa)
        # Offsets within a tet are always monotone, so |diff| is one of the 7.
        cls = np.array([cls_lut[tuple(o)] for o in off[:1].tolist()])  # probe
        # vectorized class id: off @ (weights) keyed by the 7 combos
        key = off[:, 0] * 4 + off[:, 1] * 2 + off[:, 2]
        key_to_cls = np.full(8, -1, dtype=np.int64)
        for i, o in enumerate(EDGE_OFFSETS):
            key_to_cls[o[0] * 4 + o[1] * 2 + o[2]] = i
        cls = key_to_cls[key]
        assert (cls >= 0).all()
        tet_edges[:, k] = _edge_id(res, lo, cls, bases)

    # Unique edge list, enumerated per class.
    edge_chunks = []
    for o in EDGE_OFFSETS:
        lo_ids = vid[: n - o[0], : n - o[1], : n - o[2]].reshape(-1)
        hi_ids = vid[o[0]:, o[1]:, o[2]:].reshape(-1)
        edge_chunks.append(np.stack([lo_ids, hi_ids], axis=-1))
    edges = np.concatenate(edge_chunks, axis=0)

    return TetGrid(
        res=res,
        verts=verts,
        tets=tets.astype(np.int32),
        tet_edges=tet_edges.astype(np.int32),
        edges=edges.astype(np.int32),
    )


def default_capacities(res: int, n_tets: int, n_edges: int, safety: float = 1.0):
    """Fixed extraction capacities.

    The active iso-surface region of a ``res³`` lattice scales O(res²); for a
    sphere the crossing-cube shell is ≈ π·res² cubes × 6 tets.  We budget
    generously (deformation + nontrivial topology) but cap at the full grid.
    Returns ``(max_valid_tets, max_crossing_edges)``.

    Measured usage (sphere / wavy / two-blob iso-surfaces, res 32-64) is
    ~9 valid tets, ~6 crossing edges, ~2 active cubes per res² — the
    defaults below carry ≈2.5× headroom; extraction cost scales linearly
    with these, and saturation is observable via the mesh's
    ``n_valid_tets``/``n_active_cubes`` vs the capacities.

    Budget guidance (tests/test_overflow_pressure.py pins this):
    think in *sheet-equivalents* — one iso-surface sheet through the volume
    costs ~9·res² tets and ~6·res² edges.  At ``safety=1.0`` the tet budget
    covers ≈2.67 sheets but the EDGE budget only ≈2.0, so for multi-sheet /
    thin-garment topologies the ``edge_slot_overflow`` training monitor is
    the one that fires first (measured: a 2.4-sheet gyroid uses 90% of the
    tet budget and 123% of the edge budget).  ``safety=0.5`` (the res-256
    perf setting) halves both — safe for ≤1-sheet garments, and the
    ``tet_slot_overflow``/``edge_slot_overflow`` metrics flag the moment it
    is not; raise ``capacity_safety`` (values >1 are valid, capped at the
    full grid) rather than trusting a silently clipped silhouette.
    """
    max_tets = min(n_tets, int(24 * res * res * safety))
    max_verts = min(n_edges, int(12 * res * res * safety))
    return max_tets, max_verts
