import numpy as np

from gshell_tpu.geometry.tet_grid import build_tet_grid, EDGE_OFFSETS


def test_grid_counts():
    res = 4
    g = build_tet_grid(res)
    n = res + 1
    assert g.verts.shape == (n**3, 3)
    assert g.tets.shape == (6 * res**3, 4)
    # Analytic edge count: sum over 7 offset classes
    expected_edges = sum(
        (n - o[0]) * (n - o[1]) * (n - o[2]) for o in EDGE_OFFSETS
    )
    assert g.edges.shape == (expected_edges, 2)
    assert g.tet_edges.shape == (g.tets.shape[0], 6)


def test_edge_incidence_consistent():
    """tet_edges[t, k] must be the id of the (sorted) k-th edge of tet t."""
    g = build_tet_grid(3)
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    for k, (a, b) in enumerate(pairs):
        ea = g.tets[:, a]
        eb = g.tets[:, b]
        lo = np.minimum(ea, eb)
        hi = np.maximum(ea, eb)
        got = g.edges[g.tet_edges[:, k]]
        np.testing.assert_array_equal(got[:, 0], lo)
        np.testing.assert_array_equal(got[:, 1], hi)


def test_tets_positive_volume_and_cover():
    g = build_tet_grid(2)
    v = g.verts[g.tets]  # (T, 4, 3)
    vol = np.einsum(
        "ti,ti->t",
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]),
        v[:, 3] - v[:, 0],
    ) / 6.0
    assert (np.abs(vol) > 1e-9).all()
    # 6 tets per cube tile the cube exactly
    cube_vol = (1.0 / 2) ** 3
    total = np.abs(vol).sum()
    np.testing.assert_allclose(total, 1.0, rtol=1e-5)
