import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gshell_tpu.geometry.gshell_tets import GShellTets
from gshell_tpu.geometry.tet_grid import build_tet_grid

RES = 16
R_SPHERE = 0.35


@pytest.fixture(scope="module")
def grid():
    return build_tet_grid(RES)


@pytest.fixture(scope="module")
def extractor(grid):
    return GShellTets(grid)


def sphere_fields(grid):
    pos = jnp.asarray(grid.verts)
    sdf = R_SPHERE - jnp.linalg.norm(pos, axis=-1)  # >0 inside
    return pos, sdf


def test_watertight_sphere(grid, extractor):
    pos, sdf = sphere_fields(grid)
    msdf = jnp.ones(pos.shape[0])  # fully positive → no cutting
    m = jax.jit(extractor.__call__)(pos, sdf, msdf)

    assert int(m.n_valid_tets) > 0
    assert int(m.n_valid_tets) <= extractor.max_tets
    assert int(m.n_crossing_edges) <= extractor.max_verts

    # Template vertices lie on the sphere (linear interp error ~ h²)
    v = np.asarray(m.verts[: extractor.max_verts])
    used = np.zeros(extractor.max_verts + 1 + 4 * extractor.max_tets, bool)
    f = np.asarray(m.faces)[np.asarray(m.face_valid)]
    used[f.reshape(-1)] = True
    r = np.linalg.norm(v[used[: extractor.max_verts]], axis=-1)
    assert r.shape[0] > 100
    np.testing.assert_allclose(r, R_SPHERE, atol=2.5 / RES**2 + 0.01)

    # With all-positive mSDF, cut mesh == template mesh topologically:
    # every edge of the valid cut faces is shared by exactly 2 faces.
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], 0)
    edges.sort(axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), "watertight mesh must have closed edges"


def test_open_surface_cut(grid, extractor):
    """mSDF < 0 in the z<0 half-space cuts the sphere into an open cap."""
    pos, sdf = sphere_fields(grid)
    msdf = pos[:, 2] + 0.05  # open below z = -0.05
    m = jax.jit(lambda p, s, ms: extractor(p, s, ms, watertight_template=False))(
        pos, sdf, msdf
    )

    f = np.asarray(m.faces)[np.asarray(m.face_valid)]
    assert f.shape[0] > 50
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], 0)
    edges.sort(axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    # An open surface has boundary edges (count == 1)
    assert (counts == 1).sum() > 10, "expected open boundary edges"

    # All used vertices must be near/above the cut plane
    verts = np.asarray(m.verts)
    used = np.unique(f.reshape(-1))
    zs = verts[used][:, 2]
    nonzero = np.abs(verts[used]).sum(-1) > 1e-8
    assert (zs[nonzero] > -0.05 - 1.5 / RES).all()


def test_gradients_flow(grid, extractor):
    pos, sdf = sphere_fields(grid)
    msdf = pos[:, 2] + 0.05

    def loss(sdf, msdf, pos):
        m = extractor(pos, sdf, msdf, watertight_template=False)
        w = m.face_valid.astype(jnp.float32)
        c = (
            m.verts[m.faces[:, 0]] + m.verts[m.faces[:, 1]] + m.verts[m.faces[:, 2]]
        ) / 3.0
        return jnp.sum(c[:, 2] * w)

    g_sdf, g_msdf, g_pos = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(sdf, msdf, pos)
    assert np.isfinite(np.asarray(g_sdf)).all()
    assert np.isfinite(np.asarray(g_msdf)).all()
    assert np.isfinite(np.asarray(g_pos)).all()
    assert np.abs(np.asarray(g_sdf)).max() > 0
    # mSDF gradient must flow through the boundary-vertex cut coefficients
    assert np.abs(np.asarray(g_msdf)).max() > 0


def test_no_recompile_on_field_change(grid, extractor):
    pos, sdf = sphere_fields(grid)
    msdf = jnp.ones(pos.shape[0])
    fn = jax.jit(extractor.__call__)
    m1 = fn(pos, sdf, msdf)
    m2 = fn(pos, sdf * 0.7 + 0.01, msdf)
    assert m1.verts.shape == m2.verts.shape


def test_sdf_reg_lattice_matches_edge_list():
    """Volume-sliced SDF sign-consistency BCE == edge-list form."""
    import jax.numpy as jnp
    import numpy as np

    from gshell_tpu.geometry.tet_grid import build_tet_grid
    from gshell_tpu.render.regularizer import sdf_reg_loss, sdf_reg_loss_lattice

    res = 6
    g = build_tet_grid(res, use_native=False)
    rng = np.random.default_rng(0)
    sdf = jnp.asarray(rng.normal(size=(g.n_verts,)).astype(np.float32))
    a = sdf_reg_loss(sdf, jnp.asarray(g.edges.astype(np.int32)))
    b = sdf_reg_loss_lattice(sdf.reshape(res + 1, res + 1, res + 1))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.slow
def test_extraction_topology_free_grid():
    """Extraction works on a grid built with build_topology=False (the
    res-256 path: no materialized tets/tet_edges/edges tables)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gshell_tpu.geometry.gshell_tets import GShellTets
    from gshell_tpu.geometry.tet_grid import build_tet_grid

    res = 8
    g_full = build_tet_grid(res, use_native=False)
    g_lazy = build_tet_grid(res, build_topology=False)
    exf = GShellTets(g_full)
    exl = GShellTets(g_lazy)

    pos = jnp.asarray(g_full.verts)
    sdf = 0.3 - jnp.linalg.norm(pos, axis=-1)
    rng = np.random.default_rng(1)
    msdf = jnp.asarray(rng.normal(size=(g_full.n_verts,)).astype(np.float32))

    mf = exf(pos, sdf, msdf)
    ml = exl(pos, sdf, msdf)
    for name in ("verts", "faces", "face_valid", "msdf", "faces_wt"):
        np.testing.assert_array_equal(
            np.asarray(getattr(mf, name)), np.asarray(getattr(ml, name)), err_msg=name
        )
    assert int(mf.n_valid_tets) == int(ml.n_valid_tets) > 0
