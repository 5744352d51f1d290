import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gshell_tpu.geometry.cube_grid import build_cube_grid
from gshell_tpu.geometry.gshell_flexicubes import GShellFlexiCubes

RES = 16
R_SPHERE = 0.35


@pytest.fixture(scope="module")
def grid():
    return build_cube_grid(RES)


@pytest.fixture(scope="module")
def fc(grid):
    return GShellFlexiCubes(grid)


def test_cube_grid_adjacency(grid):
    """Each interior edge's 4 adjacent cubes must contain that edge, at the
    stated local index, in ascending cube-id order."""
    interior = np.nonzero(grid.edge_interior)[0][::97]  # sample
    for e in interior:
        cubes4 = grid.edge_adj_cubes[e]
        locs4 = grid.edge_adj_local[e]
        assert (np.diff(cubes4) > 0).all()
        for cid, loc in zip(cubes4, locs4):
            assert grid.cube_edges[cid, loc] == e


def sphere_fields(grid):
    pos = jnp.asarray(grid.verts)
    sdf = jnp.linalg.norm(pos, axis=-1) - R_SPHERE  # inside < 0 (flexicubes)
    return pos, sdf


def test_watertight_sphere(grid, fc):
    pos, sdf = sphere_fields(grid)
    nu = jnp.ones(pos.shape[0])
    m = jax.jit(lambda p, s, n: fc(p, s, n))(pos, sdf, nu)
    assert int(m.n_surf_cubes) > 0
    f = np.asarray(m.faces)[np.asarray(m.face_valid)]
    assert f.shape[0] > 100
    # all used vertices on the sphere
    verts = np.asarray(m.verts)
    used = np.unique(f.reshape(-1))
    r = np.linalg.norm(verts[used], axis=-1)
    np.testing.assert_allclose(r, R_SPHERE, atol=3.0 / RES**2 + 0.02)
    # closed surface
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], 0)
    edges.sort(axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    assert np.isfinite(float(m.l_dev))


def test_open_cut(grid, fc):
    pos, sdf = sphere_fields(grid)
    nu = pos[:, 2] + 0.05
    m = jax.jit(lambda p, s, n: fc(p, s, n))(pos, sdf, nu)
    f = np.asarray(m.faces)[np.asarray(m.face_valid)]
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], 0)
    edges.sort(axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 1).sum() > 10, "open boundary expected"


def test_weights_and_grads(grid, fc):
    pos, sdf = sphere_fields(grid)
    nu = pos[:, 2] + 0.05
    C = grid.n_cubes
    key = jax.random.PRNGKey(0)
    beta = 0.1 * jax.random.normal(key, (C, 12))
    alpha = 0.1 * jax.random.normal(key, (C, 8))
    gamma = 0.1 * jax.random.normal(key, (C,))

    def loss(sdf, nu, beta, alpha, gamma):
        m = fc(pos, sdf, nu, beta, alpha, gamma)
        w = m.face_valid.astype(jnp.float32)
        c = (m.verts[m.faces[:, 0]] + m.verts[m.faces[:, 1]] + m.verts[m.faces[:, 2]]) / 3
        return jnp.sum(c[:, 2] * w) + m.l_dev

    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(sdf, nu, beta, alpha, gamma)
    for i, g in enumerate(grads):
        g = np.asarray(g)
        assert np.isfinite(g).all(), f"grad {i} not finite"
        assert np.abs(g).max() > 0, f"grad {i} all zero"


def test_qef_dual_vertices_on_plane():
    """With grad_func (QEF mode, ref _solve_vd_QEF), dual vertices of a
    planar SDF land on the plane (QEF minimizes n·(v-p) residuals)."""
    import jax.numpy as jnp
    import numpy as np

    from gshell_tpu.geometry.cube_grid import build_cube_grid
    from gshell_tpu.geometry.gshell_flexicubes import GShellFlexiCubes

    g = build_cube_grid(8)
    ex = GShellFlexiCubes(g)
    x = jnp.asarray(g.verts)
    plane_z = 0.037
    s = x[:, 2] - plane_z  # SDF of plane z = plane_z (inside < 0)
    nu = jnp.ones((x.shape[0],))

    grad = lambda p: jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), p.shape)
    mesh = ex(x, s, nu, training=False, grad_func=grad)
    v = np.asarray(mesh.verts)
    fv = np.asarray(mesh.face_valid)
    f = np.asarray(mesh.faces)[fv]
    used = np.unique(f.reshape(-1))
    zs = v[used, 2]
    np.testing.assert_allclose(zs, plane_z, atol=2e-3)
