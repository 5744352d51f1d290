"""Lazy-gradient field evaluation parity (GShellTets sdf_fn / msdf_fn).

The training tick's lazy path evaluates MLP fields densely WITHOUT gradient
(occupancy only) and re-evaluates them at the crossing-edge endpoints for the
gradient-carrying values (geometry.fields_lazy → GShellTets.__call__ sdf_fn).
These tests pin the two invariants that make that safe:

  1. extractor outputs AND parameter gradients are identical between the
     dense and lazy paths (same network → same values at the same points);
  2. the crossing-edge-slot BCE (regularizer.sdf_reg_loss_edges) equals the
     full-lattice form (ref gshell_tets.py:33-39) — sign-differing lattice
     edges ARE the crossing-edge slots.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.geometry.mlp import MLPConfig, apply_mlp, init_mlp
from gshell_tpu.render import regularizer as reg

GRID = 12
MLP = MLPConfig(n_freq=2, d_hidden=16, n_hidden=2, skip_in=())


def _setup():
    geo = GShellGeometry(
        GeometryConfig(grid_res=GRID, use_sdf_mlp=True, mlp=MLP, use_eikonal=False)
    )
    net = init_mlp(jax.random.PRNGKey(0), MLP)
    pos = geo.verts
    msdf = jnp.sin(5.0 * pos[:, 1]) + 0.3
    return geo, net, pos, msdf


def _field(params, pts):
    # random-init MLP + a sphere bias so the zero level-set actually crosses
    # the lattice (a raw random MLP has no sign change at grid 12)
    return apply_mlp(params, pts, MLP)[:, 0] * 0.1 + (
        0.4 - jnp.linalg.norm(pts, axis=-1)
    )


def _loss_from_mesh(mesh):
    return (
        (mesh.verts**2).sum()
        + (mesh.msdf**2).sum()
        + reg.sdf_reg_loss_edges(mesh.edge_sdf)
    )


def test_lazy_extractor_parity_values_and_grads():
    geo, net, pos, msdf = _setup()
    ex = geo.extractor

    def run(params, lazy):
        sdf = _field(params, pos)
        if lazy:
            fn = lambda pts: _field(params, pts)
            return ex(pos, jax.lax.stop_gradient(sdf), msdf, sdf_fn=fn,
                      compute_aug_normals=False, compute_tangents=False)
        return ex(pos, sdf, msdf,
                  compute_aug_normals=False, compute_tangents=False)

    m_d = run(net, lazy=False)
    m_l = run(net, lazy=True)
    assert int(m_d.n_valid_tets) > 0
    np.testing.assert_allclose(m_d.verts, m_l.verts, atol=1e-6)
    np.testing.assert_allclose(m_d.msdf, m_l.msdf, atol=1e-6)
    np.testing.assert_allclose(m_d.edge_sdf, m_l.edge_sdf, atol=1e-6)

    g_d = jax.grad(lambda p: _loss_from_mesh(run(p, lazy=False)))(net)
    g_l = jax.grad(lambda p: _loss_from_mesh(run(p, lazy=True)))(net)
    for a, b in zip(jax.tree_util.tree_leaves(g_d), jax.tree_util.tree_leaves(g_l)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_edge_bce_matches_lattice_bce():
    geo, net, pos, msdf = _setup()
    sdf = _field(net, pos)
    mesh = geo.extractor(pos, sdf, msdf,
                         compute_aug_normals=False, compute_tangents=False)
    r1 = GRID + 1
    lat = reg.sdf_reg_loss_lattice(sdf.reshape(r1, r1, r1))
    edg = reg.sdf_reg_loss_edges(mesh.edge_sdf)
    # no slot overflow at this size → identical edge sets
    assert int(mesh.n_crossing_edges) < geo.extractor.max_verts
    np.testing.assert_allclose(float(lat), float(edg), rtol=1e-5)
