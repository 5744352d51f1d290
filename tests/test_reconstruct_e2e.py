"""End-to-end smoke test: fit a sphere silhouette for a few steps.

Minimum slice of SURVEY.md §7: extraction → rasterize → shade → losses →
3 optimizer groups, all inside one jitted train step.  Small sizes keep CPU
compile time manageable; correctness = finite losses that decrease and alpha
coverage approaching the target.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.geometry.mlp import MLPConfig
from gshell_tpu.ops import math as gmath
from gshell_tpu.render.material import MLPTexture3DConfig, default_kd_ks_min_max
from gshell_tpu.render.render import RenderFlags
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig

RES = 32
GRID = 12


@pytest.fixture(scope="module")
def setup():
    gcfg = GeometryConfig(
        grid_res=GRID,
        scale=1.4,
        use_sdf_mlp=False,  # direct per-vertex SDF keeps the test light
        use_eikonal=False,
        n_eikonal_samples=256,
        total_iters=100,
    )
    geo = GShellGeometry(gcfg)
    mat_cfg = MLPTexture3DConfig(
        channels=6,
        internal_dims=16,
        hidden=2,
        hash=HashGridConfig(n_levels=4, log2_table_size=12, base_resolution=4, desired_resolution=32),
        aabb_min=(-1.0, -1.0, -1.0),
        aabb_max=(1.0, 1.0, 1.0),
        min_max=default_kd_ks_min_max(),
    )
    flags = RenderFlags(
        resolution=(RES, RES),
        n_samples=2,
        bsdf="diffuse",
        use_denoiser=False,
        raster_chunk=512,
    )
    tcfg = TrainConfig(iters=10, batch=1, use_shadows=False)
    rec = Reconstructor(geo, mat_cfg, flags, tcfg)
    state = rec.init_state(jax.random.PRNGKey(0), pretrain_steps=0)
    return rec, state


def make_target(batch=1):
    """Reference views of a centered disk silhouette with gray color."""
    proj = gmath.perspective(np.deg2rad(45.0), 1.0, 0.1, 10.0)
    view = gmath.lookat(
        jnp.array([0.0, 0.0, 2.2]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    mvp = (proj @ view)[None].repeat(batch, 0)
    campos = jnp.array([[0.0, 0.0, 2.2]]).repeat(batch, 0)
    ys, xs = jnp.meshgrid(jnp.arange(RES), jnp.arange(RES), indexing="ij")
    r = jnp.sqrt((xs - RES / 2 + 0.5) ** 2 + (ys - RES / 2 + 0.5) ** 2)
    # sphere radius 0.35 at distance 2.2, fovy 45° → ndc radius ≈ 0.386
    mask = (r < 0.19 * RES).astype(jnp.float32)[None, ..., None].repeat(batch, 0)
    rgb = jnp.ones((batch, RES, RES, 3)) * 0.5 * mask
    img = jnp.concatenate([rgb, mask], -1)
    bg = jnp.zeros((batch, RES, RES, 3))
    return {"mvp": mvp, "campos": campos, "img": img, "background": bg}


def test_train_steps_improve(setup):
    rec, state = setup
    target = make_target()
    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(8):
        key, k = jax.random.split(key)
        state, metrics = rec.train_step(state, k, target)
        losses.append(float(metrics["total"]))
        assert np.isfinite(losses[-1]), f"step {i}: loss not finite"
    assert int(metrics["n_valid_tets"]) > 0
    # Optimization should make progress on the silhouette
    assert losses[-1] < losses[0] * 1.05, f"no improvement: {losses}"


def test_state_is_pytree(setup):
    rec, state = setup
    leaves = jax.tree_util.tree_leaves(state)
    assert all(hasattr(l, "shape") or np.isscalar(l) for l in leaves)
