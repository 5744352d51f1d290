"""Depth / second-layer / FlexiCubes-Eikonal loss wiring (VERDICT round-1 #5).

Reference formulas: depth L1 ×100 and img_second MSE+color at
gshell_tets_geometry.py:287-299; FlexiCubes Eikonal at
gshell_flexicubes_geometry.py:284-300.  Each term must be (a) nonzero on a
synthetic scene where the supervision disagrees with the render, and
(b) differentiable w.r.t. geometry params.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.geometry.mlp import MLPConfig
from gshell_tpu.ops import math as gmath
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.ops.image_loss import create_loss
from gshell_tpu.render.light import update_pdf
from gshell_tpu.render.material import (
    MLPTexture3DConfig,
    default_kd_ks_min_max,
    init_mlp_texture,
)
from gshell_tpu.render.render import RenderFlags

RES = 24
GRID = 10


def _mat_cfg():
    return MLPTexture3DConfig(
        channels=6,
        internal_dims=16,
        hidden=2,
        hash=HashGridConfig(
            n_levels=3, log2_table_size=10, base_resolution=4, desired_resolution=16
        ),
        aabb_min=(-1.0, -1.0, -1.0),
        aabb_max=(1.0, 1.0, 1.0),
        min_max=default_kd_ks_min_max(),
    )


def _target(batch=1, with_extras=True):
    proj = gmath.perspective(np.deg2rad(45.0), 1.0, 0.1, 10.0)
    view = gmath.lookat(
        jnp.array([0.0, 0.0, 2.2]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    mvp = (proj @ view)[None].repeat(batch, 0)
    campos = jnp.array([[0.0, 0.0, 2.2]]).repeat(batch, 0)
    ys, xs = jnp.meshgrid(jnp.arange(RES), jnp.arange(RES), indexing="ij")
    r = jnp.sqrt((xs - RES / 2 + 0.5) ** 2 + (ys - RES / 2 + 0.5) ** 2)
    mask = (r < 0.19 * RES).astype(jnp.float32)[None, ..., None].repeat(batch, 0)
    rgb = jnp.ones((batch, RES, RES, 3)) * 0.5 * mask
    t = {
        "mvp": mvp,
        "campos": campos,
        "img": jnp.concatenate([rgb, mask], -1),
        "background": jnp.zeros((batch, RES, RES, 3)),
    }
    if with_extras:
        # deliberately disagreeing supervision → nonzero losses
        t["invdepth"] = jnp.full((batch, RES, RES, 1), 0.7) * mask
        t["img_second"] = jnp.concatenate([rgb * 0.3, mask], -1)
        t["invdepth_second"] = jnp.full((batch, RES, RES, 1), 0.6) * mask
    return t


def _tick(geo, gcfg, target, key=0):
    mat_cfg = _mat_cfg()
    flags = RenderFlags(
        resolution=(RES, RES), n_samples=2, bsdf="diffuse",
        use_denoiser=False, raster_chunk=256,
    )
    k = jax.random.PRNGKey(key)
    k1, k2, k3 = jax.random.split(k, 3)
    params = geo.init_params(k1)
    mat_params = init_mlp_texture(k2, mat_cfg)
    light = update_pdf(jax.random.uniform(k3, (8, 16, 3)) + 0.25)
    loss_fn = create_loss("logl1")

    def run(params):
        img, depth, reg, aux = geo.tick(
            jax.random.PRNGKey(5), params, mat_params, mat_cfg, light,
            target, jnp.asarray(100), flags, loss_fn,
            shadow_scale=0.0,
        )
        return img + depth + reg, (img, depth, reg, aux)

    (total, (img, depth, reg, aux)), grads = jax.jit(
        jax.value_and_grad(run, has_aux=True)
    )(params)
    return total, img, depth, reg, aux, grads


@pytest.mark.slow
def test_depth_and_second_layer_losses_tets():
    gcfg = GeometryConfig(
        grid_res=GRID, use_sdf_mlp=False, use_eikonal=False,
        use_depth=True, use_img_2nd_layer=True, use_depth_2nd_layer=True,
    )
    geo = GShellGeometry(gcfg)
    target = _target()
    total, img, depth, reg, aux, grads = _tick(geo, gcfg, target)
    assert np.isfinite(float(total))
    # mismatched invdepth supervision ⇒ depth term fires
    assert float(depth) > 1e-4, f"depth_loss = {float(depth)}"
    g = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in g)
    assert any(float(jnp.abs(jnp.asarray(x)).sum()) > 0 for x in g)


@pytest.mark.slow
def test_depth_loss_off_by_default():
    gcfg = GeometryConfig(grid_res=GRID, use_sdf_mlp=False, use_eikonal=False)
    geo = GShellGeometry(gcfg)
    target = _target(with_extras=True)
    total, img, depth, reg, aux, grads = _tick(geo, gcfg, target)
    assert float(depth) == 0.0


@pytest.mark.slow
def test_flexicubes_eikonal_fires():
    from gshell_tpu.geometry.flexi_geometry import (
        FlexiGeometryConfig,
        GShellFlexiGeometry,
    )

    fcfg = FlexiGeometryConfig(
        grid_res=8, use_sdf_mlp=True, use_eikonal=True,
        n_eikonal_samples=128,
        mlp=MLPConfig(n_freq=2, d_hidden=16, n_hidden=2, skip_in=()),
        use_depth=True,
    )
    geo = GShellFlexiGeometry(fcfg)
    params = geo.pretrain_sdf(geo.init_params(jax.random.PRNGKey(0)), steps=60)
    mat_cfg = _mat_cfg()
    flags = RenderFlags(
        resolution=(RES, RES), n_samples=2, bsdf="diffuse",
        use_denoiser=False, raster_chunk=256,
    )
    mat_params = init_mlp_texture(jax.random.PRNGKey(1), mat_cfg)
    light = update_pdf(jax.random.uniform(jax.random.PRNGKey(2), (8, 16, 3)) + 0.25)
    target = _target()

    def run(params):
        img, depth, reg, aux = geo.tick(
            jax.random.PRNGKey(5), params, mat_params, mat_cfg, light,
            target, jnp.asarray(100), flags, create_loss("logl1"),
            shadow_scale=0.0,
        )
        return img + depth + reg, aux

    (total, aux), grads = jax.jit(jax.value_and_grad(run, has_aux=True))(params)
    assert np.isfinite(float(total))
    assert float(aux["eik_loss"]) > 0.0, "FlexiCubes Eikonal term inactive"
    # Eikonal gradient must reach the SDF MLP
    gnet = jax.tree_util.tree_leaves(grads["sdf_net"])
    assert any(float(jnp.abs(x).sum()) > 0 for x in gnet)
