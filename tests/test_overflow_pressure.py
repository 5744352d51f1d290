"""Slot-budget saturation under pressure.

The extractor's fixed capacities (``default_capacities``: 24·res² tets,
12·res² crossing edges, scaled by ``capacity_safety``) trade linear tail cost
for a hard cap — geometry beyond the cap is silently dropped, which is exactly
how thin-garment topologies would rot at low safety factors.  These tests
drive a high-surface-area gyroid iso-surface (≈3 sheets through the volume —
far beyond the ~1-sheet budget model measured on sphere/wavy shapes) into a
reduced-safety extractor and assert the monitors the training loop relies on
(``n_valid_tets`` true count, ``tet_slot_overflow``/``edge_slot_overflow`` in
the tick metrics) actually fire BEFORE silhouettes degrade silently.

Reference contrast: the reference's CUDA extractor is exact-by-construction
(dynamic shapes, ``geometry/gshell_tets.py:266-276``), so it has no analogue
of these budgets — the monitors are the TPU build's substitute for that
guarantee.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.ops import math as gmath
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.render.material import MLPTexture3DConfig, default_kd_ks_min_max
from gshell_tpu.render.render import RenderFlags
from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig

GRID = 24


def gyroid_sdf(verts: jax.Array, k: float = 1.5) -> jax.Array:
    """Triply-periodic gyroid: surface area ≈ 3× a sphere's at k=2 periods —
    a worst-case stand-in for thin multi-sheet garment topology."""
    x, y, z = (verts[:, i] * (2.0 * np.pi * k / 1.4) for i in range(3))
    return (
        jnp.sin(x) * jnp.cos(y) + jnp.sin(y) * jnp.cos(z) + jnp.sin(z) * jnp.cos(x)
    ) * 0.2


def make_geo(safety: float) -> GShellGeometry:
    return GShellGeometry(
        GeometryConfig(
            grid_res=GRID,
            use_sdf_mlp=False,
            use_eikonal=False,
            n_eikonal_samples=256,
            capacity_safety=safety,
            total_iters=100,
        )
    )


def extract(geo: GShellGeometry):
    params = geo.init_params(jax.random.PRNGKey(0))
    params["sdf"] = gyroid_sdf(geo.verts)
    params["msdf"] = jnp.ones_like(params["msdf"])  # keep every face (no cut)
    return params, jax.jit(geo.get_mesh)(params)


def test_true_counts_exceed_reduced_budgets():
    """n_valid_tets / n_crossing_edges report the TRUE demand, not the
    clamped slot usage — saturation is observable, not hidden."""
    geo = make_geo(0.25)
    _, mesh = extract(geo)
    assert int(mesh.n_valid_tets) >= geo.extractor.max_tets, (
        int(mesh.n_valid_tets),
        geo.extractor.max_tets,
    )
    assert int(mesh.n_crossing_edges) >= geo.extractor.max_verts


def test_saturation_drops_geometry_and_raised_budget_recovers():
    """The same field under raised budgets emits strictly more valid faces —
    i.e. the reduced-budget mesh really did lose geometry (the failure mode
    the monitors exist to surface).  capacity_safety > 1 is the documented
    escape hatch for multi-sheet topologies (still capped at the full grid)."""
    n_faces = {}
    for safety in (0.25, 2.0):
        geo = make_geo(safety)
        _, mesh = extract(geo)
        n_faces[safety] = int(jnp.sum(mesh.face_valid))
        sat = int(mesh.n_valid_tets) >= geo.extractor.max_tets
        assert sat == (safety == 0.25)
    assert n_faces[2.0] > n_faces[0.25] * 1.5, n_faces


def test_edge_budget_saturates_first_at_defaults():
    """Budget-guidance regression (measured, grid 24): the default budgets
    give tets 24/9 ≈ 2.67 sheet-equivalents of headroom but crossing edges
    only 12/6 = 2.0 — so for multi-sheet fields the EDGE monitor is the one
    that fires first.  A gyroid at ~2.4 sheet-equivalents (k=1.0) fits the
    tet budget (≈90%) and overflows the edge budget (≈123%).  If
    default_capacities' ratios change, update this test and the guidance in
    its docstring together."""
    geo = make_geo(1.0)
    params = geo.init_params(jax.random.PRNGKey(0))
    params["sdf"] = gyroid_sdf(geo.verts, k=1.0)
    params["msdf"] = jnp.ones_like(params["msdf"])
    mesh = jax.jit(geo.get_mesh)(params)
    assert int(mesh.n_valid_tets) < geo.extractor.max_tets
    assert int(mesh.n_crossing_edges) >= geo.extractor.max_verts


def test_monitors_fire_in_train_metrics():
    """End-to-end: the tick/train_step metric stream carries
    tet_slot_overflow/edge_slot_overflow=1 the moment budgets saturate, and 0
    on the healthy control — training logs surface the rot, silently-wrong
    silhouettes are not possible without a visible flag."""
    res = 32
    mat_cfg = MLPTexture3DConfig(
        channels=6,
        internal_dims=16,
        hidden=2,
        hash=HashGridConfig(
            n_levels=4, log2_table_size=12, base_resolution=4, desired_resolution=32
        ),
        min_max=default_kd_ks_min_max(),
    )
    flags = RenderFlags(
        resolution=(res, res), n_samples=2, bsdf="diffuse", use_denoiser=False,
        raster_chunk=512,
    )
    proj = gmath.perspective(np.deg2rad(45.0), 1.0, 0.1, 10.0)
    view = gmath.lookat(
        jnp.array([0.0, 0.0, 2.2]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    target = {
        "mvp": (proj @ view)[None],
        "campos": jnp.array([[0.0, 0.0, 2.2]]),
        "img": jnp.ones((1, res, res, 4)) * 0.5,
        "background": jnp.zeros((1, res, res, 3)),
    }

    overflow = {}
    for safety in (0.25, 2.0):
        geo = make_geo(safety)
        rec = Reconstructor(geo, mat_cfg, flags, TrainConfig(batch=1, use_shadows=False))
        state = rec.init_state(jax.random.PRNGKey(0), pretrain_steps=0)
        pg = dict(state.params_geo)
        pg["sdf"] = gyroid_sdf(geo.verts)
        pg["msdf"] = jnp.ones_like(pg["msdf"])
        state = state._replace(params_geo=pg)
        _, m = rec.train_step(state, jax.random.PRNGKey(1), target)
        overflow[safety] = (
            int(m["tet_slot_overflow"]),
            int(m["edge_slot_overflow"]),
        )
        assert np.isfinite(float(m["total"]))
    assert overflow[0.25] == (1, 1), overflow
    assert overflow[2.0] == (0, 0), overflow
