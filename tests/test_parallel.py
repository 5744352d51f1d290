"""Sharding tests on the 8-virtual-device CPU mesh: pixel-sharded shading
parity and FSDP parameter layouts."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gshell_tpu.ops.shade import env_shade
from gshell_tpu.parallel.sharding import fsdp_sharding, make_mesh
from gshell_tpu.parallel.spatial import pixel_sharded_shade
from gshell_tpu.render.light import update_pdf


def test_pixel_sharded_shade_matches_single():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    light = update_pdf(jnp.full((16, 32, 3), 1.0))
    p = 64  # divisible by 8
    key = jax.random.PRNGKey(0)
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (p, 1))
    pos = jnp.zeros((p, 3))
    view = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (p, 1))
    kd = jnp.ones((p, 3)) * 0.5
    ks = jnp.stack([jnp.zeros(p), jnp.full(p, 0.5), jnp.zeros(p)], -1)
    mask = jnp.ones((p, 1))

    kwargs = dict(n_samples_x=2, bsdf="diffuse", shadow_scale=0.0)
    ref = env_shade(key, mask, pos, pos, nrm, view, kd, ks, light, **kwargs)

    sharded = pixel_sharded_shade(env_shade, mesh)
    out = jax.jit(lambda *a: sharded(key, *a, light=light, **kwargs))(
        mask, pos, pos, nrm, view, kd, ks
    )
    # Same estimator, different per-shard RNG lanes → agreement in expectation;
    # diffuse mean must match closely under the furnace condition
    np.testing.assert_allclose(
        float(out.diffuse.mean()), float(ref.diffuse.mean()), rtol=0.1
    )
    assert out.diffuse.shape == ref.diffuse.shape


def test_fsdp_sharding_layout():
    mesh = make_mesh()
    params = {
        "big": jnp.zeros((1024, 256)),
        "small": jnp.zeros((8, 8)),
        "odd": jnp.zeros((1023, 131)),  # not divisible → replicated
    }
    shardings = fsdp_sharding(mesh, params, min_size=1024)
    big = shardings["big"].spec
    assert "data" in str(big)
    assert str(shardings["small"].spec) == "PartitionSpec()"
    assert str(shardings["odd"].spec) == "PartitionSpec()"
    # placing works
    placed = jax.device_put(params["big"], shardings["big"])
    assert placed.sharding.num_devices == 8


@pytest.mark.slow
def test_multislice_diffusion_step():
    """2 slices × 4 chips (DCN × ICI mesh): one diffusion train step with the
    batch sharded over the combined grid; grads psum hierarchically."""
    import jax
    import jax.numpy as jnp

    from gshell_tpu.models.unet3d import UNet3DConfig
    from gshell_tpu.parallel.sharding import (
        make_mesh_multislice,
        multislice_data_sharding,
    )
    from gshell_tpu.train.diffusion import DiffusionTrainConfig, DiffusionTrainer

    mesh = make_mesh_multislice(2, 4)
    assert mesh.shape == {"dcn": 2, "data": 4}
    d = 8
    unet_cfg = UNet3DConfig(
        data_ch=2, base_channels=8, ch_mult=(1, 2),
        down_block_types=("ResBlock", "AttnResBlock"),
        up_block_types=("AttnResBlock", "ResBlock"),
        num_res_blocks=1, num_res_blocks_1st_layer=1, dropout=0.0,
    )
    cfg = DiffusionTrainConfig(
        grid_size=d, data_ch=2, use_occ=True, num_grad_acc_steps=2, warmup=10
    )
    trainer = DiffusionTrainer(cfg, unet_cfg=unet_cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))

    a, b = 2, 8  # grad-accum × global batch (sharded over 2×4 devices)
    sh = multislice_data_sharding(mesh)
    batch = {
        "grid": jax.device_put(jnp.ones((a, b, d, d, d, 2)) * 0.1,
                               jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, ("dcn", "data")))),
        "occgrid": jax.device_put(jnp.ones((a, b, 2 * d, 2 * d, 2 * d, 1)) * 0.1,
                                  jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, ("dcn", "data")))),
    }
    del sh
    state, metrics = trainer.train_step(state, jax.random.PRNGKey(1), batch)
    assert jnp.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_preemption_kill_resume(tmp_path):
    """Preemption semantics (SURVEY §5.3): train → meta-checkpoint →
    'process death' (fresh trainer + fresh init) → restore → the restored
    state continues from the checkpointed step with identical params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gshell_tpu.models.unet3d import UNet3DConfig
    from gshell_tpu.train.diffusion import DiffusionTrainConfig, DiffusionTrainer

    d = 8
    unet_cfg = UNet3DConfig(
        data_ch=2, base_channels=8, ch_mult=(1, 2),
        down_block_types=("ResBlock", "AttnResBlock"),
        up_block_types=("AttnResBlock", "ResBlock"),
        num_res_blocks=1, num_res_blocks_1st_layer=1, dropout=0.0,
    )
    cfg = DiffusionTrainConfig(
        grid_size=d, data_ch=2, use_occ=True, num_grad_acc_steps=1, warmup=10
    )
    batch = {
        "grid": jnp.ones((1, 2, d, d, d, 2)) * 0.1,
        "occgrid": jnp.ones((1, 2, 2 * d, 2 * d, 2 * d, 1)) * 0.1,
    }
    ckpt = str(tmp_path / "checkpoints-meta")

    trainer = DiffusionTrainer(cfg, unet_cfg=unet_cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    for i in range(2):
        state, _ = trainer.train_step(state, jax.random.PRNGKey(10 + i), batch)
    trainer.save_checkpoint(ckpt, state)
    params_saved = jax.tree_util.tree_map(np.asarray, state.params)
    # one more (lost) step after the snapshot — "killed" before next save
    # (train_step DONATES state; read through params_saved from here on)
    state_lost, _ = trainer.train_step(state, jax.random.PRNGKey(99), batch)

    # fresh process: new trainer, fresh init, graceful restore
    trainer2 = DiffusionTrainer(cfg, unet_cfg=unet_cfg)
    state2 = trainer2.init_state(jax.random.PRNGKey(1))  # different init
    state2 = trainer2.restore_checkpoint(ckpt, state2)
    assert int(state2.step) == 2
    l0 = jax.tree_util.tree_leaves(params_saved)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l0, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # resumed training proceeds
    state2, m = trainer2.train_step(state2, jax.random.PRNGKey(99), batch)
    assert int(state2.step) == 3 and jnp.isfinite(float(m["loss"]))
    # graceful no-checkpoint path returns state unchanged
    state3 = trainer2.restore_checkpoint(str(tmp_path / "missing"), state2)
    assert state3 is state2


def _banded_setup(res=64, grid=16, batch=2):
    from jax.sharding import Mesh

    from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
    from gshell_tpu.ops import math as gmath
    from gshell_tpu.ops.hashgrid import HashGridConfig
    from gshell_tpu.render.material import (
        MLPTexture3DConfig,
        default_kd_ks_min_max,
    )
    from gshell_tpu.render.render import RenderFlags

    gcfg = GeometryConfig(
        grid_res=grid, use_sdf_mlp=False, use_eikonal=False,
        n_eikonal_samples=512,
    )
    geo = GShellGeometry(gcfg)
    mat_cfg = MLPTexture3DConfig(
        channels=6,
        hash=HashGridConfig(n_levels=4, log2_table_size=12, base_resolution=4,
                            desired_resolution=64),
        min_max=default_kd_ks_min_max(),
    )
    flags = RenderFlags(
        resolution=(res, res), n_samples=2, bsdf="pbr", use_denoiser=False,
        raster_chunk=256, tiled_raster=True, max_per_tile=256,
    )
    proj = gmath.perspective(np.deg2rad(45.0), 1.0, 0.1, 1000.0)
    views = []
    for i in range(batch):
        ang = 0.3 * i
        eye = jnp.array([2.5 * np.sin(ang), 0.0, 2.5 * np.cos(ang)])
        views.append((proj @ gmath.lookat(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])), eye))
    mvp = jnp.stack([v[0] for v in views])
    campos = jnp.stack([v[1] for v in views])
    ys, xs = jnp.meshgrid(jnp.arange(res), jnp.arange(res), indexing="ij")
    r = jnp.sqrt((xs - res / 2) ** 2 + (ys - res / 2) ** 2)
    m = (r < 0.3 * res).astype(jnp.float32)[None, ..., None].repeat(batch, 0)
    img = jnp.concatenate([jnp.ones((batch, res, res, 3)) * 0.5 * m, m], -1)
    target = {
        "mvp": mvp, "campos": campos, "img": img,
        "background": jnp.zeros((batch, res, res, 3)),
    }
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("view", "band"))
    return geo, mat_cfg, flags, target, mesh


@pytest.mark.slow
def test_banded_render_matches_unsharded():
    """Deterministic buffers (kd shading, mask, msdf image, invdepth) from the
    (view × band) sharded render equal the unsharded render exactly, modulo
    the documented 1-row edge effect at image rows 0 / H−1."""
    from gshell_tpu.render.light import update_pdf

    geo, mat_cfg, flags, target, mesh = _banded_setup()
    flags = flags._replace(bsdf="kd")
    params = geo.init_params(jax.random.PRNGKey(0))
    from gshell_tpu.render.material import init_mlp_texture

    mat_params = init_mlp_texture(jax.random.PRNGKey(1), mat_cfg)
    light = update_pdf(jnp.full((8, 16, 3), 1.0))
    key = jax.random.PRNGKey(2)

    def run(spatial_mesh):
        return geo.tick(
            key, params, mat_params, mat_cfg, light, target,
            jnp.zeros((), jnp.int32), flags, lambda a, b: jnp.mean((a - b) ** 2),
            visibility_fn=None, shadow_scale=0.0,
            spatial_mesh=spatial_mesh,
        )

    # compare the underlying buffers through a probe: render directly
    from gshell_tpu.ops.mesh_ops import auto_normals, compact_faces
    from gshell_tpu.render.render import render_mesh

    mesh_g = geo.extractor(*geo.fields(params), watertight_template=True,
                           compute_aug_normals=False, compute_tangents=False)
    faces_c, fvalid_c, _ = compact_faces(
        mesh_g.faces, mesh_g.face_valid, cap=geo.extractor.max_tets
    )
    v_nrm = auto_normals(mesh_g.verts, faces_c, fvalid_c)

    def render_view(k, mvp, campos, bg, flags_):
        return render_mesh(
            k, mesh_g.verts, faces_c, v_nrm, mesh_g.msdf, mat_params, mat_cfg,
            mvp, campos, light, flags_, background=bg, shadow_scale=0.0,
        )

    keys = jax.random.split(key, target["mvp"].shape[0])
    ref = [
        render_view(keys[i], target["mvp"][i], target["campos"][i],
                    target["background"][i], flags)
        for i in range(2)
    ]

    from gshell_tpu.parallel.spatial import render_batch_banded

    def render_band(c, k, mvp_b, campos_b, bg_b, band_res):
        return render_view(k, mvp_b, campos_b, bg_b,
                           flags._replace(resolution=band_res))

    nb = mesh.shape["band"]
    keys_vb = jax.vmap(lambda kk: jax.random.split(kk, nb))(keys)
    if jnp.issubdtype(keys_vb.dtype, jax.dtypes.prng_key):
        keys_vb = jax.random.key_data(keys_vb)
    out = render_batch_banded(
        mesh, render_band, {}, keys_vb, target["mvp"], target["campos"],
        target["background"], flags.resolution,
    )
    for name in ("shaded", "mask", "msdf_image", "invdepth"):
        got = np.asarray(out[name])
        want = np.stack([np.asarray(r[name]) for r in ref])
        # The band MVP reproduces pixel geometry up to fp rounding: isolated
        # silhouette pixels may flip coverage (same class of difference as
        # two runs of a hardware rasterizer at different viewports).  Require
        # ≥99% of pixels exactly equal and the flips confined to the
        # silhouette (where mask disagrees or a neighbor does).
        diff = (np.abs(got[:, 1:-1] - want[:, 1:-1]) > 1e-4).any(-1)
        frac = diff.mean()
        assert frac < 0.01, f"{name}: {frac:.4%} pixels differ"
    # visible_vert_mask: OR over all shards == OR over per-view masks
    # (same fp-rounding tolerance: silhouette coverage flips change which
    # triangles are hit, so a handful of boundary verts may differ)
    want_vis = np.asarray(ref[0]["visible_vert_mask"]) | np.asarray(
        ref[1]["visible_vert_mask"]
    )
    got_vis = np.asarray(out["visible_vert_mask"][0])
    assert (got_vis != want_vis).mean() < 0.005


@pytest.mark.slow
def test_banded_train_step_runs():
    """Full sharded reconstruction train step on the (2 view × 4 band) CPU
    mesh: finite loss, finite grads applied, loss comparable to unsharded."""
    from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig

    geo, mat_cfg, flags, target, mesh = _banded_setup()
    tcfg = TrainConfig(batch=2, use_shadows=True, shadow_ko=4)
    rec_sh = Reconstructor(geo, mat_cfg, flags, tcfg, mesh=mesh)
    rec_un = Reconstructor(geo, mat_cfg, flags, tcfg)
    key = jax.random.PRNGKey(0)
    state = rec_sh.init_state(key, pretrain_steps=0)
    state_sh, m_sh = rec_sh.train_step(state, jax.random.PRNGKey(5), target)
    assert np.isfinite(float(m_sh["total"]))
    assert int(state_sh.step) == 1

    state_un, m_un = rec_un.train_step(state, jax.random.PRNGKey(5), target)
    # same estimator, different RNG lanes per band — losses agree loosely
    np.testing.assert_allclose(
        float(m_sh["img_loss"]), float(m_un["img_loss"]), rtol=0.15
    )
    # geometry params actually moved and identically-shaped
    d_sh = jax.tree_util.tree_leaves(state_sh.params_geo)
    d0 = jax.tree_util.tree_leaves(state.params_geo)
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(d_sh, d0)
    )


@pytest.mark.slow
def test_banded_train_step_with_shade_budget():
    """Banded (view × band) sharding composes with foreground compaction:
    each band compacts its own pixels, px_dropped psums across shards."""
    from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig

    geo, mat_cfg, flags, target, mesh = _banded_setup()
    flags = flags._replace(shade_budget=0.75)
    tcfg = TrainConfig(batch=2, use_shadows=False)
    rec = Reconstructor(geo, mat_cfg, flags, tcfg, mesh=mesh)
    state = rec.init_state(jax.random.PRNGKey(0), pretrain_steps=0)
    state, m = rec.train_step(state, jax.random.PRNGKey(5), target)
    assert np.isfinite(float(m["total"]))
    assert int(m["px_dropped"]) >= 0


def test_sharded_extraction_matches_replicated():
    """with_sharding_constraint slot-sharding of the extractor (GSPMD
    partitions the V/MT per-slot stages, outputs all_gathered) produces
    bitwise-identical meshes and field gradients."""
    from jax.sharding import Mesh

    from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry

    geo = GShellGeometry(
        GeometryConfig(grid_res=16, use_sdf_mlp=False, use_eikonal=False)
    )
    ex = geo.extractor
    pos = jnp.asarray(geo.grid.verts)
    sdf = 0.35 - jnp.linalg.norm(pos, axis=-1)
    msdf = jnp.sin(6.0 * pos[:, 1])
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("view", "band"))

    ref = jax.jit(lambda p, s, m: ex(p, s, m))(pos, sdf, msdf)
    sh = jax.jit(lambda p, s, m: ex(p, s, m, shard_mesh=mesh))(pos, sdf, msdf)
    for name in ("faces", "face_valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(sh, name)),
            err_msg=name,
        )
    for name in ("verts", "msdf", "v_nrm"):
        # float buffers: GSPMD partitioning reorders the scatter-add /
        # reduction sums (normals) — equal up to fp association
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(getattr(sh, name)),
            atol=1e-5, err_msg=name,
        )

    def loss(s, m, shard):
        out = ex(pos, s, m, shard_mesh=shard)
        return (out.verts**2).sum() + (out.msdf**2).sum()

    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(
        sdf, msdf, None
    )
    g_sh = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(
        sdf, msdf, mesh
    )
    for a, b in zip(g_ref, g_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_banded_train_step_flexicubes():
    """The (view × band) sharded render also drives the FlexiCubes geometry
    (round-3 scope cut closed): full sharded train step on the 2×4 CPU mesh
    with finite loss/grads, loss matching the unsharded step loosely (same
    estimator, different RNG lanes per band).  FlexiCubes extraction stays
    replicated; only the render shards."""
    from gshell_tpu.geometry.flexi_geometry import (
        FlexiGeometryConfig,
        GShellFlexiGeometry,
    )
    from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig

    _, mat_cfg, flags, target, mesh = _banded_setup()
    gcfg = FlexiGeometryConfig(
        grid_res=12, use_sdf_mlp=False, use_eikonal=False,
        n_eikonal_samples=512,
    )
    geo = GShellFlexiGeometry(gcfg)
    tcfg = TrainConfig(batch=2, use_shadows=True, shadow_ko=4)
    rec_sh = Reconstructor(geo, mat_cfg, flags, tcfg, mesh=mesh)
    rec_un = Reconstructor(geo, mat_cfg, flags, tcfg)
    key = jax.random.PRNGKey(0)
    state = rec_sh.init_state(key, pretrain_steps=0)
    state_sh, m_sh = rec_sh.train_step(state, jax.random.PRNGKey(5), target)
    assert np.isfinite(float(m_sh["total"]))

    state_un, m_un = rec_un.train_step(state, jax.random.PRNGKey(5), target)
    np.testing.assert_allclose(
        float(m_sh["img_loss"]), float(m_un["img_loss"]), rtol=0.15
    )
    d_sh = jax.tree_util.tree_leaves(state_sh.params_geo)
    d0 = jax.tree_util.tree_leaves(state.params_geo)
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(d_sh, d0)
    )
