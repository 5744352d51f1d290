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
