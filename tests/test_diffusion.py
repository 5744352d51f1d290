"""Diffusion subsystem tests: UNet shapes, VPSDE math, DDIM recovery,
data-parallel training step over the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gshell_tpu.models.sde import make_vpsde, perturb, ddim_step
from gshell_tpu.models.sampling import ddim_timesteps, get_ddim_sampler
from gshell_tpu.models.unet3d import UNet3D, UNet3DConfig
from gshell_tpu.train.diffusion import DiffusionTrainConfig, DiffusionTrainer

TINY = UNet3DConfig(
    data_ch=2,
    base_channels=16,
    ch_mult=(1, 2),
    down_block_types=("ResBlock", "AttnResBlock"),
    up_block_types=("AttnResBlock", "ResBlock"),
    num_res_blocks=1,
    num_res_blocks_1st_layer=1,
    dropout=0.0,
)


def test_vpsde_schedule():
    sde = make_vpsde()
    assert sde.discrete_betas.shape == (1000,)
    acp = np.asarray(sde.alphas_cumprod)
    assert acp[0] > 0.999
    assert acp[-1] < 1e-4
    assert (np.diff(acp) < 0).all()


@pytest.mark.slow
def test_unet_shapes():
    d = 8
    model = UNet3D(TINY)
    x = jnp.zeros((2, d, d, d, 2))
    occ = jnp.zeros((2, 2 * d, 2 * d, 2 * d, 1))
    t = jnp.array([0, 500])
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, x, occ, t)
    grid, grid_occ = model.apply(vars_, x, occ, t)
    assert grid.shape == x.shape
    assert grid_occ.shape == occ.shape


def test_ddim_perfect_eps_recovers_x0():
    """With the true ε as the network output, DDIM must walk back to x0."""
    sde = make_vpsde()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 4, 4, 4, 2)) * 0.5
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    seq = np.asarray(ddim_timesteps(sde.N, 50, "quad"))
    t0 = int(seq[0])
    x = np.asarray(perturb(sde, x0, jnp.array([t0]), noise))
    x = jnp.asarray(x)
    for i, t in enumerate(seq):
        tp = seq[i + 1] if i + 1 < len(seq) else 0
        x, x0p = ddim_step(sde, x, noise, int(t), int(tp))
    # quad schedule starts at t≈0.8N, so recovery carries a small
    # discretization bias; 0.05 bounds it comfortably.
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=0.05)


@pytest.mark.slow
def test_trainer_step_on_mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    d = 8
    cfg = DiffusionTrainConfig(
        grid_size=d, data_ch=2, use_occ=True, num_grad_acc_steps=2, warmup=10
    )
    trainer = DiffusionTrainer(cfg, unet_cfg=TINY)
    state = trainer.init_state(jax.random.PRNGKey(0))
    a, b = 2, 8  # microbatches × global batch (sharded over 8 devices)
    batch = {
        "grid": jnp.ones((a, b, d, d, d, 2)) * 0.1,
        "occgrid": jnp.ones((a, b, 2 * d, 2 * d, 2 * d, 1)) * 0.1,
    }
    from gshell_tpu.parallel.sharding import shard_batch

    batch = {
        k: jax.device_put(
            v,
            jax.sharding.NamedSharding(
                trainer.mesh, jax.sharding.PartitionSpec(None, "data")
            ),
        )
        for k, v in batch.items()
    }
    losses = []
    for i in range(3):
        state, m = trainer.train_step(state, jax.random.PRNGKey(i), batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3
    assert int(state.ema.num_updates) == 3


def test_ddim_sampler_runs():
    d = 4
    sde = make_vpsde(n=100)

    def eps_fn(x, x_occ, labels):
        return jnp.zeros_like(x), jnp.zeros_like(x_occ)

    sampler = get_ddim_sampler(
        sde, eps_fn, (1, d, d, d, 2), (1, 2 * d, 2 * d, 2 * d, 1), n_steps=10
    )
    x, occ = jax.jit(sampler)(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(x)).all()
    assert np.isfinite(np.asarray(occ)).all()


def test_distributed_grid_sampler(tmp_path):
    """DistributedGridSampler assembles the correctly-sharded global batch
    from per-device shard loads, identically to a direct full-batch load
    (ref trainer_ddp.py:79-83 DistributedSampler role)."""
    import numpy as np

    from gshell_tpu.data.multihost import DistributedGridSampler
    from gshell_tpu.parallel.sharding import make_mesh

    d = 4
    files = []
    rng = np.random.default_rng(0)
    for i in range(5):
        f = tmp_path / f"g{i}.npz"
        np.savez(
            f,
            grid=rng.normal(size=(d, d, d, 2)).astype(np.float32),
            occgrid=rng.normal(size=(2 * d, 2 * d, 2 * d)).astype(np.float32),
        )
        files.append(str(f))

    mesh = make_mesh(8)
    acc, b = 2, 8
    sampler = DistributedGridSampler(files, mesh, d, acc, b, seed=7)
    batch = sampler()
    assert batch["grid"].shape == (acc, b, d, d, d, 2)
    assert batch["occgrid"].shape == (acc, b, 2 * d, 2 * d, 2 * d, 1)
    # batch axis sharded over the data axis
    assert batch["grid"].sharding.spec == jax.sharding.PartitionSpec(None, "data")

    # content matches the same seeded draw done directly
    idx = np.random.default_rng((7, 0)).integers(len(files), size=acc * b)
    want = np.stack([np.load(files[i])["grid"] for i in idx]).reshape(
        acc, b, d, d, d, 2
    )
    np.testing.assert_allclose(np.asarray(batch["grid"]), want, rtol=1e-6)
    # second call advances the step-seeded draw
    batch2 = sampler()
    assert not np.allclose(np.asarray(batch2["grid"]), want)


def test_restore_migrates_old_groupnorm_checkpoint(tmp_path):
    """Checkpoints saved before the GroupNormF32 rewrite stored scale/bias
    under a nested GroupNorm_0 submodule; restore must rename those leaves
    into the current flat layout (ADVICE r4, unet3d.py:75)."""
    from gshell_tpu.train.diffusion import (
        _unwrap_groupnorm,
        _wrap_groupnorm_template,
    )

    d = 8
    unet_cfg = UNet3DConfig(
        data_ch=2, base_channels=8, ch_mult=(1, 2),
        down_block_types=("ResBlock", "ResBlock"),
        up_block_types=("ResBlock", "ResBlock"),
        num_res_blocks=1, num_res_blocks_1st_layer=1, dropout=0.0,
    )
    cfg = DiffusionTrainConfig(
        grid_size=d, data_ch=2, use_occ=True, num_grad_acc_steps=1, warmup=10
    )
    trainer = DiffusionTrainer(cfg, unet_cfg=unet_cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    # wrap/unwrap are exact inverses and actually touch GroupNorm leaves
    wrapped = _wrap_groupnorm_template(state)
    flat_new = jax.tree_util.tree_structure(state)
    flat_old = jax.tree_util.tree_structure(wrapped)
    assert flat_new != flat_old
    roundtrip = _unwrap_groupnorm(wrapped)
    assert jax.tree_util.tree_structure(roundtrip) == flat_new

    # simulate an OLD checkpoint on disk: save the wrapped (old-layout) state
    import orbax.checkpoint as ocp

    ckpt = str(tmp_path / "old-format")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt, wrapped, force=True)
    ckptr.wait_until_finished()

    # restoring against the NEW-layout template must migrate transparently
    trainer2 = DiffusionTrainer(cfg, unet_cfg=unet_cfg)
    state2 = trainer2.init_state(jax.random.PRNGKey(1))
    restored = trainer2.restore_checkpoint(ckpt, state2)
    assert jax.tree_util.tree_structure(restored) == flat_new
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # and the migrated state steps
    batch = {
        "grid": jnp.ones((1, 2, d, d, d, 2)) * 0.1,
        "occgrid": jnp.ones((1, 2, 2 * d, 2 * d, 2 * d, 1)) * 0.1,
    }
    restored, m = trainer2.train_step(restored, jax.random.PRNGKey(3), batch)
    assert jnp.isfinite(float(m["loss"]))


def test_train_step_rejects_accum_axis_mismatch():
    """A>1 microbatches with num_grad_acc_steps==1 must be a loud error, not
    silently dropped microbatches (ADVICE r4, diffusion.py:147)."""
    d = 8
    unet_cfg = UNet3DConfig(
        data_ch=2, base_channels=8, ch_mult=(1, 2),
        down_block_types=("ResBlock", "ResBlock"),
        up_block_types=("ResBlock", "ResBlock"),
        num_res_blocks=1, num_res_blocks_1st_layer=1, dropout=0.0,
    )
    cfg = DiffusionTrainConfig(
        grid_size=d, data_ch=2, use_occ=True, num_grad_acc_steps=1, warmup=10
    )
    trainer = DiffusionTrainer(cfg, unet_cfg=unet_cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = {
        "grid": jnp.ones((2, 2, d, d, d, 2)) * 0.1,
        "occgrid": jnp.ones((2, 2, 2 * d, 2 * d, 2 * d, 1)) * 0.1,
    }
    with pytest.raises(ValueError, match="accumulation"):
        trainer.train_step(state, jax.random.PRNGKey(1), batch)


@pytest.mark.parametrize("up_split,up_blocks", [(0, 0), (1, 0), (1, 1)])
def test_segmented_step_matches_monolithic(up_split, up_blocks):
    """cfg.segmented_grad compiles the step as four half-sized programs
    (the 128^3 monolithic backward crashes the axon compile helper); the
    chained result must match train_step exactly — same perturbation draws
    (sample_perturbation shares the key splits) and same dropout (flax
    folds by module path, identical across segments)."""
    d = 8
    unet_cfg = UNet3DConfig(
        data_ch=2, base_channels=8, ch_mult=(1, 2),
        down_block_types=("ResBlock", "AttnResBlock"),
        up_block_types=("AttnResBlock", "ResBlock"),
        num_res_blocks=1, num_res_blocks_1st_layer=1, dropout=0.1,
        remat=True, compute_dtype="bfloat16",
    )
    cfg = DiffusionTrainConfig(
        grid_size=d, data_ch=2, use_occ=True, num_grad_acc_steps=1, warmup=10,
        segmented_up_split=up_split,
        segmented_up_split_blocks=up_blocks,
    )
    batch = {
        "grid": jax.random.normal(jax.random.PRNGKey(5), (1, 2, d, d, d, 2)),
        "occgrid": jax.random.normal(
            jax.random.PRNGKey(6), (1, 2, 2 * d, 2 * d, 2 * d, 1)
        ),
    }
    key = jax.random.PRNGKey(11)

    tr_a = DiffusionTrainer(cfg, unet_cfg=unet_cfg)
    st_a = tr_a.init_state(jax.random.PRNGKey(0))
    st_a, m_a = tr_a.train_step(st_a, key, batch)

    tr_b = DiffusionTrainer(cfg, unet_cfg=unet_cfg)
    st_b = tr_b.init_state(jax.random.PRNGKey(0))
    st_b, m_b = tr_b.train_step_segmented(st_b, key, batch)

    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(st_a.params),
        jax.tree_util.tree_leaves(st_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-7,
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(st_a.ema),
        jax.tree_util.tree_leaves(st_b.ema),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-7,
        )
