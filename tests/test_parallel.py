"""Sharding tests on the 8-virtual-device CPU mesh: pixel-sharded shading
parity and FSDP parameter layouts."""
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
