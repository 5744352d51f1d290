"""Stochastic hash-table gradient estimator: exact forward, unbiased grads."""
import jax
import jax.numpy as jnp
import numpy as np

from gshell_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    hashgrid_encode_stochastic,
    init_hashgrid,
)


def setup():
    cfg = HashGridConfig(n_levels=4, log2_table_size=8, base_resolution=4,
                         desired_resolution=32)
    params = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    return cfg, params, x


def test_forward_exact():
    cfg, params, x = setup()
    full = hashgrid_encode(params, x, cfg)
    sto = hashgrid_encode_stochastic(params, x, cfg, jax.random.PRNGKey(2), 0.25)
    np.testing.assert_allclose(np.asarray(full), np.asarray(sto), atol=1e-7)


def test_x_grads_exact():
    cfg, params, x = setup()
    g_full = jax.grad(lambda x_: hashgrid_encode(params, x_, cfg).sum())(x)
    g_sto = jax.grad(
        lambda x_: hashgrid_encode_stochastic(
            params, x_, cfg, jax.random.PRNGKey(2), 0.25
        ).sum()
    )(x)
    # The exact-forward path gathers fp16-packed features (one u32 row for
    # both features — see hashgrid._packed_feature_table), so its x-jacobian
    # is computed from fp16-quantized values: agreement is to fp16 feature
    # precision, not f32-bitwise.
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_sto), atol=1e-5)


def test_table_grads_unbiased():
    cfg, params, x = setup()
    g_exact = jax.grad(
        lambda t: hashgrid_encode(type(params)(t), x, cfg).sum()
    )(params.tables)
    gfn = jax.jit(
        lambda k: jax.grad(
            lambda t: hashgrid_encode_stochastic(
                type(params)(t), x, cfg, k, 0.5
            ).sum()
        )(params.tables)
    )
    acc = jnp.zeros_like(g_exact)
    n = 600
    for i in range(n):
        acc = acc + gfn(jax.random.PRNGKey(100 + i))
    mean = np.asarray(acc / n)
    exact = np.asarray(g_exact)
    denom = np.abs(exact).max()
    assert denom > 0
    # Monte-Carlo mean within a few std-errs of the exact gradient
    err = np.abs(mean - exact).max() / denom
    assert err < 0.25, err


def test_packed_fp16_opt_out_full_precision():
    """packed_fp16=False: exact-forward path gathers f32 tables, so the
    stochastic encode matches hashgrid_encode to f32 round-off (values AND
    x-gradients) — the opt-in parity mode for callers that can't tolerate
    fp16 feature quantization."""
    cfg, params, x = setup()
    cfg = cfg._replace(packed_fp16=False)
    full = hashgrid_encode(params, x, cfg)
    sto = hashgrid_encode_stochastic(params, x, cfg, jax.random.PRNGKey(2), 0.25)
    np.testing.assert_allclose(np.asarray(full), np.asarray(sto), rtol=1e-6, atol=1e-9)
    g_full = jax.grad(lambda x_: hashgrid_encode(params, x_, cfg).sum())(x)
    g_sto = jax.grad(
        lambda x_: hashgrid_encode_stochastic(
            params, x_, cfg, jax.random.PRNGKey(2), 0.25
        ).sum()
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_full), np.asarray(g_sto), rtol=1e-5, atol=1e-8
    )


def test_x_jacobian_matches_autodiff():
    """Custom-VJP x-gradients == autodiff of the plain encode."""
    cfg, params, x = setup()
    from gshell_tpu.ops.hashgrid import hashgrid_encode_x_grads

    def loss_auto(x_):
        return (hashgrid_encode(params, x_, cfg) * jnp.arange(cfg.out_dim)).sum()

    def loss_custom(x_):
        return (hashgrid_encode_x_grads(params, x_, cfg) * jnp.arange(cfg.out_dim)).sum()

    # agreement is to fp16 feature precision: the custom path gathers
    # fp16-packed features (hashgrid._packed_feature_table)
    f_a = loss_auto(x)
    f_c = loss_custom(x)
    np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_c), rtol=1e-4)
    g_a = jax.grad(loss_auto)(x)
    g_c = jax.grad(loss_custom)(x)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_c), rtol=1e-3, atol=1e-5)
