import jax
import jax.numpy as jnp
import numpy as np

from gshell_tpu.models.evaler import cond_gen
from gshell_tpu.models.likelihood import ode_log_likelihood
from gshell_tpu.models.registry import create_model, get_score_fn, register_model
from gshell_tpu.models.sde import make_vpsde


def test_registry():
    @register_model(name="dummy")
    class Dummy:
        pass

    assert isinstance(create_model("dummy"), Dummy)
    from gshell_tpu.models.unet3d import UNet3D

    assert create_model("unet3d_occgrid", None).__class__ is UNet3D


def test_score_fn_noise_conversion():
    sde = make_vpsde(n=100)

    def apply_fn(params, x, x_occ, labels):
        return jnp.ones_like(x) * 0.1, None

    score_fn = get_score_fn(sde, apply_fn, "noise")
    x = jnp.zeros((2, 4, 4, 4, 1))
    labels = jnp.array([10, 50])
    s, _ = score_fn(None, x, None, labels)
    std = np.asarray(sde.sqrt_1m_alphas_cumprod)[np.asarray(labels)]
    np.testing.assert_allclose(
        np.asarray(s)[:, 0, 0, 0, 0], -0.1 / std, rtol=1e-5
    )


def test_cond_gen_preserves_condition():
    # n >= 100 keeps beta_N < 1 (beta_max/N); tiny N is out of the
    # schedule's domain (sqrt(1-beta) -> 0)
    sde = make_vpsde(n=100)
    shape = (1, 4, 4, 4, 1)
    cond = jnp.ones(shape) * 0.5
    mask = jnp.zeros(shape).at[:, :2].set(1.0)

    def eps_fn(x, x_occ, labels):
        return jnp.zeros_like(x), None

    out, out_occ = cond_gen(sde, eps_fn, cond, mask, jax.random.PRNGKey(0), shape)
    assert out_occ is None
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # known region ends at the re-noised condition at t=0 → close to cond
    np.testing.assert_allclose(out[:, :2], 0.5, atol=0.2)


def test_cond_gen_samples_occ_jointly():
    """cond_gen denoises the dual-head occ grid alongside the feature grid
    (ref sde_lib.py:176-203 paired conditional branch) and can inpaint a
    known occupancy region."""
    sde = make_vpsde(n=100)
    shape = (1, 4, 4, 4, 1)
    occ_shape = (1, 8, 8, 8, 1)
    cond = jnp.ones(shape) * 0.5
    mask = jnp.zeros(shape).at[:, :2].set(1.0)
    occ_cond = jnp.ones(occ_shape) * -0.5
    occ_cmask = jnp.zeros(occ_shape).at[:, :4].set(1.0)

    def eps_fn(x, x_occ, labels):
        return jnp.zeros_like(x), jnp.zeros_like(x_occ)

    out, out_occ = cond_gen(
        sde, eps_fn, cond, mask, jax.random.PRNGKey(0), shape,
        occ_shape=occ_shape, occ_condition=occ_cond, occ_cond_mask=occ_cmask,
    )
    out_occ = np.asarray(out_occ)
    assert out_occ.shape == occ_shape
    assert np.isfinite(out_occ).all()
    np.testing.assert_allclose(out_occ[:, :4], -0.5, atol=0.2)


def test_likelihood_gaussian():
    """For score of a standard normal (score = -x), logp should match the
    analytic N(0, I) log-density reasonably."""
    sde = make_vpsde(n=100)
    x = jnp.zeros((2, 2, 2, 1))

    def score_fn(xx, t):
        return -xx  # exact for the VPSDE prior at all t when data is N(0,I)

    logp, z = ode_log_likelihood(sde, score_fn, x, jax.random.PRNGKey(0), n_steps=50)
    n = x.size
    analytic = -0.5 * n * np.log(2 * np.pi)
    assert np.isfinite(float(logp))
    assert abs(float(logp) - analytic) < 0.5 * n


def test_ald_corrector_schedule_step_size():
    """The true ald corrector (ref sampling.py:292-325) uses the schedule-level
    step size (snr*std_t)^2 * 2 * alpha_t — independent of the score magnitude —
    unlike the langevin corrector whose step adapts to the grad/noise norm ratio."""
    from gshell_tpu.models.sampling import (
        CORRECTORS, ald_corrector_step, langevin_corrector_step)

    assert CORRECTORS["ald"] is ald_corrector_step
    assert CORRECTORS["ald"] is not langevin_corrector_step

    sde = make_vpsde(n=100)
    t = 60
    snr = 0.075
    x = jnp.zeros((1, 4, 4, 4, 2))

    # eps prediction of zero => score = 0 => x_new = 0 + sqrt(2*step)*noise.
    def eps_fn(xx, timestep):
        return jnp.zeros_like(xx)

    key = jax.random.PRNGKey(3)
    out = ald_corrector_step(sde, key, x, eps_fn, t, snr=snr, n_steps=1)
    # Recompute analytically with the same rng stream.
    k, k1 = jax.random.split(key)
    noise = jax.random.normal(k1, x.shape)
    std = sde.sqrt_1m_alphas_cumprod[t]
    alpha = sde.alphas[t]
    step = (snr * std) ** 2 * 2 * alpha
    expected = jnp.sqrt(2 * step) * noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-6)

    # With a large constant eps (score), langevin's adaptive step differs from
    # ald's schedule step: check ald is insensitive to score scale.
    def eps_big(xx, timestep):
        return 100.0 * jnp.ones_like(xx)

    out_small = ald_corrector_step(sde, key, x, eps_fn, t, snr=snr)
    out_big = ald_corrector_step(sde, key, x, eps_big, t, snr=snr)
    # deterministic difference = step * (score_big - score_small); step is the
    # SAME schedule value in both (no norm adaptation).
    diff = np.asarray(out_big - out_small)
    expected_diff = float(step * (-100.0 / std))
    np.testing.assert_allclose(diff, expected_diff, rtol=1e-4)
