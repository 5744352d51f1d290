"""Probability-flow ODE log-likelihood (twin of
``GMeshDiffusion/lib/diffusion/likelihood.py:26-40``).

The reference integrates the ODE with scipy's solve_ivp on host; here the
integration is a fixed-step RK4 ``lax.scan`` (jittable, TPU-resident) with
the Hutchinson–Skilling divergence estimator.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .sde import VPSDE


def _drift(sde: VPSDE, score_fn: Callable, x, t):
    """Probability-flow ODE drift: f(x,t) − ½ g(t)² ∇log p (VPSDE)."""
    beta_t = sde.beta_0 + t * (sde.beta_1 - sde.beta_0)
    score = score_fn(x, t)
    return -0.5 * beta_t * (x + score)


def ode_log_likelihood(
    sde: VPSDE,
    score_fn: Callable,  # (x, t) -> ∇ log p_t(x)
    x: jax.Array,
    key: jax.Array,
    n_steps: int = 100,
    t0: float = 1e-3,
):
    """Returns (bits/dim is the caller's job) log p(x) estimate and prior z."""
    eps_v = jax.random.rademacher(key, x.shape, dtype=x.dtype)
    dt = (1.0 - t0) / n_steps

    def dynamics(state, t):
        xt, logp = state

        def f(xx):
            return _drift(sde, score_fn, xx, t)

        drift, vjp = jax.vjp(f, xt)
        (eps_grad,) = vjp(eps_v)
        div = jnp.sum(eps_grad * eps_v)
        return drift, div

    def rk4(state, i):
        xt, logp = state
        t = t0 + i * dt
        k1, d1 = dynamics((xt, logp), t)
        k2, d2 = dynamics((xt + 0.5 * dt * k1, logp), t + 0.5 * dt)
        k3, d3 = dynamics((xt + 0.5 * dt * k2, logp), t + 0.5 * dt)
        k4, d4 = dynamics((xt + dt * k3, logp), t + dt)
        xt = xt + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        logp = logp + dt / 6.0 * (d1 + 2 * d2 + 2 * d3 + d4)
        return (xt, logp), None

    (z, delta_logp), _ = jax.lax.scan(rk4, (x, 0.0), jnp.arange(n_steps))
    n = z.size
    prior_logp = -0.5 * n * jnp.log(2 * jnp.pi) - 0.5 * jnp.sum(z**2)
    return prior_logp + delta_logp, z
