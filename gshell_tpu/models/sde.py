"""Variance-preserving SDE (DDPM) — twin of
``GMeshDiffusion/lib/diffusion/sde_lib.py:209-266`` (VPSDE) plus the paired
(grid, occ-grid) DDIM discretization (``sde_lib.py:113-173``).

Pure-array implementation; all schedules are precomputed jnp constants so
samplers compile to single ``lax.fori_loop`` programs.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class VPSDE(NamedTuple):
    beta_0: float
    beta_1: float
    N: int
    discrete_betas: jax.Array  # (N,)
    alphas: jax.Array
    alphas_cumprod: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_1m_alphas_cumprod: jax.Array

    @property
    def T(self) -> float:
        return 1.0

    def marginal_prob(self, x, t):
        log_mean_coeff = (
            -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        )
        mean = jnp.exp(log_mean_coeff)[:, None, None, None, None] * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
        return mean, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)


def make_vpsde(beta_min: float = 0.1, beta_max: float = 20.0, n: int = 1000) -> VPSDE:
    betas = jnp.linspace(beta_min / n, beta_max / n, n)
    alphas = 1.0 - betas
    acp = jnp.cumprod(alphas)
    return VPSDE(
        beta_0=beta_min,
        beta_1=beta_max,
        N=n,
        discrete_betas=betas,
        alphas=alphas,
        alphas_cumprod=acp,
        sqrt_alphas_cumprod=jnp.sqrt(acp),
        sqrt_1m_alphas_cumprod=jnp.sqrt(1.0 - acp),
    )


def perturb(sde: VPSDE, x, labels, noise):
    """q(x_t | x_0) sampling with integer timestep labels (ref losses.py:66-79)."""
    a1 = sde.sqrt_alphas_cumprod[labels].reshape(-1, *([1] * (x.ndim - 1)))
    a2 = sde.sqrt_1m_alphas_cumprod[labels].reshape(-1, *([1] * (x.ndim - 1)))
    return a1 * x + a2 * noise


def ddim_step(sde: VPSDE, x, eps_pred, timestep, timestep_prev):
    """Deterministic DDIM update (ref sde_lib.py:113-143), η = 0.

    x, eps_pred: (B, ...); timestep(+prev): int32 scalars or (B,).
    """
    bshape = (-1,) + (1,) * (x.ndim - 1)
    a1 = sde.sqrt_alphas_cumprod[timestep].reshape(bshape)
    a2 = sde.sqrt_1m_alphas_cumprod[timestep].reshape(bshape)
    a1p = sde.sqrt_alphas_cumprod[timestep_prev].reshape(bshape)
    a2p = sde.sqrt_1m_alphas_cumprod[timestep_prev].reshape(bshape)
    r1 = a1p / a1
    r2 = a2p / a2
    x0_pred_scaled = x - a2 * eps_pred
    score_scaled_t = x - x0_pred_scaled
    x_new = r1 * x + (-r1 + r2) * score_scaled_t
    x0_pred = x0_pred_scaled / a1
    return x_new, x0_pred


def ancestral_step(sde: VPSDE, key, x, eps_pred, timestep):
    """DDPM ancestral-sampling update (ref sampling.py:216-240 predictor)."""
    bshape = (-1,) + (1,) * (x.ndim - 1)
    beta = sde.discrete_betas[timestep].reshape(bshape)
    a2 = sde.sqrt_1m_alphas_cumprod[timestep].reshape(bshape)
    score = -eps_pred / a2
    x_mean = (x + beta * score) / jnp.sqrt(1.0 - beta)
    noise = jax.random.normal(key, x.shape)
    x_new = x_mean + jnp.sqrt(beta) * noise
    return x_new, x_mean
