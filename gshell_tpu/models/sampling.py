"""Samplers for G-MeshDiffusion: DDIM (quad/uniform schedule) and PC
(ancestral predictor), for paired (feature grid, occ grid) states.

Twin of ``GMeshDiffusion/lib/diffusion/sampling.py:33-616``: masked updates
at every step (ref :607-609), paired occ-grid sampling (ref :551-601).
Each sampler compiles to one ``lax.fori_loop`` — no per-step host roundtrips.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .sde import VPSDE, ancestral_step, ddim_step


def ddim_timesteps(n_model_steps: int, n_sample_steps: int, schedule: str = "quad"):
    """Timestep subsequence (ref sampling.py:575-583): 'quad' or 'uniform'."""
    if schedule == "quad":
        seq = (np.linspace(0, np.sqrt(n_model_steps * 0.8), n_sample_steps) ** 2).astype(int)
    else:
        seq = np.linspace(0, n_model_steps - 1, n_sample_steps).astype(int)
    seq = np.unique(seq)
    return jnp.asarray(seq[::-1].copy())  # descending


def get_ddim_sampler(
    sde: VPSDE,
    eps_fn: Callable,  # (x, x_occ, labels) -> (eps, eps_occ)
    shape: tuple,
    occ_shape: Optional[tuple],
    n_steps: int = 100,
    schedule: str = "quad",
    feature_mask: Optional[jax.Array] = None,
    occ_mask: Optional[jax.Array] = None,
):
    """Returns sampler(key) -> (x0 grid, x0 occ grid)."""
    seq = ddim_timesteps(sde.N, n_steps, schedule)
    seq_prev = jnp.concatenate([seq[1:], jnp.zeros((1,), seq.dtype)])
    n = seq.shape[0]

    def sampler(key):
        k_x, k_occ = jax.random.split(key)
        x = jax.random.normal(k_x, shape)
        x_occ = jax.random.normal(k_occ, occ_shape) if occ_shape else None

        def body(i, carry):
            x, x_occ = carry
            t = seq[i]
            tp = seq_prev[i]
            labels = jnp.full((shape[0],), t, jnp.int32)
            eps, eps_occ = eps_fn(x, x_occ, labels)
            x_new, _ = ddim_step(sde, x, eps.astype(jnp.float32), t, tp)
            if feature_mask is not None:
                x_new = x_new * feature_mask
            if x_occ is not None:
                occ_new, _ = ddim_step(sde, x_occ, eps_occ.astype(jnp.float32), t, tp)
                if occ_mask is not None:
                    occ_new = occ_new * occ_mask
            else:
                occ_new = None
            return (x_new, occ_new)

        x, x_occ = jax.lax.fori_loop(0, n, body, (x, x_occ))
        return x, x_occ

    return sampler


def get_pc_sampler(
    sde: VPSDE,
    eps_fn: Callable,
    shape: tuple,
    occ_shape: Optional[tuple],
    feature_mask: Optional[jax.Array] = None,
    occ_mask: Optional[jax.Array] = None,
    denoise: bool = True,
):
    """Ancestral (DDPM) predictor, no corrector — the reference's default
    sampling config (config_*.py sampling.predictor='ancestral_sampling')."""

    def sampler(key):
        k_x, k_occ, k_loop = jax.random.split(key, 3)
        x = jax.random.normal(k_x, shape)
        x_occ = jax.random.normal(k_occ, occ_shape) if occ_shape else None

        def body(i, carry):
            x, x_occ = carry
            t = sde.N - 1 - i
            labels = jnp.full((shape[0],), t, jnp.int32)
            eps, eps_occ = eps_fn(x, x_occ, labels)
            kk = jax.random.fold_in(k_loop, i)
            k1, k2 = jax.random.split(kk)
            x_new, x_mean = ancestral_step(sde, k1, x, eps.astype(jnp.float32), t)
            x_new = jnp.where(t == 0, x_mean, x_new) if denoise else x_new
            if feature_mask is not None:
                x_new = x_new * feature_mask
            if x_occ is not None:
                occ_new, occ_mean = ancestral_step(
                    sde, k2, x_occ, eps_occ.astype(jnp.float32), t
                )
                occ_new = jnp.where(t == 0, occ_mean, occ_new) if denoise else occ_new
                if occ_mask is not None:
                    occ_new = occ_new * occ_mask
            else:
                occ_new = None
            return (x_new, occ_new)

        x, x_occ = jax.lax.fori_loop(0, sde.N, body, (x, x_occ))
        return x, x_occ

    return sampler


# ----------------------------------------------------------------------------
# Predictor / corrector zoo (ref sampling.py:189-325 registry)
# ----------------------------------------------------------------------------


def euler_maruyama_step(sde: VPSDE, key, x, eps_pred, timestep, n_total=None):
    """Euler-Maruyama reverse-SDE predictor (ref sampling.py:189-201)."""
    n = n_total or sde.N
    dt = -1.0 / n
    t = (timestep + 1) / sde.N
    bshape = (-1,) + (1,) * (x.ndim - 1)
    beta_t = sde.beta_0 + t * (sde.beta_1 - sde.beta_0)
    a2 = sde.sqrt_1m_alphas_cumprod[timestep].reshape(bshape)
    score = -eps_pred / a2
    drift = -0.5 * beta_t * x - beta_t * score
    diffusion = jnp.sqrt(beta_t)
    noise = jax.random.normal(key, x.shape)
    x_mean = x + drift * dt
    x_new = x_mean + diffusion * jnp.sqrt(-dt) * noise
    return x_new, x_mean


def reverse_diffusion_step(sde: VPSDE, key, x, eps_pred, timestep):
    """Reverse-diffusion (DDPM discretization) predictor (ref :203-214)."""
    bshape = (-1,) + (1,) * (x.ndim - 1)
    beta = sde.discrete_betas[timestep].reshape(bshape)
    alpha = sde.alphas[timestep].reshape(bshape)
    a2 = sde.sqrt_1m_alphas_cumprod[timestep].reshape(bshape)
    score = -eps_pred / a2
    f = jnp.sqrt(alpha) * x - x
    g = jnp.sqrt(beta)
    rev_f = f - g * g * score
    noise = jax.random.normal(key, x.shape)
    x_mean = x - rev_f
    x_new = x_mean + g * noise
    return x_new, x_mean


def langevin_corrector_step(sde: VPSDE, key, x, eps_fn_single, timestep, snr: float = 0.075, n_steps: int = 1):
    """Langevin MCMC corrector (ref sampling.py:262-290)."""
    bshape = (-1,) + (1,) * (x.ndim - 1)
    alpha = sde.alphas[timestep].reshape(bshape)

    def one(i, carry):
        x, k = carry
        k, k1 = jax.random.split(k)
        eps_pred = eps_fn_single(x, timestep)
        a2 = sde.sqrt_1m_alphas_cumprod[timestep].reshape(bshape)
        grad = -eps_pred / a2
        noise = jax.random.normal(k1, x.shape)
        grad_norm = jnp.sqrt(jnp.mean(grad**2))
        noise_norm = jnp.sqrt(jnp.mean(noise**2))
        step_size = (snr * noise_norm / jnp.maximum(grad_norm, 1e-12)) ** 2 * 2 * alpha
        x = x + step_size * grad + jnp.sqrt(2 * step_size) * noise
        return (x, k)

    x, _ = jax.lax.fori_loop(0, n_steps, one, (x, key))
    return x


def ald_corrector_step(sde: VPSDE, key, x, eps_fn_single, timestep, snr: float = 0.075, n_steps: int = 1):
    """Annealed Langevin dynamics corrector (NCSN/NCSNv2 step rule).

    Twin of ref ``GMeshDiffusion/lib/diffusion/sampling.py:292-325``: unlike
    the ``langevin`` corrector (ref :262-290) whose step size adapts to the
    measured score/noise norm ratio, ald uses the *schedule-level* step size
    ``(snr * std_t)^2 * 2 * alpha_t`` where ``std_t`` is the VPSDE marginal
    std at t — independent of the current score magnitude.
    """
    bshape = (-1,) + (1,) * (x.ndim - 1)
    alpha = sde.alphas[timestep].reshape(bshape)
    std = sde.sqrt_1m_alphas_cumprod[timestep].reshape(bshape)
    step_size = (snr * std) ** 2 * 2 * alpha

    def one(i, carry):
        x, k = carry
        k, k1 = jax.random.split(k)
        eps_pred = eps_fn_single(x, timestep)
        grad = -eps_pred / std  # score from eps-prediction
        noise = jax.random.normal(k1, x.shape)
        x = x + step_size * grad + jnp.sqrt(2 * step_size) * noise
        return (x, k)

    x, _ = jax.lax.fori_loop(0, n_steps, one, (x, key))
    return x


PREDICTORS = {
    "ancestral_sampling": ancestral_step,
    "euler_maruyama": euler_maruyama_step,
    "reverse_diffusion": reverse_diffusion_step,
    "none": None,
}
CORRECTORS = {"langevin": langevin_corrector_step, "ald": ald_corrector_step, "none": None}


def slerp(z0, z1, t):
    """Spherical interpolation between prior noises (ref evaler.py:78-181
    uncond_gen_interp)."""
    omega = jnp.arccos(
        jnp.clip(
            jnp.sum(z0 * z1) / (jnp.linalg.norm(z0) * jnp.linalg.norm(z1)),
            -1 + 1e-7,
            1 - 1e-7,
        )
    )
    so = jnp.sin(omega)
    return jnp.sin((1.0 - t) * omega) / so * z0 + jnp.sin(t * omega) / so * z1
