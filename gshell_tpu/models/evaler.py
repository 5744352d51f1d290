"""Evaluation-time generation modes for G-MeshDiffusion.

Twin of ``GMeshDiffusion/lib/diffusion/evaler.py:15-263``:
  * :func:`uncond_gen`        — binned unconditional sample dumps (ref :57-75)
  * :func:`uncond_gen_interp` — slerp between prior noises (ref :78-181)
  * :func:`cond_gen`          — partial-shape inpainting: known-region
    conditioning by re-noising the condition at each step (ref :183-263).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import ddim_timesteps, slerp
from .sde import VPSDE, ancestral_step, ddim_step, perturb


def uncond_gen(sampler: Callable, key: jax.Array, n_samples: int, save_fn: Callable):
    """Draw ``n_samples`` and hand each (grid, occ) to ``save_fn(i, x, occ)``."""
    for i in range(n_samples):
        key, k = jax.random.split(key)
        x, occ = sampler(k)
        save_fn(i, np.asarray(x), np.asarray(occ) if occ is not None else None)


def uncond_gen_interp(
    sde: VPSDE,
    eps_fn: Callable,
    shape: tuple,
    occ_shape: Optional[tuple],
    key: jax.Array,
    n_pairs: int,
    n_interp: int = 8,
    n_steps: int = 100,
    feature_mask=None,
    occ_mask=None,
):
    """Slerp between two prior noises, decode every interpolant with the same
    deterministic DDIM trajectory (ref evaler.py:78-181)."""
    seq = ddim_timesteps(sde.N, n_steps, "quad")
    seq_prev = jnp.concatenate([seq[1:], jnp.zeros((1,), seq.dtype)])
    n = seq.shape[0]

    @jax.jit
    def decode(x0_noise, occ_noise):
        def body(i, carry):
            x, x_occ = carry
            t, tp = seq[i], seq_prev[i]
            labels = jnp.full((shape[0],), t, jnp.int32)
            eps, eps_occ = eps_fn(x, x_occ, labels)
            x, _ = ddim_step(sde, x, eps.astype(jnp.float32), t, tp)
            if feature_mask is not None:
                x = x * feature_mask
            if x_occ is not None:
                x_occ, _ = ddim_step(sde, x_occ, eps_occ.astype(jnp.float32), t, tp)
                if occ_mask is not None:
                    x_occ = x_occ * occ_mask
            return (x, x_occ)

        return jax.lax.fori_loop(0, n, body, (x0_noise, occ_noise))

    results = []
    for _ in range(n_pairs):
        key, k0, k1, k2, k3 = jax.random.split(key, 5)
        z0 = jax.random.normal(k0, shape)
        z1 = jax.random.normal(k1, shape)
        zo0 = jax.random.normal(k2, occ_shape) if occ_shape else None
        zo1 = jax.random.normal(k3, occ_shape) if occ_shape else None
        row = []
        for t in np.linspace(0.0, 1.0, n_interp):
            z = slerp(z0, z1, float(t))
            zo = slerp(zo0, zo1, float(t)) if occ_shape else None
            row.append(decode(z, zo))
        results.append(row)
    return results


def cond_gen(
    sde: VPSDE,
    eps_fn: Callable,
    condition: jax.Array,  # known grid values
    cond_mask: jax.Array,  # 1 where known
    key: jax.Array,
    shape: tuple,
    feature_mask=None,
    occ_shape: Optional[tuple] = None,
    occ_mask=None,
    occ_condition: Optional[jax.Array] = None,
    occ_cond_mask: Optional[jax.Array] = None,
):
    """Inpainting: at every ancestral step, overwrite the known region with a
    re-noised version of the condition (ref evaler.py:183-263 /
    sde_lib.py:176-203 conditional branch).

    The occupancy grid is sampled JOINTLY with the feature grid (the score
    model is dual-head — both denoise together exactly as in uncond
    sampling); pass ``occ_condition``/``occ_cond_mask`` to inpaint a known
    occupancy region too.  Returns ``(x, x_occ)`` (``x_occ`` is None when
    ``occ_shape`` is None)."""

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
            k1, k2, k3, k4 = jax.random.split(kk, 4)
            x_new, x_mean = ancestral_step(sde, k1, x, eps.astype(jnp.float32), t)
            x_new = jnp.where(t == 0, x_mean, x_new)
            # re-noise condition to level t-1 and paste the known region
            noise = jax.random.normal(k2, shape)
            cond_t = perturb(sde, condition, jnp.maximum(labels - 1, 0), noise)
            x_new = cond_t * cond_mask + x_new * (1.0 - cond_mask)
            if feature_mask is not None:
                x_new = x_new * feature_mask
            if x_occ is not None:
                o_new, o_mean = ancestral_step(
                    sde, k3, x_occ, eps_occ.astype(jnp.float32), t
                )
                o_new = jnp.where(t == 0, o_mean, o_new)
                if occ_condition is not None:
                    o_noise = jax.random.normal(k4, occ_shape)
                    o_cond_t = perturb(
                        sde, occ_condition, jnp.maximum(labels - 1, 0), o_noise
                    )
                    o_new = o_cond_t * occ_cond_mask + o_new * (1.0 - occ_cond_mask)
                if occ_mask is not None:
                    o_new = o_new * occ_mask
                x_occ = o_new
            return (x_new, x_occ)

        return jax.lax.fori_loop(0, sde.N, body, (x, x_occ))

    return jax.jit(sampler)(key)
