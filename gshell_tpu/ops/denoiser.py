"""SVGF-style bilateral denoiser (spatial only), pure jnp.

TPU-native twin of the reference optixutils kernel
``render/optixutils/c_src/denoising.cu:20-72`` and the wrapper
``denoiser/denoiser.py:21-35``: per pixel, a (2R+1)² bilateral filter with
weights = gaussian(distance) × ⟨n_tap, n_center⟩¹²⁸ × exp(−|Δz| / (dz·dist)).

The tap loop is a ``lax.fori_loop`` over static offsets with dynamic slices of
the padded image — one fused TPU program; the backward comes from autodiff
(the reference hand-writes the bwd kernel).  ``sigma`` is a traced scalar so
the influence ramp (``denoiser.py:26-29`` set_influence) never recompiles;
the tap radius is static (``max_radius``) and excess taps get ~0 weight.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import dot, safe_normalize

FLT_EPS = 1.1920929e-7


def bilateral_denoiser(
    col: jax.Array,  # (H, W, 3)
    nrm: jax.Array,  # (H, W, 3)
    zdz: jax.Array,  # (H, W, 2) depth + depth-gradient
    sigma: jax.Array,  # () traced
    max_radius: int = 11,
) -> jax.Array:
    h, w, _ = col.shape
    nrm = safe_normalize(nrm)
    variance = sigma * sigma
    r = max_radius

    colp = jnp.pad(col, ((r, r), (r, r), (0, 0)))
    nrmp = jnp.pad(nrm, ((r, r), (r, r), (0, 0)))
    zdzp = jnp.pad(zdz, ((r, r), (r, r), (0, 0)))
    # Padding mask: out-of-image taps are skipped in the reference.
    maskp = jnp.pad(jnp.ones((h, w, 1)), ((r, r), (r, r), (0, 0)))

    n_taps = (2 * r + 1) ** 2

    def body(i, carry):
        acc_col, acc_w = carry
        fy = i // (2 * r + 1) - r
        fx = i % (2 * r + 1) - r
        sl = lambda t: jax.lax.dynamic_slice(
            t, (r + fy, r + fx, 0), (h, w, t.shape[-1])
        )
        t_col, t_nrm, t_zdz, t_m = sl(colp), sl(nrmp), sl(zdzp), sl(maskp)

        dist_sqr = (fx * fx + fy * fy).astype(col.dtype)
        dist = jnp.sqrt(dist_sqr)
        w_xy = jnp.exp(-dist_sqr / (2.0 * variance))
        w_normal = jnp.power(jnp.clip(dot(t_nrm, nrm), FLT_EPS, 1.0), 128.0)
        w_depth = jnp.exp(
            -(jnp.abs(t_zdz[..., 0:1] - zdz[..., 0:1]) / jnp.maximum(zdz[..., 1:2] * dist, FLT_EPS))
        )
        wgt = w_xy * w_normal * w_depth * t_m
        return acc_col + t_col * wgt, acc_w + wgt

    acc_col, acc_w = jax.lax.fori_loop(
        0, n_taps, body, (jnp.zeros_like(col), jnp.zeros((h, w, 1), col.dtype))
    )
    return acc_col / jnp.maximum(acc_w, 1e-4)


class BilateralDenoiserState:
    """Influence-ramped wrapper (ref ``denoiser/denoiser.py:21-35``)."""

    def __init__(self, influence: float = 1.0):
        self.set_influence(influence)

    def set_influence(self, factor: float):
        self.sigma = max(factor * 2.0, 1e-4)

    def __call__(self, col, nrm, zdz):
        return bilateral_denoiser(col, nrm, zdz, jnp.asarray(self.sigma))
