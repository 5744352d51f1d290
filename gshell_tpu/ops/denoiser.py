"""SVGF-style bilateral denoiser (spatial only), pure jnp with a custom VJP.

TPU-native twin of the reference optixutils kernel
``render/optixutils/c_src/denoising.cu:20-72`` and the wrapper
``denoiser/denoiser.py:21-35``: per pixel, a (2R+1)² bilateral filter with
weights = gaussian(distance) × ⟨n_tap, n_center⟩¹²⁸ × exp(−|Δz| / (dz·dist)).

Differentiation matches the reference's hand-written backward
(``denoising.cu`` bilateral_denoiser_bwd): gradients flow to the COLOR only —
weights (normals/depths) are treated as constants.  The custom VJP re-walks
the taps in the backward instead of storing 529 per-tap residuals, which
would otherwise cost taps × image = gigabytes of HLO temps under autodiff.

``sigma`` is a traced scalar so the influence ramp (``denoiser.py:26-29``)
never recompiles; the tap radius is static and excess taps get ~0 weight.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .math import dot, safe_normalize

FLT_EPS = 1.1920929e-7


def _tap_weight(c_nrm, c_zdz, t_nrm, t_zdz, fx, fy, variance):
    dist_sqr = jnp.asarray(fx * fx + fy * fy, jnp.float32)
    dist = jnp.sqrt(dist_sqr)
    w_xy = jnp.exp(-dist_sqr / (2.0 * variance))
    w_normal = jnp.power(jnp.clip(dot(t_nrm, c_nrm), FLT_EPS, 1.0), 128.0)
    w_depth = jnp.exp(
        -(
            jnp.abs(t_zdz[..., 0:1] - c_zdz[..., 0:1])
            / jnp.maximum(c_zdz[..., 1:2] * dist, FLT_EPS)
        )
    )
    return w_xy * w_normal * w_depth


def _accumulate(col, nrm, zdz, sigma, r):
    h, w, _ = col.shape
    variance = sigma * sigma
    colp = jnp.pad(col, ((r, r), (r, r), (0, 0)))
    nrmp = jnp.pad(nrm, ((r, r), (r, r), (0, 0)))
    zdzp = jnp.pad(zdz, ((r, r), (r, r), (0, 0)))
    maskp = jnp.pad(jnp.ones((h, w, 1)), ((r, r), (r, r), (0, 0)))

    def body(i, carry):
        acc_col, acc_w = carry
        fy = i // (2 * r + 1) - r
        fx = i % (2 * r + 1) - r
        sl = lambda t: jax.lax.dynamic_slice(t, (r + fy, r + fx, 0), (h, w, t.shape[-1]))
        wgt = _tap_weight(nrm, zdz, sl(nrmp), sl(zdzp), fx, fy, variance) * sl(maskp)
        return acc_col + sl(colp) * wgt, acc_w + wgt

    return jax.lax.fori_loop(
        0, (2 * r + 1) ** 2, body,
        (jnp.zeros_like(col), jnp.zeros((h, w, 1), col.dtype)),
    )


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def bilateral_denoiser(col, nrm, zdz, sigma, max_radius: int = 11):
    nrm = safe_normalize(nrm)
    acc_col, acc_w = _accumulate(col, nrm, zdz, sigma, max_radius)
    return acc_col / jnp.maximum(acc_w, 1e-4)


def _fwd(col, nrm, zdz, sigma, max_radius):
    nrm = safe_normalize(nrm)
    acc_col, acc_w = _accumulate(col, nrm, zdz, sigma, max_radius)
    out = acc_col / jnp.maximum(acc_w, 1e-4)
    return out, (nrm, zdz, sigma, acc_w)


def _bwd(max_radius, res, g):
    nrm, zdz, sigma, acc_w = res
    r = max_radius
    h, w, _ = g.shape
    variance = sigma * sigma
    gp = g / jnp.maximum(acc_w, 1e-4)  # upstream grad scaled by center weight

    gpp = jnp.pad(gp, ((r, r), (r, r), (0, 0)))
    nrmp = jnp.pad(nrm, ((r, r), (r, r), (0, 0)))
    zdzp = jnp.pad(zdz, ((r, r), (r, r), (0, 0)))
    maskp = jnp.pad(jnp.ones((h, w, 1)), ((r, r), (r, r), (0, 0)))

    def body(i, acc):
        fy = i // (2 * r + 1) - r
        fx = i % (2 * r + 1) - r
        # center at j−d contributes w(center, tap=j)·gp(center) to col grad
        # at j ⇔ shift center quantities by (−fy, −fx)
        sl = lambda t: jax.lax.dynamic_slice(t, (r - fy, r - fx, 0), (h, w, t.shape[-1]))
        wgt = _tap_weight(sl(nrmp), sl(zdzp), nrm, zdz, fx, fy, variance) * sl(maskp)
        return acc + sl(gpp) * wgt

    d_col = jax.lax.fori_loop(0, (2 * r + 1) ** 2, body, jnp.zeros_like(g))
    # weights are constants in the backward (reference parity)
    return d_col, jnp.zeros_like(nrm), jnp.zeros_like(zdz), jnp.zeros_like(sigma)


bilateral_denoiser.defvjp(_fwd, _bwd)


class BilateralDenoiserState:
    """Influence-ramped wrapper (ref ``denoiser/denoiser.py:21-35``)."""

    def __init__(self, influence: float = 1.0):
        self.set_influence(influence)

    def set_influence(self, factor: float):
        self.sigma = max(factor * 2.0, 1e-4)

    def __call__(self, col, nrm, zdz):
        return bilateral_denoiser(col, nrm, zdz, jnp.asarray(self.sigma))