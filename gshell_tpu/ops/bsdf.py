"""Physically-based BSDF ops (pure jnp, autodiff-differentiable).

TPU-native twins of the reference renderutils plugin: the CUDA kernels in
``render/renderutils/c_src/bsdf.cu`` and their PyTorch reference twins in
``render/renderutils/bsdf.py`` (which the reference uses as its correctness
spec — ``render/renderutils/ops.py:104-111``).  On TPU these are plain
VPU-friendly elementwise math; XLA fuses them into the surrounding shading
graph, and backward comes from autodiff (no hand-written bwd kernels needed).

All functions operate on (..., 3) arrays.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .math import dot, reflect, safe_normalize

NORMAL_THRESHOLD = 0.1
SPECULAR_EPSILON = 1e-4


# ----------------------------------------------------------------------------
# Shading normal preparation (ref bsdf.py:28-51 / c_src/normal.cu)
# ----------------------------------------------------------------------------


def bend_normal(view_vec, smooth_nrm, geom_nrm, two_sided_shading: bool = True):
    if two_sided_shading:
        front = dot(geom_nrm, view_vec) > 0
        smooth_nrm = jnp.where(front, smooth_nrm, -smooth_nrm)
        geom_nrm = jnp.where(front, geom_nrm, -geom_nrm)
    t = jnp.clip(dot(view_vec, smooth_nrm) / NORMAL_THRESHOLD, 0.0, 1.0)
    return geom_nrm + (smooth_nrm - geom_nrm) * t


def perturb_normal(perturbed_nrm, smooth_nrm, smooth_tng, opengl: bool = True):
    smooth_bitang = safe_normalize(jnp.cross(smooth_tng, smooth_nrm))
    sign = -1.0 if opengl else 1.0
    shading_nrm = (
        smooth_tng * perturbed_nrm[..., 0:1]
        + sign * smooth_bitang * perturbed_nrm[..., 1:2]
        + smooth_nrm * jnp.clip(perturbed_nrm[..., 2:3], min=0.0)
    )
    return safe_normalize(shading_nrm)


def prepare_shading_normal(
    pos,
    view_pos,
    perturbed_nrm,
    smooth_nrm,
    smooth_tng,
    geom_nrm,
    two_sided_shading: bool = True,
    opengl: bool = True,
):
    """ref ``bsdf_prepare_shading_normal`` (bsdf.py:46-51)."""
    smooth_nrm = safe_normalize(smooth_nrm)
    view_vec = safe_normalize(view_pos - pos)
    if perturbed_nrm is not None:
        smooth_tng = safe_normalize(smooth_tng)
        shading_nrm = perturb_normal(perturbed_nrm, smooth_nrm, smooth_tng, opengl)
    else:
        shading_nrm = smooth_nrm
    return bend_normal(view_vec, shading_nrm, geom_nrm, two_sided_shading)


# ----------------------------------------------------------------------------
# Diffuse lobes (ref bsdf.py:57-79)
# ----------------------------------------------------------------------------


def lambert(nrm, wi):
    return jnp.clip(dot(nrm, wi), min=0.0) / math.pi


def fresnel_schlick(f0, f90, cos_theta):
    ct = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    return f0 + (f90 - f0) * (1.0 - ct) ** 5.0


def frostbite_diffuse(nrm, wi, wo, linear_roughness):
    wi_dot_n = dot(wi, nrm)
    wo_dot_n = dot(wo, nrm)
    h = safe_normalize(wo + wi)
    wi_dot_h = dot(wi, h)

    energy_bias = 0.5 * linear_roughness
    energy_factor = 1.0 - (0.51 / 1.51) * linear_roughness
    f90 = energy_bias + 2.0 * wi_dot_h * wi_dot_h * linear_roughness
    f0 = 1.0

    wi_scatter = fresnel_schlick(f0, f90, wi_dot_n)
    wo_scatter = fresnel_schlick(f0, f90, wo_dot_n)
    res = wi_scatter * wo_scatter * energy_factor
    return jnp.where((wi_dot_n > 0.0) & (wo_dot_n > 0.0), res, 0.0)


# ----------------------------------------------------------------------------
# GGX specular (ref bsdf.py:94-134)
# ----------------------------------------------------------------------------


def ndf_ggx(alpha_sqr, cos_theta):
    ct = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    d = (ct * alpha_sqr - ct) * ct + 1.0
    return alpha_sqr / (d * d * math.pi)


def lambda_ggx(alpha_sqr, cos_theta):
    ct = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    ct2 = ct * ct
    tan2 = (1.0 - ct2) / ct2
    return 0.5 * (jnp.sqrt(1.0 + alpha_sqr * tan2) - 1.0)


def masking_smith_ggx_correlated(alpha_sqr, cos_theta_i, cos_theta_o):
    li = lambda_ggx(alpha_sqr, cos_theta_i)
    lo = lambda_ggx(alpha_sqr, cos_theta_o)
    return 1.0 / (1.0 + li + lo)


def pbr_specular(col, nrm, wo, wi, alpha, min_roughness: float = 0.08):
    _alpha = jnp.clip(alpha, min_roughness * min_roughness, 1.0)
    alpha_sqr = _alpha * _alpha

    h = safe_normalize(wo + wi)
    wo_dot_n = dot(wo, nrm)
    wi_dot_n = dot(wi, nrm)
    wo_dot_h = dot(wo, h)
    n_dot_h = dot(nrm, h)

    d = ndf_ggx(alpha_sqr, n_dot_h)
    g = masking_smith_ggx_correlated(alpha_sqr, wo_dot_n, wi_dot_n)
    f = fresnel_schlick(col, 1.0, wo_dot_h)

    w = f * d * g * 0.25 / jnp.clip(wo_dot_n, min=SPECULAR_EPSILON)
    frontfacing = (wo_dot_n > SPECULAR_EPSILON) & (wi_dot_n > SPECULAR_EPSILON)
    return jnp.where(frontfacing, w, 0.0)


def pbr_bsdf(kd, arm, pos, nrm, view_pos, light_pos, min_roughness: float = 0.08, bsdf: int = 0):
    """Full PBR BSDF (ref bsdf.py:136-151).  ``bsdf``: 0 = lambert diffuse,
    else frostbite.  ``arm`` = (spec_str, roughness, metallic)."""
    wo = safe_normalize(view_pos - pos)
    wi = safe_normalize(light_pos - pos)

    spec_str = arm[..., 0:1]
    roughness = arm[..., 1:2]
    metallic = arm[..., 2:3]
    ks = (0.04 * (1.0 - metallic) + kd * metallic) * (1.0 - spec_str)
    kd_eff = kd * (1.0 - metallic)

    if bsdf == 0:
        diffuse = kd_eff * lambert(nrm, wi)
    else:
        diffuse = kd_eff * frostbite_diffuse(nrm, wi, wo, roughness)
    specular = pbr_specular(ks, nrm, wo, wi, roughness * roughness, min_roughness)
    return diffuse + specular


def pbr_bsdf_separate(kd, ks_arm, pos, nrm, view_pos, wi, min_roughness: float = 0.08):
    """Evaluate (diffuse, specular) lobes separately for an incident
    direction ``wi`` — the per-sample evaluation used inside the reference's
    MC shading loop (``c_src/envsampling/kernel.cu:412-416`` fwdPbrBSDF).

    The demodulated convention matches the OptiX kernel: the diffuse lobe is
    returned *without* kd (the caller multiplies kd·(1−metalness) after
    accumulation — ``render/render.py:147-148``)."""
    wo = safe_normalize(view_pos - pos)

    roughness = ks_arm[..., 1:2]
    metallic = ks_arm[..., 2:3]
    spec_col = 0.04 * (1.0 - metallic) + kd * metallic

    diff = lambert(nrm, wi)
    spec = pbr_specular(spec_col, nrm, wo, wi, roughness * roughness, min_roughness)
    return diff, spec
