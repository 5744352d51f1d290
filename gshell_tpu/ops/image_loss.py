"""Fused HDR image losses (pure jnp; XLA fuses tonemap + reduction).

TPU-native twin of the reference renderutils image loss — the CUDA kernel
``render/renderutils/c_src/loss.cu`` and its PyTorch spec
``render/renderutils/loss.py:10-42``: {l1, mse, smape, relmse} ×
{none, log_srgb} tonemapping.  Loss selection strings follow
``train_gshelltet_deepfashion.py:52-60`` (smape / mse / logl1 / logl2 /
relmse / l1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _tonemap_srgb(f: jax.Array, exposure: float = 5.0) -> jax.Array:
    f = f * exposure
    return jnp.where(
        f > 0.0031308,
        jnp.power(jnp.clip(f, min=0.0031308), 1.0 / 2.4) * 1.055 - 0.055,
        12.92 * f,
    )


def _smape(img, target, eps=0.01):
    return jnp.mean(jnp.abs(img - target) / (jnp.abs(img) + jnp.abs(target) + eps))


def _relmse(img, target, eps=0.1):
    d = img - target
    return jnp.mean(d * d / (img * img + target * target + eps))


def image_loss(img: jax.Array, target: jax.Array, loss: str = "l1", tonemapper: str = "none") -> jax.Array:
    if tonemapper == "log_srgb":
        img = _tonemap_srgb(jnp.log(jnp.clip(img, 0.0, 65535.0) + 1.0))
        target = _tonemap_srgb(jnp.log(jnp.clip(target, 0.0, 65535.0) + 1.0))
    if loss == "mse":
        return jnp.mean((img - target) ** 2)
    if loss == "smape":
        return _smape(img, target)
    if loss == "relmse":
        return _relmse(img, target)
    return jnp.mean(jnp.abs(img - target))


def create_loss(name: str):
    """Loss factory matching ``train_gshelltet_deepfashion.py:52-60``."""
    table = {
        "smape": ("smape", "none"),
        "mse": ("mse", "none"),
        "logl1": ("l1", "log_srgb"),
        "logl2": ("mse", "log_srgb"),
        "relmse": ("relmse", "none"),
        "l1": ("l1", "none"),
    }
    loss, tm = table[name]
    return lambda img, ref: image_loss(img, ref, loss=loss, tonemapper=tm)
