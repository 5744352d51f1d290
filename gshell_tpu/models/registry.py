"""Score-model registry + score-function adapters.

Twin of ``GMeshDiffusion/lib/diffusion/models/utils.py:27-108,179-233``:
``register_model``/``create_model`` by name, and ``get_score_fn`` which
adapts an ε-prediction network into the score ∇log p_t(x) = −ε/σ_t (with the
x0-prediction variant).  The DDP/DataParallel wrapping of the reference is
replaced by mesh sharding (see ``parallel/sharding.py``).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

_MODELS: dict[str, Callable] = {}


def register_model(cls=None, *, name: str | None = None):
    def wrap(c):
        _MODELS[name or c.__name__] = c
        return c

    return wrap(cls) if cls is not None else wrap


def get_model(name: str):
    return _MODELS[name]


def create_model(name: str, *args, **kwargs):
    return _MODELS[name](*args, **kwargs)


def get_score_fn(sde, apply_fn, pred_type: str = "noise"):
    """(x, x_occ, labels) → score(s).  ref models/utils.py:196-229."""

    def score_fn(params, x, x_occ, labels, **kw):
        pred, pred_occ = apply_fn(params, x, x_occ, labels, **kw)
        std = sde.sqrt_1m_alphas_cumprod[labels].reshape(
            (-1,) + (1,) * (x.ndim - 1)
        )
        if pred_type == "noise":
            score = -pred / std
            score_occ = -pred_occ / std if pred_occ is not None else None
        else:  # x0 prediction
            a1 = sde.sqrt_alphas_cumprod[labels].reshape((-1,) + (1,) * (x.ndim - 1))
            score = -(x - pred * a1) / (std * std)
            score_occ = (
                -(x_occ - pred_occ * a1) / (std * std) if pred_occ is not None else None
            )
        return score, score_occ

    return score_fn


# Register the built-in score network.
from .unet3d import UNet3D  # noqa: E402

register_model(UNet3D, name="unet3d_occgrid")
