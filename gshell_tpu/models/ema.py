"""Exponential moving average of parameters — twin of
``GMeshDiffusion/lib/diffusion/models/ema.py:10-100``.  A pytree map; the
num_updates warmup matches the reference's ``min(decay, (1+n)/(10+n))``."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: dict
    num_updates: jax.Array  # () int32


def ema_init(params, dtype=None) -> EMAState:
    """``dtype=bfloat16`` halves the shadow copy's HBM residency (0.8 GB at
    the 411M-param reference UNet; part of fitting the segmented 128³ step
    on one chip).  Default keeps the params' own dtype (reference-exact)."""
    cast = (lambda p: jnp.asarray(p, dtype)) if dtype else jnp.array
    return EMAState(
        params=jax.tree_util.tree_map(cast, params),
        num_updates=jnp.zeros((), jnp.int32),
    )


def ema_update(state: EMAState, new_params, decay: float = 0.9999) -> EMAState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    ema = jax.tree_util.tree_map(
        lambda e, p: (
            e.astype(jnp.float32) - (1.0 - d) * (e.astype(jnp.float32) - p)
        ).astype(e.dtype),
        state.params,
        new_params,
    )
    return EMAState(params=ema, num_updates=n)
