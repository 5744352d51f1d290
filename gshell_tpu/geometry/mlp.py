"""Positional-encoded MLPs for SDF / mSDF fields (functional pytrees).

TPU-native twin of the reference ``geometry/mlp.py`` + ``geometry/embedding.py``:
sin/cos frequency embedding (input passthrough), softplus(β=100) activations,
optional skip connections.  Parameters are plain pytrees (dict of arrays) so
they compose directly with optax and pjit shardings; the forward is a chain
of MXU matmuls that XLA fuses with the surrounding extraction graph.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


def embed_frequencies(x: jax.Array, n_freq: int) -> jax.Array:
    """(…, C) → (…, C·(2·n_freq+1)); ref ``geometry/embedding.py:4-38``."""
    out = [x]
    for k in range(n_freq):
        f = float(2**k)
        out.append(jnp.sin(f * x))
        out.append(jnp.cos(f * x))
    return jnp.concatenate(out, axis=-1)


def embed_dim(in_channels: int, n_freq: int) -> int:
    return in_channels * (2 * n_freq + 1)


class MLPConfig(NamedTuple):
    n_freq: int = 6
    d_hidden: int = 128
    d_out: int = 1
    n_hidden: int = 3
    skip_in: Sequence[int] = ()
    in_channels: int = 3


def init_mlp(key: jax.Array, cfg: MLPConfig, dtype=jnp.float32) -> dict:
    d_emb = embed_dim(cfg.in_channels, cfg.n_freq)
    dims = []
    for i in range(cfg.n_hidden):
        d_in = cfg.d_hidden + (d_emb if i in cfg.skip_in else 0)
        dims.append((d_in, cfg.d_hidden))
    layers = [(d_emb, cfg.d_hidden)] + dims + [(cfg.d_hidden, cfg.d_out)]

    params = {"w": [], "b": []}
    keys = jax.random.split(key, len(layers))
    for k, (din, dout) in zip(keys, layers):
        # torch.nn.Linear default init: U(-1/sqrt(din), 1/sqrt(din))
        lim = 1.0 / jnp.sqrt(jnp.asarray(din, jnp.float32))
        kw, kb = jax.random.split(k)
        params["w"].append(jax.random.uniform(kw, (din, dout), dtype, -lim, lim))
        params["b"].append(jax.random.uniform(kb, (dout,), dtype, -lim, lim))
    return params


def _softplus100(x: jax.Array) -> jax.Array:
    # softplus with beta=100 (ref mlp.py Softplus(beta=100)); stable form.
    return jax.nn.softplus(100.0 * x) / 100.0


def apply_mlp(params: dict, x: jax.Array, cfg: MLPConfig) -> jax.Array:
    emb = embed_frequencies(x, cfg.n_freq)
    h = _softplus100(emb @ params["w"][0] + params["b"][0])
    for i in range(cfg.n_hidden):
        w, b = params["w"][1 + i], params["b"][1 + i]
        if i in cfg.skip_in:
            h = jnp.concatenate([h, emb], axis=-1)
        h = _softplus100(h @ w + b)
    return h @ params["w"][-1] + params["b"][-1]


# ----------------------------------------------------------------------------
# Texture decoder MLP (ref render/mlptexture.py:18-41 ``_MLP``): bias-free
# ReLU net, Kaiming-uniform init.
# ----------------------------------------------------------------------------


def init_relu_mlp(key: jax.Array, dims: Sequence[int], dtype=jnp.float32) -> list:
    ws = []
    keys = jax.random.split(key, len(dims) - 1)
    for k, din, dout in zip(keys, dims[:-1], dims[1:]):
        bound = jnp.sqrt(6.0 / din)  # kaiming_uniform for relu
        ws.append(jax.random.uniform(k, (din, dout), dtype, -bound, bound))
    return ws


def apply_relu_mlp(ws: list, x: jax.Array) -> jax.Array:
    h = x
    for w in ws[:-1]:
        h = jax.nn.relu(h @ w)
    return h @ ws[-1]
