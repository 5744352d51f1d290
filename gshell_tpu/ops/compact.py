"""Scatter-free stream compaction for TPU.

``jnp.nonzero(mask, size=K)`` lowers through ``bincount`` — a scatter-add
with one update per *input* element.  XLA:TPU lowers scatters to a
sort + serial while-loop (~80 ns/row measured), so compacting a res³
activity volume (16.7M elements at tet-grid 256) costs seconds.  This is
the extraction analogue of the render-path scatters replaced in the
round-3 hot-path work.

``nonzero_compact`` computes the same result with work proportional to
the *input* only through cheap fused elementwise/reduce passes, and work
proportional to the *output* for the actual index math:

  1. pack the mask into uint32 words, 16 words (512 bits) per block;
  2. per-block popcounts + an inclusive prefix sum over blocks (tiny);
  3. each output slot binary-searches its block (log₂ nb gathers), then
     rank-selects its bit via word popcount prefix + a 5-step in-word
     bit select — all elementwise on (K,)-shaped registers.

No scatter, no sort, no data-dependent shapes.  Replaces the reference's
``torch.nonzero``/boolean-indexing compactions (e.g.
``/root/reference/geometry/gshell_tets.py:266-276``) in spirit: theirs is
dynamic-shape on GPU; ours is static-capacity and gather-only on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_WORD = 32
_WORDS_PER_BLOCK = 16  # 512 bits / block


def _pack_words(mask_flat: jax.Array) -> jax.Array:
    """(n,) bool → (ceil(n/32),) uint32 little-endian bit packing."""
    n = mask_flat.shape[0]
    nw = -(-n // _WORD)
    pad = nw * _WORD - n
    m = jnp.pad(mask_flat, (0, pad)).reshape(nw, _WORD).astype(jnp.uint32)
    return (m << jnp.arange(_WORD, dtype=jnp.uint32)[None, :]).sum(
        axis=1, dtype=jnp.uint32
    )


def _select_bit(word: jax.Array, rank: jax.Array) -> jax.Array:
    """Position of the ``rank``-th (0-based) set bit of each uint32."""
    v = word
    r = rank
    pos = jnp.zeros_like(rank)
    for b in (16, 8, 4, 2, 1):
        low = v & jnp.uint32((1 << b) - 1)
        c = lax.population_count(low).astype(rank.dtype)
        go_high = c <= r
        r = jnp.where(go_high, r - c, r)
        v = jnp.where(go_high, v >> jnp.uint32(b), low)
        pos = pos + jnp.where(go_high, b, 0)
    return pos


def nonzero_compact(mask: jax.Array, size: int, fill_value) -> jax.Array:
    """Drop-in for ``jnp.nonzero(mask.ravel(), size=size, fill_value=f)[0]``.

    Returns the flat indices of the first ``size`` True elements of
    ``mask`` (row-major), padded with ``fill_value``.  Gather-only.
    """
    mask_flat = mask.reshape(-1)
    if mask_flat.dtype != jnp.bool_:
        mask_flat = mask_flat != 0
    n = mask_flat.shape[0]
    if n == 0 or size == 0:
        return jnp.full((size,), fill_value, jnp.int32)

    words = _pack_words(mask_flat)
    nw = words.shape[0]
    nb = -(-nw // _WORDS_PER_BLOCK)
    words = jnp.pad(words, (0, nb * _WORDS_PER_BLOCK - nw)).reshape(
        nb, _WORDS_PER_BLOCK
    )
    wordpop = lax.population_count(words).astype(jnp.int32)  # (nb, W)
    rows = wordpop.sum(axis=1)  # (nb,)
    cum_rows = jnp.cumsum(rows)  # inclusive
    total = cum_rows[-1]

    q = jnp.arange(size, dtype=jnp.int32)
    blk = jnp.searchsorted(cum_rows, q, side="right").astype(jnp.int32)
    blk_c = jnp.minimum(blk, nb - 1)
    prev = jnp.where(blk_c > 0, cum_rows[jnp.maximum(blk_c - 1, 0)], 0)
    k = q - prev  # rank within block

    wp = wordpop[blk_c]  # (size, W)
    cumw = jnp.cumsum(wp, axis=1)  # inclusive
    widx = jnp.sum(cumw <= k[:, None], axis=1).astype(jnp.int32)
    widx = jnp.minimum(widx, _WORDS_PER_BLOCK - 1)
    excl = jnp.take_along_axis(cumw, widx[:, None], axis=1)[:, 0] - (
        jnp.take_along_axis(wp, widx[:, None], axis=1)[:, 0]
    )
    kw = k - excl
    word = jnp.take_along_axis(words[blk_c], widx[:, None], axis=1)[:, 0]
    bit = _select_bit(word, kw)

    idx = blk_c * (_WORDS_PER_BLOCK * _WORD) + widx * _WORD + bit
    return jnp.where(q < total, idx, fill_value).astype(jnp.int32)
