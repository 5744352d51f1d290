"""Scatter-free stream compaction for TPU.

``jnp.nonzero(mask, size=K)`` lowers through ``bincount`` — a scatter-add
with one update per *input* element.  XLA:TPU lowers scatters to a
sort + serial while-loop (~80 ns/row measured), so compacting a res³
activity volume (16.7M elements at tet-grid 256) costs seconds.  This is
the extraction analogue of the render-path scatters replaced in the
round-3 hot-path work.

``nonzero_compact`` computes the same result as a single stable argsort
of the negated mask: True elements sort first, stability keeps them in
ascending index order, and a static ``[:size]`` slice + fill finishes the
job.  XLA:TPU's vectorized sort is FAR faster than both the ``bincount``
scatter and a hand-built block-popcount + per-output binary-search scheme
(measured on v5e, inputs from tet-grid-256 extraction):

    input n        bincount-nonzero   block-popcount   stable argsort
    1.18M → 786k      (seconds)          117 ms            3.5 ms
    4.13M → 393k          "               61 ms            6.9 ms
    16.97M → 590k         "              110 ms           47 ms

No scatter, no data-dependent shapes.  Replaces the reference's
``torch.nonzero``/boolean-indexing compactions (e.g.
``/root/reference/geometry/gshell_tets.py:266-276``) in spirit: theirs is
dynamic-shape on GPU; ours is static-capacity on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def nonzero_compact(mask: jax.Array, size: int, fill_value) -> jax.Array:
    """Drop-in for ``jnp.nonzero(mask.ravel(), size=size, fill_value=f)[0]``.

    Returns the flat indices of the first ``size`` True elements of
    ``mask`` (row-major, ascending), padded with ``fill_value``.
    """
    mask_flat = mask.reshape(-1)
    if mask_flat.dtype != jnp.bool_:
        mask_flat = mask_flat != 0
    n = mask_flat.shape[0]
    if n == 0 or size == 0:
        return jnp.full((size,), fill_value, jnp.int32)

    total = mask_flat.sum(dtype=jnp.int32)
    perm = jnp.argsort(jnp.logical_not(mask_flat), stable=True).astype(jnp.int32)
    if size > n:
        perm = jnp.pad(perm, (0, size - n))
    idx = perm[:size]
    q = jnp.arange(size, dtype=jnp.int32)
    return jnp.where(q < total, idx, jnp.int32(fill_value))
