"""Spatial (pixel-axis) sharding of the renderer over the device mesh.

SURVEY.md §5.7: the reference has no sequence axis to shard — the honest
TPU-native scaling axes are the *pixel/ray* axes of the renderer and the
voxel axes of the U-Net.  This module splits the image into row bands with
``shard_map``: every device rasterizes + shades its own band against the
(replicated) mesh, so coverage-scan and Monte-Carlo shading cost divide by
the mesh size with zero collectives in the forward pass (gradients to the
replicated mesh/material/light psum automatically).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_row_sharded_render(
    render_rows_fn: Callable,
    mesh: Mesh,
    axis: str = "data",
):
    """Wrap a renderer of the form ``fn(row0, shapes...) -> (rows, W, C)``
    into a shard_map over row bands.

    ``render_rows_fn(band_idx, *args) -> (band_h, W, C)`` must be
    shape-polymorphic only in static band size; all args are replicated.
    """
    n = mesh.shape[axis]

    def sharded(h: int, *args):
        def per_band(band_ids, *a):
            # band_ids: (1,) this device's band index
            return render_rows_fn(band_ids[0], *a)

        band_ids = jnp.arange(n, dtype=jnp.int32)
        fn = jax.shard_map(
            per_band,
            mesh=mesh,
            in_specs=(P(axis),) + tuple(P() for _ in args),
            out_specs=P(axis),
        )
        return fn(band_ids, *args)

    return sharded


def shard_image_rows(mesh: Mesh, axis: str = "data"):
    """NamedSharding that splits (H, W, C) buffers across image rows."""
    return NamedSharding(mesh, P(axis))


def pixel_sharded_shade(env_shade_fn, mesh: Mesh, axis: str = "data"):
    """Shard a flattened-pixel shading call over the mesh: inputs (P, C) are
    split on the pixel axis, the light/material pytrees are replicated.

    Usage: wrap ``ops.shade.env_shade`` when a single view's MC shading
    dominates (large resolution × n_samples²) and views alone can't fill the
    mesh."""

    def wrapped(key, mask, ro, gb_pos, gb_normal, view_pos, kd, ks, light, **kw):
        def inner(mask, ro, gb_pos, gb_normal, view_pos, kd, ks, light):
            return env_shade_fn(
                key, mask, ro, gb_pos, gb_normal, view_pos, kd, ks, light, **kw
            )

        fn = jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=P(axis),
        )
        return fn(mask, ro, gb_pos, gb_normal, view_pos, kd, ks, light)

    return wrapped
