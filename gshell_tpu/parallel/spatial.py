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


def band_mvp(mvp: jax.Array, y0, h_band: int, h_full: int) -> jax.Array:
    """Viewport-restricted MVP: the returned matrix renders image rows
    ``[y0, y0 + h_band)`` of an ``h_full``-row image as an ``h_band``-row
    image with IDENTICAL pixel geometry (same pixel size, same sample
    positions).

    Derivation: the rasterizer maps ndc_y → sy = (ndc_y·0.5 + 0.5)·h.  For
    the band viewport we need sy' = sy − y0 with h' = h_band, which is the
    affine clip-space change y' = a·y + b·w, a = h/h', b = (h − h' − 2·y0)/h'.
    ``y0`` may be traced (e.g. derived from ``jax.lax.axis_index``).
    """
    a = h_full / h_band
    b = (h_full - h_band - 2.0 * y0) / h_band
    return mvp.at[1].set(a * mvp[1] + b * mvp[3])


def render_batch_banded(
    mesh: Mesh,
    render_fn: Callable,
    consts,
    keys_data: jax.Array,  # (nv, nb, key_words) uint32 PRNG key data
    mvp: jax.Array,  # (B, 4, 4)
    campos: jax.Array,  # (B, 3)
    background: jax.Array,  # (B, H, W, 3)
    resolution: tuple,
    pad: int = 16,
    view_axis: str = "view",
    band_axis: str = "band",
):
    """Shard a multi-view render over a 2-axis (view × band) device mesh.

    Each device renders ONE view's ONE horizontal row band, with ``pad``
    halo rows above and below so every windowed image op — antialias (1 px),
    the bilateral denoiser (radius 11), screen-space jitter taps — sees real
    rendered context; the halo is cropped before stitching.  The forward is
    fully communication-free; gradients to the replicated scene args
    (mesh/material/light in ``consts``) are psum-reduced by the shard_map
    transpose — the TPU-native analogue of the reference's per-GPU NCCL
    all-reduce (SURVEY.md §5.7/§5.8), except the axis is *pixels*, which the
    reference cannot shard at all.

    ``render_fn(consts, key, mvp, campos, bg_band, band_resolution) →
    buffers`` must be band-resolution polymorphic (static shapes per call).
    Buffers whose leading dim equals the band height are treated as image
    buffers (cropped, stitched to (B, H, W, C) sharded over view×band);
    ``visible_vert_mask`` is OR-reduced across shards (returned (1, V) to
    match the unsharded views-leading layout); ``n_raster_dropped`` is
    summed.

    Known edge effect: the top/bottom bands render halo rows *outside* the
    true image, so antialias/denoiser taps at image rows 0 and H−1 differ
    slightly from the unsharded render (which zero-pads there).  Confined to
    the outermost image rows; reconstruction targets keep margins.
    """
    nv, nb = mesh.shape[view_axis], mesh.shape[band_axis]
    h, w = resolution
    b_views = mvp.shape[0]
    assert b_views % nv == 0 and h % nb == 0, (b_views, nv, h, nb)
    assert b_views == nv, "one view per view-axis device slot (batch == nv)"
    hb = h // nb
    hb2 = hb + 2 * pad

    # background with `pad` edge-replicated halo rows for the band slices
    bg_pad = jnp.pad(background, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="edge")

    def per_shard(consts, kd, mvp_, campos_, bg_):
        j = jax.lax.axis_index(band_axis)
        y0 = j * hb - pad
        m = band_mvp(mvp_[0], y0.astype(jnp.float32), hb2, h)
        bg_band = jax.lax.dynamic_slice_in_dim(bg_[0], j * hb, hb2, axis=0)
        key = jax.random.wrap_key_data(kd[0, 0])
        bufs = render_fn(consts, key, m, campos_[0], bg_band, (hb2, w))
        imgs, vis = {}, None
        counters = {
            "n_raster_dropped": jnp.zeros((), jnp.int32),
            "n_px_dropped": jnp.zeros((), jnp.int32),
            "n_px_dropped_second": jnp.zeros((), jnp.int32),
        }
        for name, v in bufs.items():
            if name == "visible_vert_mask":
                vis = jax.lax.pmax(
                    v.astype(jnp.float32), (view_axis, band_axis)
                )
            elif name in counters:
                counters[name] = jax.lax.psum(v, (view_axis, band_axis))
            else:
                assert v.ndim == 3 and v.shape[0] == hb2, (
                    f"banded render: unexpected non-image buffer '{name}' "
                    f"{v.shape} (band height {hb2})"
                )
                imgs[name] = v[pad : pad + hb][None]  # (1, hb, W, C)
        return imgs, vis, counters

    P_img = P(view_axis, band_axis)
    # probe output structure without running: rely on render_fn's buffer dict
    # being static — build specs lazily via shard_map's pytree out_specs
    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(),
            P(view_axis, band_axis),
            P(view_axis),
            P(view_axis),
            P(view_axis),
        ),
        out_specs=(P_img, P(), P()),
        check_vma=False,
    )
    imgs, vis, counters = fn(consts, keys_data, mvp, campos, bg_pad)
    imgs["visible_vert_mask"] = (vis > 0)[None]  # (1, V): any-over-shards
    for name, v in counters.items():
        imgs[name] = v[None]
    return imgs


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
