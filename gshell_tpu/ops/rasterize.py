"""Differentiable TPU rasterizer: coverage, interpolation, analytic antialias.

TPU-native replacement for nvdiffrast (``dr.rasterize`` / ``dr.interpolate`` /
``dr.antialias``), used by the reference at ``render/render.py:377-379,
240-275, 352-359``.  Design:

  * ``rasterize``      — pure *discrete* visibility: per pixel, the nearest
    covering triangle id and its perspective-correct barycentrics.  Not
    differentiated (the discrete argmin has no useful gradient); outputs are
    stop-gradiented.
  * ``interpolate``    — re-computes barycentrics *differentiably* from the
    clip positions of the selected triangle, then blends vertex attributes.
    This reproduces nvdiffrast's position+attribute gradients via plain JAX
    autodiff instead of hand-written CUDA backward kernels.
  * ``antialias``      — nvdiffrast-style silhouette antialiasing on
    neighbor pixel pairs with differing triangle ids; the blend weight is a
    differentiable function of the crossing point of the winning triangle's
    edge, which is what moves silhouettes during optimization.

Scaling: ``rasterize`` scans static triangle chunks; the binned variant for
10⁵–10⁶-face meshes lives in ``rasterize_tiled`` (same outputs).

Conventions: OpenGL-style clip space; with the reference's projection matrix
(``render/util.py`` perspective, y row negated) pixel row 0 is the top of the
image.  Triangle ids in the rast buffer are 1-based; 0 = background.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Rast(NamedTuple):
    tri_id: jax.Array  # (H, W) int32; 0 = background, else face index + 1
    bary: jax.Array  # (H, W, 2) perspective-correct (b0, b1); b2 = 1-b0-b1
    zbuf: jax.Array  # (H, W) NDC depth of hit (+BIG at background)
    # Overflow observability: count of (triangle, tile) pairs / per-tile
    # triangles silently dropped by the fixed-capacity binning.  The
    # reference's hardware raster is exact; a fixed-budget TPU raster must
    # surface saturation instead (a saturated budget shows up as silhouette
    # holes).  0 for the exact scan path.  (Default is a PYTHON int so the
    # class definition never runs a JAX computation at import time — a
    # device-array default would initialize the backend as an import side
    # effect, breaking jax.distributed.initialize()-after-import flows.)
    dropped: jax.Array | int = 0


_W_EPS = 1e-6
_BIG = jnp.float32(3.4e38)


def _pixel_centers(h: int, w: int):
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    return ys, xs


def _tri_screen(v_clip: jax.Array, faces: jax.Array, h: int, w: int):
    """Screen-space positions (x∈[0,W], y∈[0,H]) + ndc z + 1/w per corner."""
    tri = v_clip[faces]  # (F, 3, 4)
    ww = tri[..., 3]
    valid_w = ww > _W_EPS
    inv_w = jnp.where(valid_w, 1.0 / jnp.maximum(ww, _W_EPS), 0.0)
    ndc = tri[..., :3] * inv_w[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * w
    sy = (ndc[..., 1] * 0.5 + 0.5) * h
    return sx, sy, ndc[..., 2], inv_w, valid_w.all(axis=-1)


def _edge_coeffs(sx, sy):
    """Per-triangle edge-function coefficients.

    Edge k is opposite corner k:  e_k(p) = a_k x + b_k y + c_k, and the
    screen barycentric of corner k is b_k = e_k / (2·area).
    """
    x0, x1, x2 = sx[..., 0], sx[..., 1], sx[..., 2]
    y0, y1, y2 = sy[..., 0], sy[..., 1], sy[..., 2]
    a0, b0, c0 = y1 - y2, x2 - x1, x1 * y2 - x2 * y1
    a1, b1, c1 = y2 - y0, x0 - x2, x2 * y0 - x0 * y2
    a2, b2, c2 = y0 - y1, x1 - x0, x0 * y1 - x1 * y0
    area2 = a2 * (x2 - x0) + b2 * (y2 - y0)  # = 2 * signed area
    a = jnp.stack([a0, a1, a2], -1)
    b = jnp.stack([b0, b1, b2], -1)
    c = jnp.stack([c0, c1, c2], -1)
    return a, b, c, area2


def rasterize(
    v_clip: jax.Array,
    faces: jax.Array,
    resolution: tuple[int, int],
    chunk: int = 128,
) -> Rast:
    """Rasterize, scanning static triangle chunks (fully jittable).

    v_clip: (V, 4) clip-space positions.  faces: (F, 3) int32 (degenerate /
    padded faces never cover).  resolution: (H, W).
    """
    return rasterize_peel(v_clip, faces, resolution, chunk=chunk, n_layers=1)[0]


def rasterize_peel(
    v_clip: jax.Array,
    faces: jax.Array,
    resolution: tuple[int, int],
    chunk: int = 128,
    n_layers: int = 1,
) -> list[Rast]:
    """Depth-peeled rasterization: the k-th result is the k-th nearest
    surface per pixel (nvdiffrast ``DepthPeeler.rasterize_next_layer``,
    ref ``render/render.py:377-394`` / use_img_2nd_layer losses).  A single
    scan maintains the n_layers closest (depth, id) pairs."""
    h, w = resolution
    f = faces.shape[0]
    pad = (-f) % chunk
    # Padded rows gather v_clip[0] three times → zero area → culled.
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))

    sx, sy, z, inv_w, tri_ok = _tri_screen(v_clip, faces_p, h, w)
    tri_ok = tri_ok & (jnp.arange(faces_p.shape[0]) < f)
    a, b, c, area2 = _edge_coeffs(sx, sy)

    ys, xs = _pixel_centers(h, w)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    px = px.reshape(-1)  # (P,)
    py = py.reshape(-1)

    n_chunks = faces_p.shape[0] // chunk
    nonzero = jnp.abs(area2) > 1e-12
    area_safe = jnp.where(nonzero, area2, 1.0)

    def body(carry, idx):
        zs, ids = carry  # each: tuple of (P,) per layer, sorted ascending z
        sl = lambda t: jax.lax.dynamic_slice_in_dim(t, idx * chunk, chunk, axis=0)
        ca, cb, cc = sl(a), sl(b), sl(c)
        e = (
            ca[None, :, :] * px[:, None, None]
            + cb[None, :, :] * py[:, None, None]
            + cc[None, :, :]
        )  # (P, chunk, 3)
        # Orientation-normalized edge functions + top-left fill rule so a
        # pixel exactly on a shared edge is claimed by exactly one triangle
        # (critical for depth peeling; same role as the hardware rule
        # nvdiffrast inherits from the GPU rasterizer).
        s_or = jnp.sign(sl(area2))[None, :, None]
        eo = e * s_or
        ao = ca[None, :, :] * s_or
        bo = cb[None, :, :] * s_or
        on_edge_ok = (ao > 0.0) | ((ao == 0.0) & (bo > 0.0))
        cover = ((eo > 0.0) | ((eo == 0.0) & on_edge_ok)).all(-1) & (
            sl(nonzero) & sl(tri_ok)
        )[None, :]
        sb = e / sl(area_safe)[None, :, None]
        depth = (sb * sl(z)[None, :, :]).sum(-1)
        cover = cover & (depth >= -1.0) & (depth <= 1.0)
        depth = jnp.where(cover, depth, _BIG)  # (P, chunk)

        # take the n_layers best within this chunk, then merge with carry
        new_zs, new_ids = list(zs), list(ids)
        for _layer in range(n_layers):
            k = jnp.argmin(depth, axis=-1)
            zk = jnp.take_along_axis(depth, k[:, None], axis=-1)[:, 0]
            idk = (idx * chunk + k).astype(jnp.int32)
            # knock out the taken triangle for the next within-chunk pick
            depth = depth.at[jnp.arange(depth.shape[0]), k].set(_BIG)
            # insertion into the sorted carry lists
            cand_z, cand_id = zk, idk
            for l in range(n_layers):
                better = cand_z < new_zs[l]
                nz = jnp.where(better, cand_z, new_zs[l])
                ni = jnp.where(better, cand_id, new_ids[l])
                cand_z = jnp.where(better, new_zs[l], cand_z)
                cand_id = jnp.where(better, new_ids[l], cand_id)
                new_zs[l], new_ids[l] = nz, ni
        return (tuple(new_zs), tuple(new_ids)), None

    init = (
        tuple(jnp.full((h * w,), _BIG) for _ in range(n_layers)),
        tuple(jnp.full((h * w,), -1, jnp.int32) for _ in range(n_layers)),
    )
    (zs, ids), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))

    outs = []
    for l in range(n_layers):
        best_z, best_id = zs[l], ids[l]
        hit = best_id >= 0
        tri_id = jnp.where(hit, best_id + 1, 0).reshape(h, w)
        zbuf = jnp.where(hit, best_z, _BIG).reshape(h, w)
        bary = _recompute_bary(v_clip, faces, tri_id.reshape(-1), px, py, h, w)
        outs.append(
            Rast(
                tri_id=jax.lax.stop_gradient(tri_id),
                bary=jax.lax.stop_gradient(bary.reshape(h, w, 2)),
                zbuf=jax.lax.stop_gradient(zbuf),
            )
        )
    return outs


def _recompute_bary(v_clip, faces, tri_id, px, py, h, w):
    """Perspective-correct (b0, b1) for each pixel's selected triangle.

    Differentiable w.r.t. ``v_clip`` — the gradient path through which
    interior shading moves vertices (nvdiffrast's rasterize backward)."""
    fid = jnp.maximum(tri_id - 1, 0)
    tri = v_clip[faces[fid]]  # (P, 3, 4)
    ww = tri[..., 3]
    inv_w = 1.0 / jnp.maximum(ww, _W_EPS)
    sx = (tri[..., 0] * inv_w * 0.5 + 0.5) * w
    sy = (tri[..., 1] * inv_w * 0.5 + 0.5) * h
    a, b, c, area2 = _edge_coeffs(sx, sy)
    e = a * px[:, None] + b * py[:, None] + c  # (P, 3)
    # 1e-6 px² degenerate threshold: the backward of e/area is O(1/area²)
    # and must stay finite in f32 for silhouette-grazing triangles.
    ok = jnp.abs(area2) > 1e-6
    area_safe = jnp.where(ok, area2, 1.0)
    sb = e / area_safe[:, None]
    pc = sb * inv_w  # perspective correction
    denom = pc.sum(-1, keepdims=True)
    dok = jnp.abs(denom) > 1e-8
    pc = pc / jnp.where(dok, denom, 1.0)
    pc = jnp.where((ok[:, None] & dok), pc, jnp.asarray([[1.0, 0.0, 0.0]]))
    return pc[:, :2]


def interpolate(
    attr: jax.Array,
    rast: Rast,
    faces: jax.Array,
    v_clip: jax.Array | None = None,
) -> jax.Array:
    """Blend per-vertex attributes at each pixel (nvdiffrast ``interpolate``).

    If ``v_clip`` is given, barycentrics are *recomputed differentiably* from
    it (gradients flow to positions); otherwise the stored rast barycentrics
    are used (attribute gradients only).

    attr: (V, C).  Returns (H, W, C); zeros at background.
    """
    h, w = rast.tri_id.shape
    tri_id = rast.tri_id.reshape(-1)
    if v_clip is not None:
        ys, xs = _pixel_centers(h, w)
        py, px = jnp.meshgrid(ys, xs, indexing="ij")
        b01 = _recompute_bary(
            v_clip, faces, tri_id, px.reshape(-1), py.reshape(-1), h, w
        )
    else:
        b01 = rast.bary.reshape(-1, 2)
    b2 = 1.0 - b01.sum(-1, keepdims=True)
    bary = jnp.concatenate([b01, b2], axis=-1)  # (P, 3)
    fid = jnp.maximum(tri_id - 1, 0)
    av = attr[faces[fid]]  # (P, 3, C)
    out = (av * bary[..., None]).sum(axis=1)
    hit = (tri_id > 0)[:, None].astype(out.dtype)
    return (out * hit).reshape(h, w, -1)


def bary_screen_derivs(rast: Rast, faces: jax.Array, v_clip: jax.Array) -> jax.Array:
    """(H, W, 4) = (du/dx, du/dy, dv/dx, dv/dy) of the perspective-correct
    barycentrics — nvdiffrast's ``rast_db`` (texture LOD / z-grad)."""
    h, w = rast.tri_id.shape
    tri_id = rast.tri_id.reshape(-1)
    fid = jnp.maximum(tri_id - 1, 0)
    tri = v_clip[faces[fid]]
    ww = tri[..., 3]
    inv_w = 1.0 / jnp.maximum(ww, _W_EPS)
    sx = (tri[..., 0] * inv_w * 0.5 + 0.5) * w
    sy = (tri[..., 1] * inv_w * 0.5 + 0.5) * h
    a, b, c, area2 = _edge_coeffs(sx, sy)
    ys, xs = _pixel_centers(h, w)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    px, py = px.reshape(-1), py.reshape(-1)
    area_safe = jnp.where(jnp.abs(area2) > 1e-6, area2, 1.0)[:, None]
    e = a * px[:, None] + b * py[:, None] + c
    sb = e / area_safe
    dsb_dx = a / area_safe
    dsb_dy = b / area_safe
    # B = (sb·iw) / S,  S = Σ sb·iw
    q = sb * inv_w
    s = q.sum(-1, keepdims=True)
    s = jnp.where(jnp.abs(s) > 1e-8, s, 1.0)
    dq_dx = dsb_dx * inv_w
    dq_dy = dsb_dy * inv_w
    ds_dx = dq_dx.sum(-1, keepdims=True)
    ds_dy = dq_dy.sum(-1, keepdims=True)
    db_dx = (dq_dx * s - q * ds_dx) / (s * s)
    db_dy = (dq_dy * s - q * ds_dy) / (s * s)
    out = jnp.stack([db_dx[:, 0], db_dy[:, 0], db_dx[:, 1], db_dy[:, 1]], axis=-1)
    hit = (tri_id > 0)[:, None].astype(out.dtype)
    return (out * hit).reshape(h, w, 4)


# ----------------------------------------------------------------------------
# Tiled (binned) rasterization — for 10⁵⁺-face meshes at high resolution
# ----------------------------------------------------------------------------


def _stage_b_pallas(
    pair_data: jax.Array,  # (P_pad, 16) f32, pair-major, sorted by tile
    tile_start: jax.Array,  # (n_tiles,) int32 segment offsets into pair_data
    tile_cnt: jax.Array,  # (n_tiles,) int32 segment lengths
    n_tiles: int,
    tx_n: int,
    tile: int,
    k_chunk: int,
    interpret: bool = False,
):
    """Per-tile coverage as a Pallas kernel.

    Each grid program owns a GROUP of 8 tiles (Mosaic requires output
    sublane blocks of ≥8): per tile it walks the tile's pair segment in
    ``k_chunk``-row DMA slices (HBM → VMEM) with a DYNAMIC trip count —
    tiles with few triangles do proportionally little work, unlike the XLA
    scan which pays ``max_per_tile`` everywhere — and runs the edge tests
    as (k_chunk, tile²) VPU ops (triangles on sublanes, pixels on lanes).
    There is no per-tile triangle cap: segments are walked to their end.

    ``pair_data`` is packed as (C, 16, 128) super-chunks — 128 pairs per
    chunk, 16 attributes per pair on sublanes — because Mosaic requires
    HBM slices aligned to the (·, 128) lane tiling; dynamic indexing on the
    LEADING axis is unrestricted, so segments are walked super-chunk-wise
    with global-index masking at both ends.  Attribute rows:
      [a0 a1 a2 | b0 b1 b2 | c0 c1 c2 | z0 z1 z2 | area2 | tri_id+1 | 0 0]

    Returns (best_z (n_tiles, tile²) f32, best_idf (n_tiles, tile²) f32 —
    tri_id+1 encoded as float (exact below 2²⁴), 0 = miss).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BIG_F = 3.4e38  # python float: pallas kernels must not capture traced consts

    px_n = tile * tile
    G = 8  # tiles per program (output sublane block)
    n_groups = (n_tiles + G - 1) // G
    pad_t = n_groups * G - n_tiles
    if pad_t:
        tile_start = jnp.concatenate([tile_start, jnp.zeros((pad_t,), jnp.int32)])
        tile_cnt = jnp.concatenate([tile_cnt, jnp.zeros((pad_t,), jnp.int32)])

    def kernel(start_ref, cnt_ref, pair_ref, out_z_ref, out_id_ref, buf, sem):
        i = pl.program_id(0)
        lin = jax.lax.broadcasted_iota(jnp.int32, (1, px_n), 1)

        for t in range(G):  # unrolled: 8 tiles per program
            tid = i * G + t
            start = start_ref[tid]
            cnt = cnt_ref[tid]

            # Pixel centers of this tile, pixels along LANES: (1, tile²).
            ty = tid // tx_n
            tx = tid % tx_n
            py = (ty * tile + lin // tile).astype(jnp.float32) + 0.5
            px = (tx * tile + lin % tile).astype(jnp.float32) + 0.5

            c0 = start // k_chunk
            c1 = (start + cnt - 1) // k_chunk  # valid only when cnt > 0
            n_ch = jnp.where(cnt > 0, c1 - c0 + 1, 0)

            def body(k, carry, start=start, cnt=cnt, px=px, py=py, c0=c0):
                best_z, best_id = carry
                dma = pltpu.make_async_copy(pair_ref.at[c0 + k], buf, sem)
                dma.start()
                dma.wait()
                s = jnp.transpose(buf[:], (1, 0))  # (k_chunk pairs, 16)
                row = jax.lax.broadcasted_iota(jnp.int32, (k_chunk, 1), 0)
                g = (c0 + k) * k_chunk + row  # global pair index
                in_seg = (g >= start) & (g < start + cnt)  # (k_chunk, 1)

                ar = s[:, 12:13]  # (k_chunk, 1)
                s_or = jnp.sign(ar)
                cover = in_seg & (jnp.abs(ar) > 1e-12)
                depth_num = jnp.zeros((k_chunk, px_n), jnp.float32)
                for e in range(3):
                    a = s[:, e : e + 1]
                    b = s[:, 3 + e : 4 + e]
                    c = s[:, 6 + e : 7 + e]
                    z = s[:, 9 + e : 10 + e]
                    ev = a * px + b * py + c  # (k_chunk, tile²)
                    eo = ev * s_or
                    ao = a * s_or
                    bo = b * s_or
                    edge_ok = (ao > 0.0) | ((ao == 0.0) & (bo > 0.0))
                    cover = cover & ((eo > 0.0) | ((eo == 0.0) & edge_ok))
                    depth_num = depth_num + ev * z
                depth = depth_num * pl.reciprocal(
                    jnp.where(jnp.abs(ar) > 1e-12, ar, 1.0), approx=False
                )
                cover = cover & (depth >= -1.0) & (depth <= 1.0)
                depth = jnp.where(cover, depth, BIG_F)
                zc = jnp.min(depth, axis=0, keepdims=True)  # (1, tile²)
                idf = s[:, 13:14]
                idc = jnp.min(
                    jnp.where(depth == zc, idf, BIG_F), axis=0, keepdims=True
                )
                better = zc < best_z
                return (
                    jnp.where(better, zc, best_z),
                    jnp.where(better, idc, best_id),
                )

            init = (
                jnp.full((1, px_n), BIG_F, jnp.float32),
                jnp.zeros((1, px_n), jnp.float32),
            )
            best_z, best_id = jax.lax.fori_loop(0, n_ch, body, init)
            out_z_ref[:, t, :] = best_z
            out_id_ref[:, t, :] = jnp.where(best_id >= BIG_F, 0.0, best_id)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, G, px_n), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, px_n), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, k_chunk), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((n_groups, G, px_n), jnp.float32),
        jax.ShapeDtypeStruct((n_groups, G, px_n), jnp.float32),
    )
    bz, bidf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tile_start, tile_cnt, pair_data)
    return (
        bz.reshape(n_groups * G, px_n)[:n_tiles],
        bidf.reshape(n_groups * G, px_n)[:n_tiles],
    )


def rasterize_tiled(
    v_clip: jax.Array,
    faces: jax.Array,
    resolution: tuple[int, int],
    tile: int = 16,
    max_pairs: int | None = None,
    max_per_tile: int = 512,
    k_chunk: int = 64,
    backend: str | None = None,
    pallas_interpret: bool = False,
) -> Rast:
    """Two-stage rasterization: analytic (triangle, tile) pair expansion +
    sort-based binning, then per-tile coverage.  Replaces the
    O(pixels × faces) scan of :func:`rasterize` with
    O(pixels × tris-per-tile) — the TPU counterpart of nvdiffrast's
    hardware binning.  Fully static shapes:

      stage A: bbox → tile-rect per triangle; pair j is decoded via
               searchsorted on the cumulative rect sizes (no host loop);
               pairs sorted by tile id; per-tile segments located by
               searchsorted again.
      stage B: per tile, coverage + z-test over the tile's pair segment.
               On TPU this runs as a Pallas kernel (:func:`_stage_b_pallas`)
               with a dynamic per-tile trip count and NO per-tile triangle
               cap; elsewhere (and with ``backend="xla"``) an XLA scan over
               ``max_per_tile`` gathered triangle slots.

    Overflow behavior: pairs beyond ``max_pairs`` are dropped; the XLA
    backend additionally drops triangles beyond ``max_per_tile`` per tile.

    ``backend``: None → "pallas" on TPU, "xla" otherwise.
    """
    h, w = resolution
    assert h % tile == 0 and w % tile == 0
    ty_n, tx_n = h // tile, w // tile
    n_tiles = ty_n * tx_n
    f = faces.shape[0]
    if max_pairs is None:
        # f·n_tiles is the exact worst case (every triangle covers every
        # tile) and is affordable for small meshes; for large face counts
        # fall back to 8 pairs/triangle.  (4·f measurably overflowed at
        # 128²/55k-slot meshes — triangles span proportionally more tiles
        # at low resolution — and the dropped pairs punched persistent
        # silhouette holes that fragmented the reconstruction.  The
        # n_raster_dropped counter observes any remaining saturation.)
        max_pairs = min(f * n_tiles, max(8 * f, 4096))

    sx, sy, z, inv_w, tri_ok = _tri_screen(v_clip, faces, h, w)
    a, b, c, area2 = _edge_coeffs(sx, sy)
    nonzero = jnp.abs(area2) > 1e-12
    ok = tri_ok & nonzero

    # --- stage A: binning ------------------------------------------------
    x0 = jnp.clip(jnp.floor(sx.min(-1) / tile).astype(jnp.int32), 0, tx_n - 1)
    x1 = jnp.clip(jnp.floor(sx.max(-1) / tile).astype(jnp.int32), 0, tx_n - 1)
    y0 = jnp.clip(jnp.floor(sy.min(-1) / tile).astype(jnp.int32), 0, ty_n - 1)
    y1 = jnp.clip(jnp.floor(sy.max(-1) / tile).astype(jnp.int32), 0, ty_n - 1)
    # cull fully off-screen triangles
    off = (sx.max(-1) < 0) | (sx.min(-1) >= w) | (sy.max(-1) < 0) | (sy.min(-1) >= h)
    ok = ok & ~off
    rw = x1 - x0 + 1
    counts = jnp.where(ok, rw * (y1 - y0 + 1), 0)
    offsets = jnp.cumsum(counts)
    total = offsets[-1]
    starts = offsets - counts

    j = jnp.arange(max_pairs, dtype=jnp.int32)
    # pair j → triangle: instead of searchsorted(offsets, j) — a 17-round
    # vmapped binary search, ~95 ms/step at 786k pairs — mark each nonempty
    # segment's start with a scatter-ADD (order-independent, fast native
    # lowering) and take a cumsum: pair_rank[j] = #starts ≤ j − 1, then map
    # rank → triangle id through the stable-argsort compaction of nonempty
    # triangles.  All gathers/cumsums, ~5× cheaper.
    nz = counts > 0
    ind = jnp.zeros((max_pairs,), jnp.int32).at[
        jnp.where(nz, starts, max_pairs)
    ].add(1, mode="drop")
    pair_rank = jnp.cumsum(ind) - 1  # non-decreasing, ≥0 past the first start
    order_nz = jnp.argsort(jnp.logical_not(nz), stable=True)  # nz tris first
    pair_tri = order_nz[jnp.clip(pair_rank, 0, f - 1)].astype(jnp.int32)
    local = j - starts[pair_tri]
    pw = jnp.maximum(rw[pair_tri], 1)
    ptile = (y0[pair_tri] + local // pw) * tx_n + x0[pair_tri] + local % pw
    pair_valid = j < total
    ptile = jnp.where(pair_valid, ptile, n_tiles)  # invalid → sentinel bin

    # pairs beyond the max_pairs budget never enter the sort → count them
    dropped_pairs = jnp.maximum(total - max_pairs, 0).astype(jnp.int32)

    order = jnp.argsort(ptile)
    s_tile = ptile[order]
    s_tri = pair_tri[order]

    tile_start = jnp.searchsorted(s_tile, jnp.arange(n_tiles, dtype=jnp.int32), side="left")
    tile_end = jnp.searchsorted(s_tile, jnp.arange(n_tiles, dtype=jnp.int32), side="right")

    if backend is None:
        backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"

    if backend == "pallas":
        kcp = 128  # pallas chunk: full sublane group per DMA
        tri_s = s_tri  # (max_pairs,) already clipped to [0, f)
        pd = jnp.concatenate(
            [
                a[tri_s],
                b[tri_s],
                c[tri_s],
                z[tri_s],
                area2[tri_s][:, None],
                (tri_s + 1).astype(jnp.float32)[:, None],
                jnp.zeros((max_pairs, 2), jnp.float32),
            ],
            axis=1,
        )
        # sentinel-bin pairs (beyond `total`) are sorted past every real
        # tile's segment.  Pack into (C, 16, kcp) super-chunks (see
        # _stage_b_pallas layout note).
        n_sc = (max_pairs + kcp - 1) // kcp
        pd = jnp.pad(pd, ((0, n_sc * kcp - max_pairs), (0, 0)))
        pd = pd.reshape(n_sc, kcp, 16).transpose(0, 2, 1)
        # Discrete visibility is non-differentiable (outputs are
        # stop-gradiented in _stitch_tiles); cut tangents BEFORE the
        # kernel — pallas_call has no JVP rule.
        pd = jax.lax.stop_gradient(pd)
        bz, bidf = _stage_b_pallas(
            pd,
            tile_start.astype(jnp.int32),
            (tile_end - tile_start).astype(jnp.int32),
            n_tiles,
            tx_n,
            tile,
            kcp,
            interpret=pallas_interpret,
        )
        best_id = bidf.astype(jnp.int32) - 1  # -1 = miss
        best_z = jnp.where(best_id >= 0, bz, _BIG)
        return _stitch_tiles(
            best_z, best_id, v_clip, faces, h, w, ty_n, tx_n, tile,
            dropped=dropped_pairs,
        )

    tile_cnt = jnp.minimum(tile_end - tile_start, max_per_tile)
    # XLA backend: triangles beyond max_per_tile within a tile are dropped too
    dropped_tris = jnp.sum(
        jnp.maximum((tile_end - tile_start) - max_per_tile, 0)
    ).astype(jnp.int32)

    # per-tile triangle lists (n_tiles, max_per_tile)
    gather_idx = tile_start[:, None] + jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    in_range = jnp.arange(max_per_tile)[None, :] < tile_cnt[:, None]
    gather_idx = jnp.clip(gather_idx, 0, max_pairs - 1)
    tile_tris = jnp.where(in_range, s_tri[gather_idx], -1)

    # --- stage B: per-tile coverage --------------------------------------
    tys = jnp.arange(tile, dtype=jnp.float32) + 0.5
    txs = jnp.arange(tile, dtype=jnp.float32) + 0.5
    oy, ox = jnp.meshgrid(tys, txs, indexing="ij")
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_px = (tids % tx_n).astype(jnp.float32)[:, None] * tile + ox.reshape(-1)[None, :]
    tile_py = (tids // tx_n).astype(jnp.float32)[:, None] * tile + oy.reshape(-1)[None, :]
    # (n_tiles, tile²)

    n_kc = max_per_tile // k_chunk

    def body(carry, kc):
        best_z, best_id = carry  # (n_tiles, tile²)
        sl = jax.lax.dynamic_slice_in_dim(tile_tris, kc * k_chunk, k_chunk, axis=1)
        valid = sl >= 0
        tri = jnp.clip(sl, 0, f - 1)  # (n_tiles, k_chunk)
        ca, cb, cc = a[tri], b[tri], c[tri]  # (n_tiles, k_chunk, 3)
        e = (
            ca[:, None, :, :] * tile_px[:, :, None, None]
            + cb[:, None, :, :] * tile_py[:, :, None, None]
            + cc[:, None, :, :]
        )  # (n_tiles, tile², k_chunk, 3)
        ar = area2[tri]
        s_or = jnp.sign(ar)[:, None, :, None]
        eo = e * s_or
        ao = ca[:, None, :, :] * s_or
        bo = cb[:, None, :, :] * s_or
        edge_ok = (ao > 0.0) | ((ao == 0.0) & (bo > 0.0))
        cover = ((eo > 0.0) | ((eo == 0.0) & edge_ok)).all(-1) & valid[:, None, :]
        sb = e / jnp.where(jnp.abs(ar) > 1e-12, ar, 1.0)[:, None, :, None]
        depth = (sb * z[tri][:, None, :, :]).sum(-1)
        cover = cover & (depth >= -1.0) & (depth <= 1.0)
        depth = jnp.where(cover, depth, _BIG)
        k = jnp.argmin(depth, axis=-1)  # (n_tiles, tile²)
        zk = jnp.take_along_axis(depth, k[..., None], axis=-1)[..., 0]
        idk = jnp.take_along_axis(tri, k, axis=-1)
        better = zk < best_z
        return (
            jnp.where(better, zk, best_z),
            jnp.where(better, idk, best_id),
        ), None

    init = (
        jnp.full((n_tiles, tile * tile), _BIG),
        jnp.full((n_tiles, tile * tile), -1, jnp.int32),
    )
    (best_z, best_id), _ = jax.lax.scan(body, init, jnp.arange(n_kc))
    return _stitch_tiles(
        best_z, best_id, v_clip, faces, h, w, ty_n, tx_n, tile,
        dropped=dropped_pairs + dropped_tris,
    )


def _stitch_tiles(
    best_z, best_id, v_clip, faces, h, w, ty_n, tx_n, tile,
    dropped=0,
) -> Rast:
    """(n_tiles, tile²) per-tile winners → image-layout :class:`Rast`."""
    best_z = best_z.reshape(ty_n, tx_n, tile, tile).transpose(0, 2, 1, 3).reshape(h, w)
    best_id = best_id.reshape(ty_n, tx_n, tile, tile).transpose(0, 2, 1, 3).reshape(h, w)
    hit = best_id >= 0
    tri_id = jnp.where(hit, best_id + 1, 0)
    zbuf = jnp.where(hit, best_z, _BIG)

    ys, xs = _pixel_centers(h, w)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    bary = _recompute_bary(
        v_clip, faces, tri_id.reshape(-1), px.reshape(-1), py.reshape(-1), h, w
    ).reshape(h, w, 2)
    return Rast(
        tri_id=jax.lax.stop_gradient(tri_id),
        bary=jax.lax.stop_gradient(bary),
        zbuf=jax.lax.stop_gradient(zbuf),
        dropped=jax.lax.stop_gradient(dropped),
    )


# ----------------------------------------------------------------------------
# Antialiasing
# ----------------------------------------------------------------------------


def antialias(
    color: jax.Array,
    rast: Rast,
    v_clip: jax.Array,
    faces: jax.Array,
) -> jax.Array:
    """Silhouette antialiasing (nvdiffrast ``antialias`` semantics).

    For every horizontal/vertical neighbor pair with differing triangle ids,
    the nearer ("leading") triangle's separating edge is intersected with the
    segment between the two pixel centers; the crossing position s ∈ [0, 1]
    yields a blend of up to half a pixel:

        s > ½ : other pixel is partially covered by the leading triangle
                → blend other toward lead color with weight (s − ½);
        s < ½ : leading pixel is partially uncovered
                → blend lead toward other color with weight (½ − s).

    Corrections from all pairs are accumulated additively (the reference
    kernel accumulates atomically).  s is differentiable w.r.t. ``v_clip`` —
    the silhouette gradient.  color: (H, W, C).
    """
    h, w = rast.tri_id.shape
    tri_id = rast.tri_id
    z = rast.zbuf

    ys, xs = _pixel_centers(h, w)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")

    delta = jnp.zeros_like(color)

    for axis in (1, 0):
        if axis == 1:
            ia = (slice(None), slice(0, w - 1))
            ib = (slice(None), slice(1, w))
        else:
            ia = (slice(0, h - 1), slice(None))
            ib = (slice(1, h), slice(None))

        id_a, id_b = tri_id[ia], tri_id[ib]
        differs = id_a != id_b
        z_a, z_b = z[ia], z[ib]
        a_leads = jnp.where(id_b == 0, True, jnp.where(id_a == 0, False, z_a <= z_b))
        lead_fid = jnp.maximum(jnp.where(a_leads, id_a, id_b) - 1, 0)

        # ONE corner gather per pair: edge functions are affine, and pixel b
        # is exactly one pixel step from pixel a — e_b = e_a + (a|b) coeff.
        # (Evaluating edge_vals separately at both pixels doubled the gather
        # and its backward scatter-add into v_clip, ~30 ms/step at 512².)
        tri = v_clip[faces[lead_fid]]
        ww = tri[..., 3]
        inv_w = 1.0 / jnp.maximum(ww, _W_EPS)
        sxc = (tri[..., 0] * inv_w * 0.5 + 0.5) * w
        syc = (tri[..., 1] * inv_w * 0.5 + 0.5) * h
        ca, cb, cc, area2 = _edge_coeffs(sxc, syc)
        s_or = jnp.sign(area2)[..., None]
        e_a = (ca * px[ia][..., None] + cb * py[ia][..., None] + cc) * s_or
        e_b = e_a + (ca if axis == 1 else cb) * s_or
        e_lead = jnp.where(a_leads[..., None], e_a, e_b)
        e_other = jnp.where(a_leads[..., None], e_b, e_a)

        # Edge crossing on the lead→other segment: sign flips + → −.
        crossing = (e_lead > 0.0) & (e_other < 0.0)
        denom = e_lead - e_other
        # Edge-function values are in pixel² units; a 1e-3 floor keeps the
        # O(1/denom²) backward finite with no visible effect on s.
        denom = jnp.where(jnp.abs(denom) > 1e-3, denom, 1.0)
        s_all = jnp.where(crossing, e_lead / denom, _BIG)
        s = jnp.min(s_all, axis=-1)
        has_edge = differs & (s <= 1.0)
        s = jnp.clip(jnp.where(has_edge, s, 0.5), 0.0, 1.0)[..., None]

        c_a, c_b = color[ia], color[ib]
        c_lead = jnp.where(a_leads[..., None], c_a, c_b)
        c_other = jnp.where(a_leads[..., None], c_b, c_a)
        m = has_edge[..., None].astype(color.dtype)

        d_other = jnp.clip(s - 0.5, 0.0, 0.5) * m * (c_lead - c_other)
        d_lead = jnp.clip(0.5 - s, 0.0, 0.5) * m * (c_other - c_lead)
        d_a = jnp.where(a_leads[..., None], d_lead, d_other)
        d_b = jnp.where(a_leads[..., None], d_other, d_lead)

        if axis == 1:
            delta = delta.at[:, :-1, :].add(d_a)
            delta = delta.at[:, 1:, :].add(d_b)
        else:
            delta = delta.at[:-1, :, :].add(d_a)
            delta = delta.at[1:, :, :].add(d_b)

    return color + delta
