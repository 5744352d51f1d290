"""Differentiable mesh → image-buffer rendering orchestration.

TPU-native twin of ``render/render.py`` (render_mesh → render_layer → shade):
clip transform → rasterize → G-buffer interpolation → Monte-Carlo environment
shading (with SDF-volume shadows) → optional bilateral denoise → background
composite + silhouette antialias.

One call = one fully-jittable graph; batching over views is ``vmap`` over
(mvp, campos, key).  Deviations from the reference, chosen for TPU:

  * use_uv=False path only (the reference's training configs never bind UV
    textures; tangents are re-randomized per pixel, ``render.py:264-267``) —
    UV texture baking is provided separately in ``render_uv``.
  * The jitter-gradient smoothness buffers sample the material at
    world-jittered positions exactly like the reference (``render.py:68-74``);
    the *screen-space* normal-smoothness tap uses a one-pixel roll instead of
    a bilinear jitter texture fetch (same regularizer role).
  * spp/MSAA: supersampling is expressed by rendering at a higher resolution
    and average-pooling (``ops.math.avg_pool_nhwc``) in the caller.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import bsdf as bsdf_ops
from ..ops.denoiser import bilateral_denoiser
from ..ops.math import safe_normalize, xfm_points
from ..ops.mesh_ops import face_normals as compute_face_normals
from ..ops.rasterize import (
    antialias,
    bary_screen_derivs,
    interpolate,
    rasterize,
    rasterize_peel,
    rasterize_tiled,
)
from ..ops.shade import env_shade
from .light import EnvLight
from .material import MLPTexture3DConfig, MLPTexture3DParams, sample_mlp_texture


class RenderFlags(NamedTuple):
    resolution: tuple = (512, 512)
    n_samples: int = 8
    # Supersampling (ref render_mesh spp, render.py:333,361): rasterize +
    # shade at resolution·spp, average-pool every image buffer back down.
    # (The reference's msaa=True variant — shade at 1× after a nearest
    # downsample — is never enabled by its training scripts, ref default
    # msaa=False, FLAGS.spp=1.)
    spp: int = 1
    bsdf: str = "pbr"
    denoiser_demodulate: bool = True
    use_denoiser: bool = True
    raster_chunk: int = 256
    jitter_std: float = 0.01  # world-space material jitter (ref render.py:68)
    # Tiled (binned) rasterization — default path: ~7× faster than the
    # chunk scan at 512²/60k faces (368 vs 2789 ms measured on v5e).  The
    # scan path remains for depth peeling (second layer) and as a fallback
    # (tiled drops triangles beyond max_per_tile per tile).
    tiled_raster: bool = True
    tile_size: int = 16
    max_pairs: int | None = None
    max_per_tile: int = 1024
    # stage-B backend: None → Pallas kernel on TPU, XLA scan elsewhere
    raster_backend: str | None = None
    # Foreground-pixel compaction budget, as a fraction of the image. The
    # material tap and the MC shade loop are per-pixel gather-bound (hash
    # grid: 128 rows/point; shade: 2 HBM taps/step) but only FOREGROUND
    # pixels contribute — background rows are masked to zero. With a budget
    # set, foreground pixels are compacted (stable argsort on the coverage
    # mask, ~0.3 ms at 512²) into ceil(frac·P) slots, the material + shade
    # passes run on the compacted set, and results scatter back to the
    # image. Foreground pixels beyond the budget are dropped (rendered
    # black) and counted in buffers['n_px_dropped'] — same observable-
    # budget contract as the raster max_pairs. None → exact full-image path.
    shade_budget: float | None = None
    # MC steps evaluated per shade-loop iteration (vmapped) — see
    # ops.shade._mc_accumulate
    mc_block: int = 8
    # bf16 packed light texel for the MC loop's per-pixel-per-step gather
    # (halves its HBM bytes; quantization ≪ MC noise — ops.shade.env_shade)
    light_bf16: bool = True
    # Fraction of (compacted) pixels that take the SECOND, world-jittered
    # material tap feeding the kd/ks smoothness regularizers (ref
    # render.py:68-74). The regularizer is a mean, so a random strided
    # subset scaled by 1/frac is an unbiased estimator — and the tap is
    # already stochastic (fresh jitter noise each step). 1.0 = tap every
    # pixel. Only active together with shade_budget compaction.
    jitter_tap_frac: float = 0.25


def _fg_compact_idx(tri_id: jax.Array, p_full: int, budget: float | None):
    """Foreground-compaction permutation for a ``shade_budget`` fraction.

    Returns ``((perm, inv, n_slots) | None, px_dropped scalar)``.  Stable
    sort ⇒ foreground pixels first, in raster order; ``perm`` is a full
    pixel permutation (compacted rows = first ``n_slots``), ``inv`` its
    inverse.  Keeping BOTH directions lets compact/scatter run as pure
    gathers in forward AND backward (see :func:`_permute_compact` /
    :func:`_permute_scatter`) — XLA lowers an equivalent ``.at[idx].set``
    scatter to a sort + while loop, measured ~190 ms/step at 512².  ``None``
    when the budget covers the full image (exact path)."""
    if budget is None:
        return None, jnp.zeros((), jnp.int32)
    n_slots = min(p_full, -(-int(p_full * budget) // 1024) * 1024)
    if n_slots >= p_full:
        return None, jnp.zeros((), jnp.int32)
    fg_flat = (tri_id > 0).reshape(p_full)
    perm = jnp.argsort(jnp.logical_not(fg_flat), stable=True)
    inv = jnp.argsort(perm)
    dropped = jnp.maximum(0, jnp.sum(fg_flat.astype(jnp.int32)) - n_slots)
    return (
        jax.lax.stop_gradient(perm),
        jax.lax.stop_gradient(inv),
        n_slots,
    ), dropped


def _int_zero_cotangents(*arrs):
    import numpy as _np

    return tuple(_np.zeros(a.shape, dtype=jax.dtypes.float0) for a in arrs)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _permute_compact(img_flat, perm, inv, n_slots):
    """``img_flat[perm[:n_slots]]`` with a gather-only backward.

    The plain gather's transpose is a scatter-add; since ``perm`` is a
    permutation, the exact cotangent is instead ``concat(g, 0)[inv]`` — a
    gather.  Both directions stay on the fast gather path."""
    return img_flat[perm[:n_slots]]


def _permute_compact_fwd(img_flat, perm, inv, n_slots):
    return img_flat[perm[:n_slots]], (perm, inv, img_flat.shape[0])


def _permute_compact_bwd(n_slots, res, g):
    perm, inv, p_full = res
    pad = jnp.zeros((p_full - n_slots,) + g.shape[1:], g.dtype)
    dimg = jnp.concatenate([g, pad], axis=0)[inv]
    return (dimg,) + _int_zero_cotangents(perm, inv)


_permute_compact.defvjp(_permute_compact_fwd, _permute_compact_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _permute_scatter(rows, perm, inv, p_full):
    """Inverse of :func:`_permute_compact`: place compacted rows back at
    their pixels (zeros elsewhere) — a gather by ``inv`` in forward and a
    gather by ``perm`` in backward (never an XLA scatter)."""
    n = rows.shape[0]
    pad = jnp.zeros((p_full - n,) + rows.shape[1:], rows.dtype)
    return jnp.concatenate([rows, pad], axis=0)[inv]


def _permute_scatter_fwd(rows, perm, inv, p_full):
    return _permute_scatter(rows, perm, inv, p_full), (perm, inv, rows.shape[0])


def _permute_scatter_bwd(p_full, res, g):
    perm, inv, n = res
    return (g[perm[:n]],) + _int_zero_cotangents(perm, inv)


_permute_scatter.defvjp(_permute_scatter_fwd, _permute_scatter_bwd)


def render_mesh(
    key: jax.Array,
    verts: jax.Array,
    faces: jax.Array,
    v_nrm: jax.Array,
    msdf: Optional[jax.Array],
    mat_params: MLPTexture3DParams,
    mat_cfg: MLPTexture3DConfig,
    mvp: jax.Array,
    campos: jax.Array,
    light: EnvLight,
    flags: RenderFlags,
    background: Optional[jax.Array] = None,
    visibility_fn: Optional[Callable] = None,
    shadow_scale: jax.Array | float = 1.0,
    denoiser_sigma: jax.Array | float = 2.0,
    bsdf_override: Optional[str] = None,
    v_tex: Optional[jax.Array] = None,
    t_tex_idx: Optional[jax.Array] = None,
) -> dict:
    """Render one view.  Returns the reference's buffer dict
    (``render/render.py:169-191``) in NHWC-without-N layout (H, W, C).

    Materials (ref shade() render.py:66-97): ``mat_params`` is either an
    :class:`MLPTexture3DParams` (neural kd_ks field, sampled at world
    positions) or a dict of :class:`~gshell_tpu.render.texture.Texture2D`
    maps ``{'kd', 'ks'[, 'normal']}`` sampled at interpolated UVs — pass
    ``v_tex``/``t_tex_idx`` for the latter (kd may carry alpha in channel
    3; the normal map perturbs the shading normal)."""
    h, w = flags.resolution
    spp = flags.spp
    h, w = h * spp, w * spp
    bsdf = bsdf_override or flags.bsdf

    # ---- geometry pass ------------------------------------------------
    v_clip = xfm_points(verts, mvp)
    use_tiled = (
        flags.tiled_raster and h % flags.tile_size == 0 and w % flags.tile_size == 0
    )
    if use_tiled:
        rast = rasterize_tiled(
            v_clip, faces, (h, w), tile=flags.tile_size,
            max_pairs=flags.max_pairs, max_per_tile=flags.max_per_tile,
            backend=flags.raster_backend,
        )
    else:
        rast = rasterize(v_clip, faces, (h, w), chunk=flags.raster_chunk)
    mask = (rast.tri_id > 0).astype(jnp.float32)[..., None]  # (H, W, 1)

    # ONE fused interpolate for every per-vertex attribute (pos, smooth
    # normal, clip position, mSDF): each interpolate() call re-gathers the
    # selected triangle's clip corners and recomputes barycentrics — at 512²
    # that is ~57 ms/call on v5e, so fusing 4 calls into one saves ~170 ms
    # of forward (and the matching backward) per view.
    attr_list = [verts, v_nrm, v_clip]
    if msdf is not None:
        attr_list.append(msdf[:, None])
    attrs = jnp.concatenate(attr_list, axis=-1)  # (V, 10[+1])
    gb_attr = interpolate(attrs, rast, faces, v_clip=v_clip)
    gb_pos = gb_attr[..., 0:3]
    gb_normal_smooth = gb_attr[..., 3:6]
    clip_i = gb_attr[..., 6:10]
    msdf_image = gb_attr[..., 10:11] if msdf is not None else None

    fn = compute_face_normals(verts, faces)  # (F, 3)
    fid = jnp.maximum(rast.tri_id - 1, 0)
    gb_geo_normal = fn[fid] * mask

    # Random isotropic tangents (ref render.py:264-267, use_uv=False path)
    k_tng, k_jit, k_shade, k_nrmjit, k_tex, k_texj = jax.random.split(key, 6)
    noise = jax.random.normal(k_tng, gb_normal_smooth.shape)
    noise = safe_normalize(noise)
    gb_tangent = jnp.cross(noise, gb_normal_smooth)

    # Depth + depth-gradient (ref render.py:272-279); clip_i from the fused
    # interpolate above
    db = bary_screen_derivs(rast, faces, v_clip)
    tri_clip = v_clip[faces[fid]]  # (H, W, 3, 4)
    dattr_dx = (
        db[..., 0:1] * (tri_clip[..., 0, :] - tri_clip[..., 2, :])
        + db[..., 2:3] * (tri_clip[..., 1, :] - tri_clip[..., 2, :])
    )
    dattr_dy = (
        db[..., 1:2] * (tri_clip[..., 0, :] - tri_clip[..., 2, :])
        + db[..., 3:4] * (tri_clip[..., 1, :] - tri_clip[..., 2, :])
    )
    eps = 1e-5
    z0 = jnp.clip(clip_i[..., 2:3], min=eps) / jnp.clip(clip_i[..., 3:4], min=eps)
    dz = jnp.abs(dattr_dx[..., 2:3]) + jnp.abs(dattr_dy[..., 2:3])
    dw = jnp.abs(dattr_dx[..., 3:4]) + jnp.abs(dattr_dy[..., 3:4])
    z1 = jnp.clip(clip_i[..., 2:3] + dz, min=eps) / jnp.clip(clip_i[..., 3:4] + dw, min=eps)
    z_grad = jnp.abs(z1 - z0)
    gb_depth = jax.lax.stop_gradient(jnp.concatenate([z0, z_grad], axis=-1))

    # ---- foreground-pixel compaction (RenderFlags.shade_budget) --------
    p_full = h * w
    idx_c, px_dropped = _fg_compact_idx(rast.tri_id, p_full, flags.shade_budget)

    def _compact(img_c):
        """(H, W, C) → (n_slots, C) rows at the compacted pixels."""
        perm, inv, n_slots = idx_c
        return _permute_compact(img_c.reshape(p_full, -1), perm, inv, n_slots)

    def _scatter(rows, c):
        """(n_slots, C) → (H, W, C); uncompacted pixels get zeros."""
        perm, inv, _ = idx_c
        return _permute_scatter(rows, perm, inv, p_full).reshape(h, w, c)

    # ---- material pass (ref shade() render.py:66-97) -------------------
    omit_o = jnp.asarray([0.0, 1.0, 1.0])
    perturbed_nrm = None
    if isinstance(mat_params, dict):
        # Texture2D path (ref render.py:79-97 'kd'/'ks'/'normal' lookups):
        # interpolate UVs + screen-space UV derivatives for mip selection.
        assert v_tex is not None and t_tex_idx is not None, (
            "Texture2D materials need v_tex/t_tex_idx UV attributes"
        )
        from . import texture as tex2d

        gb_texc = interpolate(v_tex, rast, t_tex_idx, v_clip=v_clip)
        tri_uv = v_tex[t_tex_idx[fid]]  # (H, W, 3, 2)
        duv_dx = (
            db[..., 0:1] * (tri_uv[..., 0, :] - tri_uv[..., 2, :])
            + db[..., 2:3] * (tri_uv[..., 1, :] - tri_uv[..., 2, :])
        )
        duv_dy = (
            db[..., 1:2] * (tri_uv[..., 0, :] - tri_uv[..., 2, :])
            + db[..., 3:4] * (tri_uv[..., 1, :] - tri_uv[..., 2, :])
        )
        uv_da = jax.lax.stop_gradient(
            jnp.concatenate(
                [duv_dx[..., 0:1], duv_dy[..., 0:1], duv_dx[..., 1:2], duv_dy[..., 1:2]],
                axis=-1,
            )
        )
        kd4 = tex2d.sample(mat_params["kd"], gb_texc, uv_da)
        alpha = kd4[..., 3:4] if kd4.shape[-1] == 4 else jnp.ones_like(kd4[..., 0:1])
        kd = kd4[..., 0:3]
        ks = tex2d.sample(mat_params["ks"], gb_texc, uv_da)[..., 0:3]
        if "normal" in mat_params:
            perturbed_nrm = tex2d.sample(mat_params["normal"], gb_texc, uv_da)[..., 0:3]
        # screen-space jitter taps for the smoothness buffers (ref :85-97 —
        # dr.texture at a jittered pixel grid; roll is the in-repo analogue)
        shift_t = jax.random.randint(k_jit, (2,), -1, 2)
        tap = lambda img: jnp.roll(img, (shift_t[0], shift_t[1]), axis=(0, 1))
        grad_weight = mask * tap(mask)
        kd_grad = jnp.abs(tap(kd) - kd) * grad_weight
        ks_grad = jnp.abs(tap(ks) - ks) * omit_o * grad_weight
    else:
        # Main + jitter material taps in ONE sample call (2P points): the
        # hash-grid gather and MLP are per-point, so concatenating halves
        # the fixed per-call cost (two separate 262 ms calls at 512²).
        # Under shade_budget, both taps run only on the compacted
        # foreground pixels — the hash grid is the hottest per-pixel
        # gather (128 rows/point) in the whole step.
        pos_m = _compact(gb_pos) if idx_c is not None else gb_pos.reshape(p_full, 3)
        if idx_c is not None and flags.jitter_tap_frac < 1.0:
            # Jitter tap on a random CIRCULAR BLOCK [off, off+pj) of the
            # compacted rows (inclusion probability pj/n_sl per pixel, same
            # unbiased estimator as a strided subset) — selected and placed
            # back with wrap-extended slices only.  The previous strided-
            # subset `.at[sel].set` lowered to an XLA sort+while scatter,
            # measured ~240 ms/step at 512².
            n_sl = pos_m.shape[0]
            pj = min(n_sl, max(1024, int(n_sl * flags.jitter_tap_frac) // 256 * 256))
            off = jax.random.randint(k_texj, (), 0, n_sl)
            pos_ext = jnp.concatenate([pos_m, pos_m[:pj]], axis=0)
            pos_sel = jax.lax.dynamic_slice_in_dim(pos_ext, off, pj, axis=0)
            pos_j = pos_sel + flags.jitter_std * jax.random.normal(
                k_jit, (pj, 3)
            )
            both = sample_mlp_texture(
                mat_params, mat_cfg,
                jnp.concatenate([pos_m, pos_j], axis=0),
                key=k_tex,
            )
            tex_main, tex_j = both[:n_sl], both[n_sl:]
            tm_ext = jnp.concatenate([tex_main, tex_main[:pj]], axis=0)
            tm_sel = jax.lax.dynamic_slice_in_dim(tm_ext, off, pj, axis=0)
            grad_rows = jnp.abs(tex_j - tm_sel) * (n_sl / pj)
            gr_ext = jnp.zeros((n_sl + pj, 6), grad_rows.dtype)
            gr_ext = jax.lax.dynamic_update_slice_in_dim(
                gr_ext, grad_rows, off, axis=0
            )
            # fold the wrapped tail back onto the head
            grad_full = gr_ext[:n_sl].at[:pj].add(gr_ext[n_sl:])
            tex_rows = jnp.concatenate([tex_main, grad_full], -1)
            tex_img = _scatter(tex_rows, 12)
        else:
            jit_pos = pos_m + flags.jitter_std * jax.random.normal(
                k_jit, pos_m.shape
            )
            both = sample_mlp_texture(
                mat_params, mat_cfg,
                jnp.stack([pos_m, jit_pos], axis=0),
                key=k_tex,
            )
            tex_rows = jnp.concatenate([both[0], jnp.abs(both[1] - both[0])], -1)
            tex_img = (
                _scatter(tex_rows, 12) if idx_c is not None
                else tex_rows.reshape(h, w, 12)
            )
        kd, ks = tex_img[..., 0:3], tex_img[..., 3:6]
        kd_grad = tex_img[..., 6:9] * mask
        ks_grad = tex_img[..., 9:12] * omit_o * mask
        alpha = jnp.ones_like(kd[..., 0:1])

    # Screen-space normal smoothness tap (ref render.py:110-111)
    shift = jax.random.randint(k_nrmjit, (2,), -1, 2)
    nrm_rolled = jnp.roll(gb_normal_smooth, (shift[0], shift[1]), axis=(0, 1))
    nrm_grad = jnp.abs(nrm_rolled - gb_normal_smooth) * mask

    # ---- shading normal (ref render.py:118) ----------------------------
    view_pos = jnp.broadcast_to(campos.reshape(1, 1, 3), gb_pos.shape)
    gb_normal = bsdf_ops.prepare_shading_normal(
        gb_pos, view_pos, perturbed_nrm, gb_normal_smooth, gb_tangent,
        gb_geo_normal, two_sided_shading=True, opengl=True,
    )

    # ---- Monte-Carlo environment shading (ref render.py:127-152) -------
    if bsdf in ("pbr", "diffuse", "white"):
        kd_eff = jnp.ones_like(kd) if bsdf == "white" else kd
        ro = gb_pos + gb_normal * 0.001
        if idx_c is not None:
            # the whole MC loop (fwd + custom-VJP re-walks) runs only on
            # the compacted foreground rows
            packed = _compact(
                jnp.concatenate([ro, gb_pos, gb_normal, kd_eff, ks, mask], -1)
            )
            shade_in = (
                packed[:, 15:16], packed[:, 0:3], packed[:, 3:6],
                packed[:, 6:9],
                jnp.broadcast_to(campos.reshape(1, 3), (packed.shape[0], 3)),
                packed[:, 9:12], packed[:, 12:15],
            )
        else:
            p = h * w
            shade_in = (
                mask.reshape(p, 1), ro.reshape(p, 3), gb_pos.reshape(p, 3),
                gb_normal.reshape(p, 3), view_pos.reshape(p, 3),
                kd_eff.reshape(p, 3), ks.reshape(p, 3),
            )
        out = env_shade(
            k_shade,
            *shade_in,
            light,
            n_samples_x=flags.n_samples,
            bsdf=bsdf,
            shadow_scale=shadow_scale,
            visibility_fn=visibility_fn,
            mc_block=flags.mc_block,
            light_bf16=flags.light_bf16,
        )
        if idx_c is not None:
            ds = _scatter(jnp.concatenate([out.diffuse, out.specular], -1), 6)
            diffuse_accum, specular_accum = ds[..., 0:3], ds[..., 3:6]
        else:
            diffuse_accum = out.diffuse.reshape(h, w, 3)
            specular_accum = out.specular.reshape(h, w, 3)

        if flags.use_denoiser and flags.denoiser_demodulate:
            sig = jnp.asarray(denoiser_sigma)
            diffuse_accum = bilateral_denoiser(diffuse_accum, gb_normal, gb_depth, sig)
            specular_accum = bilateral_denoiser(specular_accum, gb_normal, gb_depth, sig)

        if bsdf in ("white", "diffuse"):
            shaded_col = diffuse_accum * kd_eff
        else:
            kd_m = kd_eff * (1.0 - ks[..., 2:3])  # kd · (1 − metalness)
            shaded_col = diffuse_accum * kd_m + specular_accum

        if flags.use_denoiser and not flags.denoiser_demodulate:
            shaded_col = bilateral_denoiser(
                shaded_col, gb_normal, gb_depth, jnp.asarray(denoiser_sigma)
            )
    elif bsdf == "normal":
        shaded_col = (gb_normal + 1.0) * 0.5
        diffuse_accum = specular_accum = None
    elif bsdf == "kd":
        shaded_col = kd
        diffuse_accum = specular_accum = None
    elif bsdf == "ks":
        shaded_col = ks
        diffuse_accum = specular_accum = None
    else:
        raise ValueError(f"Invalid BSDF '{bsdf}'")

    # ---- composite + antialias (ref render.py:352-359) ------------------
    if background is None:
        background = jnp.zeros((h, w, 3))
    elif spp > 1 and background.shape[0] != h:
        background = jnp.repeat(jnp.repeat(background, spp, axis=0), spp, axis=1)
    # composite alpha = coverage × texture alpha (ref composite_buffer
    # render.py:352-359 lerp weight)
    m_a = mask * alpha
    comp = background * (1.0 - m_a) + shaded_col * m_a
    comp_rgba = jnp.concatenate([comp, m_a], axis=-1)
    shaded = antialias(comp_rgba, rast, v_clip, faces)

    # inverse depth (ref render.py:180, used by the use_depth losses)
    dist = jnp.sqrt(jnp.clip(jnp.sum((gb_pos - view_pos) ** 2, -1, keepdims=True), min=1e-12))
    invdepth = (1.0 / dist) * mask

    buffers = {
        "shaded": shaded,
        "mask": mask,
        "invdepth": jnp.concatenate([invdepth, jnp.ones_like(alpha)], -1),
        "kd": jnp.concatenate([kd * mask, alpha], -1),
        "ks": jnp.concatenate([ks * mask, alpha], -1),
        "kd_grad": jnp.concatenate([kd_grad, alpha], -1),
        "ks_grad": jnp.concatenate([ks_grad, alpha], -1),
        "normal_grad": jnp.concatenate([nrm_grad, alpha], -1),
        "normal": jnp.concatenate([gb_normal * mask, alpha], -1),
        "geometric_normal": jnp.concatenate([gb_geo_normal, alpha], -1),
        "z_grad": jnp.concatenate([gb_depth, jnp.zeros_like(alpha), alpha], -1),
    }
    if diffuse_accum is not None:
        buffers["diffuse_light"] = jnp.concatenate([diffuse_accum, alpha], -1)
        buffers["specular_light"] = jnp.concatenate([specular_accum, alpha], -1)
    if perturbed_nrm is not None:
        # ref render.py:112-116 perturbed-normal smoothness buffers
        pn_tap = jnp.roll(perturbed_nrm, (shift[0], shift[1]), axis=(0, 1))
        pn_grad = 1.0 - safe_normalize(
            safe_normalize(pn_tap) + safe_normalize(perturbed_nrm)
        )[..., 2:3]
        buffers["perturbed_nrm"] = jnp.concatenate([perturbed_nrm, alpha], -1)
        buffers["perturbed_nrm_grad"] = jnp.concatenate(
            [jnp.repeat(pn_grad, 3, axis=-1) * mask, alpha], -1
        )

    # mSDF image for the open/close hinge losses (ref render.py:302-309) —
    # interpolated in the fused attribute pass above
    if msdf is not None:
        buffers["msdf_image"] = msdf_image

    # spp down-filter (ref render.py:361 avg_pool_nhwc on the composite; we
    # pool every image buffer so loss/regularizer consumers see base res)
    if spp > 1:
        from ..ops.math import avg_pool_nhwc

        buffers = {
            k: avg_pool_nhwc(v[None], spp)[0] if v.ndim == 3 else v
            for k, v in buffers.items()
        }

    # Visible-vertex mask (ref render.py:380-383 visible_triangles → used by
    # the mSDF close regularizer, gshell_tets_geometry.py:343-348)
    nv = verts.shape[0]
    vis_faces = faces[fid].reshape(-1)
    hit_rep = jnp.repeat((rast.tri_id > 0).reshape(-1), 3)
    vis_vert = jnp.zeros((nv,), jnp.bool_).at[vis_faces].max(hit_rep)
    buffers["visible_vert_mask"] = vis_vert

    # raster budget saturation counter (0 on the exact scan path) — surfaced
    # into train metrics beside n_valid_tets so silent silhouette holes from
    # an exhausted max_pairs/max_per_tile budget are observable
    buffers["n_raster_dropped"] = rast.dropped
    # foreground pixels beyond the shade_budget (0 when disabled) — these
    # render black; observable for the same reason as n_raster_dropped
    buffers["n_px_dropped"] = px_dropped

    return buffers


def render_uv(
    v_tex: jax.Array,
    t_tex_idx: jax.Array,
    v_pos: jax.Array,
    t_pos_idx: jax.Array,
    resolution: tuple[int, int],
    mat_params: MLPTexture3DParams,
    mat_cfg: MLPTexture3DConfig,
    raster_chunk: int = 256,
):
    """Bake the neural material into a UV texture atlas
    (ref ``render/render.py:449-466`` render_uv): rasterize the mesh in UV
    space, interpolate world positions, sample the MLP texture.

    Returns (mask (H,W,1), kd (H,W,3), ks (H,W,3))."""
    uv_clip = v_tex * 2.0 - 1.0
    uv_clip4 = jnp.concatenate(
        [uv_clip, jnp.zeros_like(uv_clip[..., :1]), jnp.ones_like(uv_clip[..., :1])],
        axis=-1,
    )
    rast = rasterize(uv_clip4, t_tex_idx, resolution, chunk=raster_chunk)
    gb_pos = interpolate(v_pos, rast, t_pos_idx)
    all_tex = sample_mlp_texture(mat_params, mat_cfg, gb_pos)
    mask = (rast.tri_id > 0).astype(jnp.float32)[..., None]
    return mask, all_tex[..., 0:3], all_tex[..., 3:6]


def render_second_layer(
    key: jax.Array,
    verts: jax.Array,
    faces: jax.Array,
    v_nrm: jax.Array,
    mat_params: MLPTexture3DParams,
    mat_cfg: MLPTexture3DConfig,
    mvp: jax.Array,
    campos: jax.Array,
    light: EnvLight,
    flags: RenderFlags,
    background: Optional[jax.Array] = None,
    shadow_scale: jax.Array | float = 0.0,
    visibility_fn=None,
) -> dict:
    """Second depth layer (ref use_img_2nd_layer losses,
    gshell_tets_geometry.py:287-297): rasterize the 2nd-nearest surface per
    pixel, shade it, composite + antialias.  Returns
    {'shaded_second', 'invdepth_second'}."""
    h, w = flags.resolution
    v_clip = xfm_points(verts, mvp)
    _, rast2 = rasterize_peel(v_clip, faces, (h, w), chunk=flags.raster_chunk, n_layers=2)
    mask = (rast2.tri_id > 0).astype(jnp.float32)[..., None]

    gb_pos = interpolate(verts, rast2, faces, v_clip=v_clip)
    gb_nrm = interpolate(v_nrm, rast2, faces, v_clip=v_clip)
    fn = compute_face_normals(verts, faces)
    fid = jnp.maximum(rast2.tri_id - 1, 0)
    gb_geo = fn[fid] * mask
    k_tng, k_shade = jax.random.split(key)
    noise = safe_normalize(jax.random.normal(k_tng, gb_nrm.shape))
    gb_tangent = jnp.cross(noise, gb_nrm)
    view_pos = jnp.broadcast_to(campos.reshape(1, 1, 3), gb_pos.shape)
    gb_normal = bsdf_ops.prepare_shading_normal(
        gb_pos, view_pos, None, gb_nrm, gb_tangent, gb_geo,
        two_sided_shading=True, opengl=True,
    )
    p = h * w
    idx_c, px_dropped2 = _fg_compact_idx(rast2.tri_id, p, flags.shade_budget)
    if idx_c is not None:
        perm2, inv2, n_slots2 = idx_c
        packed = _permute_compact(
            jnp.concatenate([gb_pos, gb_normal, mask], -1).reshape(p, 7),
            perm2, inv2, n_slots2,
        )
        pos_s, nrm_s, mask_s = packed[:, 0:3], packed[:, 3:6], packed[:, 6:7]
        view_s = jnp.broadcast_to(campos.reshape(1, 3), pos_s.shape)
    else:
        pos_s, nrm_s = gb_pos.reshape(p, 3), gb_normal.reshape(p, 3)
        mask_s, view_s = mask.reshape(p, 1), view_pos.reshape(p, 3)
    tex_s = sample_mlp_texture(mat_params, mat_cfg, pos_s)
    kd_s, ks_s = tex_s[..., 0:3], tex_s[..., 3:6]
    out = env_shade(
        k_shade, mask_s, pos_s + nrm_s * 1e-3,
        pos_s, nrm_s, view_s,
        kd_s, ks_s, light,
        n_samples_x=flags.n_samples, bsdf=flags.bsdf,
        shadow_scale=shadow_scale, visibility_fn=visibility_fn,
        mc_block=flags.mc_block, light_bf16=flags.light_bf16,
    )
    kd_m_s = kd_s * (1.0 - ks_s[..., 2:3])
    shaded_rows = out.diffuse * kd_m_s + out.specular  # (Ps, 3)
    if idx_c is not None:
        shaded = _permute_scatter(shaded_rows, perm2, inv2, p).reshape(h, w, 3)
    else:
        shaded = shaded_rows.reshape(h, w, 3)
    if background is None:
        background = jnp.zeros((h, w, 3))
    comp = background * (1.0 - mask) + shaded * mask
    comp_rgba = jnp.concatenate([comp, mask], -1)
    shaded_aa = antialias(comp_rgba, rast2, v_clip, faces)
    dist = jnp.sqrt(
        jnp.clip(jnp.sum((gb_pos - view_pos) ** 2, -1, keepdims=True), min=1e-12)
    )
    return {
        "shaded_second": shaded_aa,
        "invdepth_second": jnp.concatenate(
            [(1.0 / dist) * mask, jnp.ones_like(mask)], -1
        ),
        # second-layer budget overflow, surfaced like the first layer's
        "n_px_dropped_second": px_dropped2,
    }
