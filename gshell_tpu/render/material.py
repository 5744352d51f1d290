"""Neural PBR material: hash-grid + MLP texture (tiny-cuda-nn replacement).

TPU-native twin of ``render/mlptexture.py:47-106`` (MLPTexture3D): a 16-level
hash-grid encoding feeding a bias-free 2×32 ReLU MLP, sigmoid-squashed into
per-channel [min, max].  The reference's ×128 gradient-scaling hooks
(``mlptexture.py:72-74,83``) are reproduced with ``scale_grad`` between the
encoder and the MLP; the additional ÷8 on hash-table grads at optimizer time
(``train_gshelltet_deepfashion.py:435``) lives in the trainer's gradient
transform.

The material dict convention follows the reference (``render/material.py``):
``{'kd_ks': MLPTexture3D, 'bsdf': 'pbr'}`` for reconstruction.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..geometry.mlp import apply_relu_mlp, init_relu_mlp
from ..ops.hashgrid import (
    HashGridConfig,
    HashGridParams,
    hashgrid_encode,
    hashgrid_encode_stochastic,
    init_hashgrid,
)
from ..ops.math import scale_grad, scale_img_nhwc

GRADIENT_SCALING = 128.0


class MLPTexture3DConfig(NamedTuple):
    channels: int = 6
    internal_dims: int = 32
    hidden: int = 2
    hash: HashGridConfig = HashGridConfig()
    aabb_min: tuple = (-1.0, -1.0, -1.0)
    aabb_max: tuple = (1.0, 1.0, 1.0)
    min_max: tuple | None = None  # ((c_min,)*C, (c_max,)*C)
    # Fraction of sample points whose hash-TABLE gradients are kept each
    # step (unbiased, 1/frac-scaled; see hashgrid_encode_stochastic).
    # 1.0 = exact.  Only active in training calls that pass a key.
    table_grad_frac: float = 0.125


class MLPTexture3DParams(NamedTuple):
    tables: HashGridParams
    mlp: list  # list of weight matrices


def init_mlp_texture(key: jax.Array, cfg: MLPTexture3DConfig) -> MLPTexture3DParams:
    k1, k2 = jax.random.split(key)
    tables = init_hashgrid(k1, cfg.hash)
    dims = (
        [cfg.hash.out_dim]
        + [cfg.internal_dims] * cfg.hidden
        + [cfg.channels]
    )
    mlp = init_relu_mlp(k2, dims)
    return MLPTexture3DParams(tables=tables, mlp=mlp)


def sample_mlp_texture(
    params: MLPTexture3DParams,
    cfg: MLPTexture3DConfig,
    pos: jax.Array,
    key: jax.Array | None = None,
) -> jax.Array:
    """Sample the material field at world positions (ref ``mlptexture.py:88-99``).

    ``key``: training callers pass a PRNG key to enable the stochastic
    table-gradient estimator (``cfg.table_grad_frac``); evaluation callers
    omit it and get exact gradients."""
    aabb_min = jnp.asarray(cfg.aabb_min)
    aabb_max = jnp.asarray(cfg.aabb_max)
    shp = pos.shape[:-1]
    x = (pos.reshape(-1, 3) - aabb_min) / (aabb_max - aabb_min)
    x = jnp.clip(x, 0.0, 1.0)
    if key is not None and cfg.table_grad_frac < 1.0:
        feat = hashgrid_encode_stochastic(
            params.tables, x, cfg.hash, key, cfg.table_grad_frac
        )
    else:
        feat = hashgrid_encode(params.tables, x, cfg.hash)
    feat = scale_grad(feat, GRADIENT_SCALING)
    out = apply_relu_mlp(params.mlp, feat)
    out = jax.nn.sigmoid(out)
    if cfg.min_max is not None:
        lo = jnp.asarray(cfg.min_max[0])
        hi = jnp.asarray(cfg.min_max[1])
        out = out * (hi - lo) + lo
    return out.reshape(*shp, cfg.channels)


def load_mtl(path: str) -> list[dict]:
    """Minimal .mtl parser (twin of ``render/material.py`` load_mtl):
    returns material dicts with 'name', 'bsdf', and kd/ks values or texture
    paths (resolution deferred to the caller)."""
    materials = []
    mat = None
    base = __import__("os").path.dirname(path)
    for line in open(path):
        tok = line.split()
        if not tok:
            continue
        if tok[0] == "newmtl":
            mat = {"name": tok[1], "bsdf": "pbr"}
            materials.append(mat)
        elif mat is None:
            continue
        elif tok[0] == "map_Kd":
            mat["kd_path"] = __import__("os").path.join(base, tok[1])
        elif tok[0] == "map_Ks":
            mat["ks_path"] = __import__("os").path.join(base, tok[1])
        elif tok[0] == "bump":
            mat["normal_path"] = __import__("os").path.join(base, tok[1])
        elif tok[0] == "Kd":
            mat["kd"] = [float(v) for v in tok[1:4]]
        elif tok[0] == "Ks":
            mat["ks"] = [float(v) for v in tok[1:4]]
    return materials


def save_mtl(path: str, name: str = "defaultMat", kd=(0.8, 0.8, 0.8), ks=(0.0, 0.5, 0.0)):
    """Minimal .mtl writer (twin of ``render/material.py`` save_mtl)."""
    with open(path, "w") as f:
        f.write(f"newmtl {name}\nbsdf pbr\n")
        f.write(f"Kd {kd[0]} {kd[1]} {kd[2]}\n")
        f.write(f"Ks {ks[0]} {ks[1]} {ks[2]}\n")


def _material_channel(mat: dict, name: str):
    """Per-material texel data for channel ``name`` ('kd'/'ks'/'normal') as a
    numpy (H, W, C) array, or None when the material has neither a texture
    nor a flat value for it.  Accepts arrays under ``{name}_data``, Texture2D
    under ``{name}_tex``, an on-disk path under ``{name}_path``, or a flat
    color under ``name`` (stored as a 1×1 texel)."""
    import numpy as np

    from .texture import Texture2D

    if f"{name}_data" in mat:
        return np.asarray(mat[f"{name}_data"], np.float32)
    if f"{name}_tex" in mat and isinstance(mat[f"{name}_tex"], Texture2D):
        return np.asarray(mat[f"{name}_tex"].base, np.float32)
    if f"{name}_path" in mat:
        from ..utils.image import load_image

        return np.asarray(load_image(mat[f"{name}_path"]), np.float32)[..., :3]
    if name in mat:
        return np.asarray(mat[name], np.float32).reshape(1, 1, -1)
    return None


def merge_materials(materials: list[dict], texcoords, tfaces, mfaces):
    """Merge per-face materials into ONE uber-material texture atlas.

    Twin of the reference's ``render/material.py:118-169`` merge_materials:
    every material's kd/ks/normal maps are resized to the common maximum
    resolution and laid out side-by-side along u (the x axis) of a single
    power-of-two atlas (edge-replicated padding on the unused area); texture
    coordinates are remapped per (tex-vertex, material-index) pair —
    duplicating tex-vertices shared across materials — so each face samples
    its own tile: ``u' = (matIdx + u) * tile_w / atlas_w``.

    Args:
      materials: list of material dicts (see ``load_mtl`` / ``_material_channel``).
      texcoords: (T, 2) float uv coordinates.
      tfaces: (F, 3) int per-face tex-vertex indices.
      mfaces: (F,) int per-face material index into ``materials``.

    Returns ``(uber_material, new_texcoords, new_tfaces)`` where
    ``uber_material`` carries ``Texture2D`` entries under 'kd'/'ks'/'normal'
    for every channel any input defines.
    """
    import numpy as np

    from .texture import create_trainable

    assert len(materials) > 0
    bsdf = materials[0].get("bsdf", "pbr")
    assert all(m.get("bsdf", "pbr") == bsdf for m in materials), (
        "all materials must share one BSDF (uber shader)"
    )
    texcoords = np.asarray(texcoords, np.float32)
    tfaces = np.asarray(tfaces, np.int64)
    mfaces = np.asarray(mfaces, np.int64)
    n_mat = len(materials)

    channels = ["kd", "ks", "normal"]
    per_chan = {c: [_material_channel(m, c) for m in materials] for c in channels}

    # Common tile resolution: max over all textures of all materials.
    max_res = np.array([1, 1])
    for maps in per_chan.values():
        for m in maps:
            if m is not None:
                max_res = np.maximum(max_res, m.shape[:2])
    # Atlas resolution: tiles side-by-side along x, rounded up to PoT.
    full_res = (2 ** np.ceil(np.log2(max_res * np.array([1, n_mat])))).astype(int)

    uber = {"name": "uber_material", "bsdf": bsdf}
    defaults = {"kd": (0.8, 0.8, 0.8), "ks": (0.0, 0.5, 0.0), "normal": (0.5, 0.5, 1.0)}
    for c in channels:
        maps = per_chan[c]
        if all(m is None for m in maps):
            continue
        tiles = []
        for m in maps:
            if m is None:
                m = np.asarray(defaults[c], np.float32).reshape(1, 1, 3)
            t = jnp.asarray(m, jnp.float32)[None]
            t = scale_img_nhwc(t, (int(max_res[0]), int(max_res[1])), method="bilinear")
            tiles.append(np.asarray(t[0]))
        row = np.concatenate(tiles, axis=1)  # (tile_h, tile_w*n_mat, C)
        # Edge-replicate into the PoT padding (unused atlas area).
        pad_h = int(full_res[0] - row.shape[0])
        pad_w = int(full_res[1] - row.shape[1])
        atlas = np.pad(row, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
        uber[c] = create_trainable(atlas)

    # UV remap: duplicate tex-vertices per (vertex, material) pair.
    # key = ti * n_mat + matIdx identifies each needed atlas vertex.
    flat_ti = tfaces.reshape(-1)
    flat_mi = np.repeat(mfaces, 3)
    keys = flat_ti * n_mat + flat_mi
    uniq, inverse = np.unique(keys, return_inverse=True)
    new_tfaces = inverse.reshape(-1, 3).astype(np.int32)
    src_ti = uniq // n_mat
    src_mi = uniq % n_mat
    # scale factors: used fraction of the PoT atlas per axis
    s_v = max_res[0] / full_res[0]  # vertical (v)
    s_u = max_res[1] / full_res[1]  # horizontal (u), per-tile
    new_texcoords = np.stack(
        [
            (src_mi + texcoords[src_ti, 0]) * s_u,
            texcoords[src_ti, 1] * s_v,
        ],
        axis=-1,
    ).astype(np.float32)
    return uber, new_texcoords, new_tfaces


def default_kd_ks_min_max(
    kd_min=(0.0, 0.0, 0.0),
    kd_max=(1.0, 1.0, 1.0),
    ks_min=(0.0, 0.001, 0.0),
    ks_max=(0.0, 1.0, 1.0),
):
    """Combined 6-channel (kd | ks) range, matching the reference's
    ``initial_guess_material`` (``train_gshelltet_deepfashion.py:155-170``)
    and config ks ranges."""
    return (tuple(kd_min) + tuple(ks_min), tuple(kd_max) + tuple(ks_max))
