"""Bisect the held-out PSNR ceiling of the synthetic quality runs.

The shadow-consistent rerun (out/skirt_q4) landed at 16.57 dB — barely above
q3's 16.09 — so the round-4 'shadow GT parity' root cause was NOT the
binding ceiling.  Hypothesis ladder, measured here:

  A. MC-noise floor of the GT itself: DatasetMesh renders GT at the
     training spp — two datasets with identical views but decorrelated MC
     noise (render_seed) PSNR'd against each other.  No reconstruction can
     beat this number at this spp.
  B. The same floor at spp 32 (how much headroom a higher-spp eval buys).

Usage: python tools/dev/_r5_psnr_floor.py <config.json> <gt.obj> [n_views]
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

cfg_path, gt_path = sys.argv[1], sys.argv[2]
n_views = int(sys.argv[3]) if len(sys.argv) > 3 else 2

from gshell_tpu.data.datasets import DatasetMesh
from gshell_tpu.render.light import create_trainable_env_rnd
from gshell_tpu.render.material import (
    MLPTexture3DConfig,
    default_kd_ks_min_max,
    init_mlp_texture,
)
from gshell_tpu.render.mesh import load_obj, unit_size
from gshell_tpu.render.render import RenderFlags
from gshell_tpu.utils.config import load_flags
from gshell_tpu.utils.cache import enable_compilation_cache
from gshell_tpu.ops.math import mse_to_psnr, rgb_to_srgb

enable_compilation_cache()
flags = load_flags(cfg_path)
aabb = np.asarray(flags.aabb, np.float32).reshape(2, 3)
mat_cfg = MLPTexture3DConfig(
    channels=6, aabb_min=tuple(aabb[0]), aabb_max=tuple(aabb[1]),
    min_max=default_kd_ks_min_max(flags.kd_min[:3], flags.kd_max[:3],
                                  flags.ks_min, flags.ks_max),
)
gt_mesh = unit_size(load_obj(gt_path))
gt_light = create_trainable_env_rnd(jax.random.PRNGKey(42), 256)
gt_mat = init_mlp_texture(jax.random.PRNGKey(43), mat_cfg)


def floor_at(spp):
    rf = RenderFlags(resolution=tuple(flags.train_res), n_samples=spp,
                     bsdf=flags.bsdf,
                     use_denoiser=flags.denoiser == "bilateral")
    kw = dict(n_views=n_views, seed=777,
              shadows=getattr(flags, "gt_shadows", False))
    a = DatasetMesh(gt_mesh, gt_light, gt_mat, mat_cfg, rf, **kw)
    b = DatasetMesh(gt_mesh, gt_light, gt_mat, mat_cfg, rf,
                    render_seed=1, **kw)
    ia = jnp.clip(rgb_to_srgb(jnp.asarray(a.imgs[..., :3])), 0, 1)
    ib = jnp.clip(rgb_to_srgb(jnp.asarray(b.imgs[..., :3])), 0, 1)
    ps = float(mse_to_psnr(jnp.mean((ia - ib) ** 2)))
    print(f"spp={spp:3d}: GT self-PSNR (MC-noise floor) = {ps:.2f} dB",
          flush=True)


for spp in (flags.n_samples, 32):
    floor_at(spp)
