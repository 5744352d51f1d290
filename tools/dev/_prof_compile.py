"""Compile-time attribution of the train step (VERDICT #5: <120s target).

Times .lower().compile() of nested subsets of the step at a small image res
(compile cost tracks HLO structure, not array sizes) against the TPU target.
Usage: python tools/dev/_prof_compile.py [res] [grid] [spp] [batch]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

# The axon TPU plugin WINS over the JAX_PLATFORMS env var in this image —
# re-apply it through jax.config so `JAX_PLATFORMS=cpu python ...` really
# runs chipless (otherwise this script contends with whatever owns the TPU).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 128
GRID = int(sys.argv[2]) if len(sys.argv) > 2 else 64
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 8
BATCH = int(sys.argv[4]) if len(sys.argv) > 4 else 2

from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.render.material import (
    MLPTexture3DConfig,
    default_kd_ks_min_max,
    init_mlp_texture,
)
from gshell_tpu.render.render import RenderFlags, render_mesh
from gshell_tpu.render.light import update_pdf
from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig
from gshell_tpu.ops import math as gmath

gcfg = GeometryConfig(grid_res=GRID, use_sdf_mlp=True, use_eikonal=True,
                      n_eikonal_samples=16384, total_iters=5000,
                      view_batch_mode="map")
geo = GShellGeometry(gcfg)
mat_cfg = MLPTexture3DConfig(channels=6, hash=HashGridConfig(),
                             min_max=default_kd_ks_min_max())
import os

MC_BLOCK = int(os.environ.get("GSHELL_MC_BLOCK", "8"))
flags = RenderFlags(resolution=(RES, RES), n_samples=SPP, bsdf="pbr",
                    use_denoiser=os.environ.get("PROF_DENOISER", "1") == "1",
                    tiled_raster=True, max_per_tile=1024,
                    shade_budget=0.5, mc_block=MC_BLOCK)
tcfg = TrainConfig(batch=BATCH, use_shadows=True)
rec = Reconstructor(geo, mat_cfg, flags, tcfg)
state = rec.init_state(jax.random.PRNGKey(0), pretrain_steps=1)

proj = gmath.perspective(np.deg2rad(45.0), 1.0, 0.1, 1000.0)
view = gmath.lookat(jnp.array([0.0, 0.0, 2.5]), jnp.zeros(3),
                    jnp.array([0.0, 1.0, 0.0]))
mvp = (proj @ view)[None].repeat(BATCH, 0)
campos = jnp.array([[0.0, 0.0, 2.5]]).repeat(BATCH, 0)
img = jnp.ones((BATCH, RES, RES, 4)) * 0.5
target = {"mvp": mvp, "campos": campos, "img": img,
          "background": jnp.zeros((BATCH, RES, RES, 3))}
key = jax.random.PRNGKey(1)


def ctime(name, fn, *args):
    t0 = time.time()
    c = jax.jit(fn).lower(*args).compile()
    print(f"{name:46s} {time.time()-t0:8.1f} s", flush=True)
    return c


# 1. extractor alone (fwd)
pg = state.params_geo
ctime("extract fwd", lambda p: geo.extract(p) if hasattr(geo, "extract")
      else geo.get_mesh(p), pg)

# 1b. extraction fwd+bwd (the cut machinery's VJP graph)
ctime("extract fwd+bwd", jax.grad(
    lambda p: sum(
        x.sum() for x in jax.tree_util.tree_leaves(geo.get_mesh(p))
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    )), pg)

# 2. one-view render fwd (no shadows) — mesh rides as an ARGUMENT (a
# closed-over mesh becomes an HLO constant and XLA constant-folds whole
# raster pipelines over it, poisoning the compile timing)
mesh = jax.jit(geo.get_mesh)(pg)
light = update_pdf(state.light_base)


def render_one(mp, lb, msh):
    l = update_pdf(lb)
    return render_mesh(key, msh.verts, msh.faces, msh.v_nrm, msh.msdf,
                       mp, mat_cfg, mvp[0], campos[0], l, flags)["shaded"]


ctime("render 1-view fwd", render_one, state.params_mat, state.light_base,
      mesh)

# 3. one-view render fwd+bwd
def render_loss(mp, lb, msh):
    return render_one(mp, lb, msh).sum()


ctime("render 1-view fwd+bwd (mat+light)",
      jax.grad(render_loss, (0, 1)),
      state.params_mat, state.light_base, mesh)

# 4. full tick loss fwd+bwd (all params) — the train step minus optimizers
def tick_loss(p_geo, p_mat, lb):
    l = update_pdf(lb)
    img_l, d_l, r_l, _ = geo.tick(
        key, p_geo, p_mat, mat_cfg, l, target, jnp.zeros((), jnp.int32),
        flags, rec.image_loss_fn, visibility_fn=None, shadow_scale=1.0,
        denoiser_sigma=2.0)
    return img_l + d_l + r_l


ctime("tick fwd+bwd (no shadows)", jax.grad(tick_loss, (0, 1, 2)),
      state.params_geo, state.params_mat, state.light_base)

# 5. full train step
ctime("train_step FULL",
      lambda s, k, t: type(rec).train_step.__wrapped__(rec, s, k, t),
      state, key, target)
