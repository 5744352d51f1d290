"""Micro compile ladder inside the kd render path (the 24 s CPU-proxy hog).

Times .lower().compile() of individual render sub-stages to find where the
compile time goes: raster stage A / stage B, interpolate, screen derivs,
compaction, hash-grid material, antialias, spp pool.
Usage: JAX_PLATFORMS=cpu python tools/dev/_r5_micro_ladder.py [res] [grid]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 128
GRID = int(sys.argv[2]) if len(sys.argv) > 2 else 64

from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.render.material import (
    MLPTexture3DConfig,
    default_kd_ks_min_max,
    init_mlp_texture,
    sample_mlp_texture,
)
from gshell_tpu.render.render import RenderFlags, render_mesh, _fg_compact_idx
from gshell_tpu.render.light import update_pdf
from gshell_tpu.ops import math as gmath
from gshell_tpu.ops.rasterize import (
    antialias,
    bary_screen_derivs,
    interpolate,
    rasterize_tiled,
)
from gshell_tpu.ops.math import xfm_points

gcfg = GeometryConfig(grid_res=GRID, use_sdf_mlp=True)
geo = GShellGeometry(gcfg)
mat_cfg = MLPTexture3DConfig(channels=6, hash=HashGridConfig(),
                             min_max=default_kd_ks_min_max())
params_geo = geo.init_params(jax.random.PRNGKey(0))
mesh = jax.jit(geo.get_mesh)(params_geo)
mat_params = init_mlp_texture(jax.random.PRNGKey(2), mat_cfg)

proj = gmath.perspective(np.deg2rad(45.0), 1.0, 0.1, 1000.0)
view = gmath.lookat(jnp.array([0.0, 0.0, 2.5]), jnp.zeros(3),
                    jnp.array([0.0, 1.0, 0.0]))
mvp = proj @ view
campos = jnp.array([0.0, 0.0, 2.5])
key = jax.random.PRNGKey(1)
H = W = RES
flags = RenderFlags(resolution=(RES, RES), n_samples=8, bsdf="kd",
                    use_denoiser=False, tiled_raster=True, max_per_tile=1024,
                    shade_budget=0.5)


def ctime(name, fn, *args):
    t0 = time.time()
    jax.jit(fn).lower(*args).compile()
    print(f"{name:46s} {time.time()-t0:8.1f} s", flush=True)


verts, faces, v_nrm, msdf = mesh.verts, mesh.faces, mesh.v_nrm, mesh.msdf

ctime("raster fwd (tiled, xla stage B)",
      lambda v: rasterize_tiled(xfm_points(v, mvp), faces, (H, W),
                                max_per_tile=1024),
      verts)

ctime("raster fwd (tiled, pallas interpret)",
      lambda v: rasterize_tiled(xfm_points(v, mvp), faces, (H, W),
                                max_per_tile=1024, backend="pallas",
                                pallas_interpret=True),
      verts)


def rast_interp(v):
    v_clip = xfm_points(v, mvp)
    rast = rasterize_tiled(v_clip, faces, (H, W), max_per_tile=1024)
    attrs = jnp.concatenate([v, v_nrm, v_clip, msdf[:, None]], -1)
    return interpolate(attrs, rast, faces, v_clip=v_clip)


ctime("raster+interp fwd", rast_interp, verts)
ctime("raster+interp fwd+bwd wrt verts",
      jax.grad(lambda v: rast_interp(v).sum()), verts)


def rast_interp_db(v):
    v_clip = xfm_points(v, mvp)
    rast = rasterize_tiled(v_clip, faces, (H, W), max_per_tile=1024)
    attrs = jnp.concatenate([v, v_nrm, v_clip, msdf[:, None]], -1)
    gi = interpolate(attrs, rast, faces, v_clip=v_clip)
    db = bary_screen_derivs(rast, faces, v_clip)
    return gi.sum() + db.sum()


ctime("raster+interp+derivs fwd+bwd",
      jax.grad(rast_interp_db), verts)


def aa_only(v, img):
    v_clip = xfm_points(v, mvp)
    rast = rasterize_tiled(v_clip, faces, (H, W), max_per_tile=1024)
    return antialias(img, rast, v_clip, faces)


img4 = jnp.ones((H, W, 4)) * 0.5
ctime("raster+AA fwd+bwd wrt verts+img",
      jax.grad(lambda v, i: aa_only(v, i).sum(), (0, 1)), verts, img4)

# hash-grid material sample alone (compacted row count at budget 0.5)
n_rows = H * W // 2
pos = jnp.zeros((n_rows, 3))
ctime("hashgrid sample fwd+bwd (n=budget rows)",
      jax.grad(lambda mp: sample_mlp_texture(mp, mat_cfg, pos,
                                             key=key).sum()),
      mat_params)

# full kd render (= ladder row 1 at one view) for reference
light = update_pdf(jax.random.uniform(jax.random.PRNGKey(3), (512, 512, 3)))
ctime("render_mesh kd fwd (one view)",
      lambda v: render_mesh(key, v, faces, v_nrm, msdf, mat_params, mat_cfg,
                            mvp, campos, light, flags)["shaded"],
      verts)
ctime("render_mesh kd fwd+bwd wrt verts",
      jax.grad(lambda v: render_mesh(key, v, faces, v_nrm, msdf, mat_params,
                                     mat_cfg, mvp, campos, light,
                                     flags)["shaded"].sum()),
      verts)
