"""Round-5 compile-time ladder (VERDICT #4: cold compile <120 s).

Finer-grained than _prof_compile.py: separates raster/shade/denoiser inside
the render graph, differentiates the render wrt MESH too (the tick's real
backward surface — the old 'render fwd+bwd (mat+light)' number hid the
geometry-side VJP), and times the optimizer/sanitize tail in isolation.

Runs chipless: JAX_PLATFORMS=cpu is honored (re-applied via jax.config).
Usage: python tools/dev/_r5_compile_ladder.py [res] [grid] [spp] [batch] [sel...]
  sel: optional variant-name substrings to run (default: all)
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
SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 8
BATCH = int(sys.argv[4]) if len(sys.argv) > 4 else 2
SEL = sys.argv[5:]

from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.render.material import (
    MLPTexture3DConfig,
    default_kd_ks_min_max,
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
MC_BLOCK = int(os.environ.get("GSHELL_MC_BLOCK", "8"))
flags = RenderFlags(resolution=(RES, RES), n_samples=SPP, bsdf="pbr",
                    use_denoiser=True, tiled_raster=True, max_per_tile=1024,
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


def want(name):
    return not SEL or any(s in name for s in SEL)


def ctime(name, fn, *args):
    if not want(name):
        return
    t0 = time.time()
    jax.jit(fn).lower(*args).compile()
    print(f"{name:52s} {time.time()-t0:8.1f} s", flush=True)


pg = state.params_geo
mesh = jax.jit(geo.get_mesh)(pg)
light = update_pdf(state.light_base)


def render_flags(fl, mp, lb, msh, vis=None):
    l = update_pdf(lb)
    return render_mesh(key, msh.verts, msh.faces, msh.v_nrm, msh.msdf,
                       mp, mat_cfg, mvp[0], campos[0], l, fl,
                       visibility_fn=vis)["shaded"]


# --- render fwd variants: isolate raster / shade / denoiser ---
fl_kd = flags._replace(bsdf="kd", use_denoiser=False)
fl_nodn = flags._replace(use_denoiser=False)
ctime("render fwd bsdf=kd (raster+interp+tex only)",
      lambda mp, lb, m: render_flags(fl_kd, mp, lb, m),
      state.params_mat, state.light_base, mesh)
ctime("render fwd pbr no-denoiser",
      lambda mp, lb, m: render_flags(fl_nodn, mp, lb, m),
      state.params_mat, state.light_base, mesh)
ctime("render fwd pbr full",
      lambda mp, lb, m: render_flags(flags, mp, lb, m),
      state.params_mat, state.light_base, mesh)

# --- render fwd+bwd: mat+light only (old number) vs + mesh (tick's surface)
ctime("render fwd+bwd wrt mat+light",
      jax.grad(lambda mp, lb, m: render_flags(flags, mp, lb, m).sum(),
               (0, 1)),
      state.params_mat, state.light_base, mesh)


def render_wrt_mesh(mp, lb, verts, nrm, msdf):
    l = update_pdf(lb)
    return render_mesh(key, verts, mesh.faces, nrm, msdf, mp, mat_cfg,
                       mvp[0], campos[0], l, flags)["shaded"].sum()


ctime("render fwd+bwd wrt mat+light+mesh",
      jax.grad(render_wrt_mesh, (0, 1, 2, 3, 4)),
      state.params_mat, state.light_base, mesh.verts, mesh.v_nrm, mesh.msdf)

ctime("render fwd+bwd wrt mesh, bsdf=kd",
      jax.grad(lambda mp, lb, v, n, ms: render_mesh(
          key, v, mesh.faces, n, ms, mp, mat_cfg, mvp[0], campos[0],
          update_pdf(lb), fl_kd)["shaded"].sum(), (2, 3, 4)),
      state.params_mat, state.light_base, mesh.verts, mesh.v_nrm, mesh.msdf)


# --- tick variants ---
def tick_loss(p_geo, p_mat, lb, use_vis=False, fl=flags):
    l = update_pdf(lb)
    if use_vis:
        from gshell_tpu.ops.shade import make_shadow_field_parts
        sdf_grid = geo.sdf_lattice(p_geo)
        vis = make_shadow_field_parts(sdf_grid, rec.aabb_min, rec.aabb_size,
                                      ko=tcfg.shadow_ko)
    else:
        vis = None
    img_l, d_l, r_l, _ = geo.tick(
        key, p_geo, p_mat, mat_cfg, l, target, jnp.zeros((), jnp.int32),
        fl, rec.image_loss_fn, visibility_fn=vis, shadow_scale=1.0,
        denoiser_sigma=2.0)
    return img_l + d_l + r_l


ctime("tick fwd+bwd (no shadows)",
      jax.grad(lambda a, b, c: tick_loss(a, b, c), (0, 1, 2)),
      state.params_geo, state.params_mat, state.light_base)
ctime("tick fwd+bwd (WITH shadow field)",
      jax.grad(lambda a, b, c: tick_loss(a, b, c, use_vis=True), (0, 1, 2)),
      state.params_geo, state.params_mat, state.light_base)


def tick_no_eik(p_geo, p_mat, lb):
    import dataclasses
    geo2 = GShellGeometry(dataclasses.replace(gcfg, use_eikonal=False))
    l = update_pdf(lb)
    img_l, d_l, r_l, _ = geo2.tick(
        key, p_geo, p_mat, mat_cfg, l, target, jnp.zeros((), jnp.int32),
        flags, rec.image_loss_fn, visibility_fn=None, shadow_scale=1.0,
        denoiser_sigma=2.0)
    return img_l + d_l + r_l


ctime("tick fwd+bwd (no shadows, no eikonal)",
      jax.grad(tick_no_eik, (0, 1, 2)),
      state.params_geo, state.params_mat, state.light_base)

# batch=1 vs batch=2: is the lax.map body compiled once?
target1 = {k: v[:1] for k, v in target.items()}
ctime("tick fwd+bwd (no shadows, batch=1)",
      jax.grad(lambda a, b, c: (lambda l: geo.tick(
          key, a, b, mat_cfg, l, target1, jnp.zeros((), jnp.int32), flags,
          rec.image_loss_fn, visibility_fn=None, shadow_scale=1.0,
          denoiser_sigma=2.0))(update_pdf(c))[0], (0, 1, 2)),
      state.params_geo, state.params_mat, state.light_base)


# --- optimizer tail in isolation: reuse precomputed grads-shaped zeros ---
def opt_tail(s):
    g_geo = jax.tree_util.tree_map(jnp.zeros_like, s.params_geo)
    g_mat = jax.tree_util.tree_map(jnp.zeros_like, s.params_mat)
    g_lgt = jnp.zeros_like(s.light_base)
    import optax
    upd, og = rec.tx_geo.update(g_geo, s.opt_geo, s.params_geo)
    pg2 = optax.apply_updates(s.params_geo, upd)
    upd, om = rec.tx_mat.update(g_mat, s.opt_mat, s.params_mat)
    pm2 = optax.apply_updates(s.params_mat, upd)
    upd, ol = rec.tx_lgt.update(g_lgt, s.opt_lgt, s.light_base)
    lb2 = optax.apply_updates(s.light_base, upd)
    pg2 = geo.clamp_params(pg2)
    return pg2, pm2, jnp.clip(lb2, min=1e-4), og, om, ol


ctime("optimizer tail (3 chains + clamps)", opt_tail, state)

# --- the full step ---
ctime("train_step FULL",
      lambda s, k, t: type(rec).train_step.__wrapped__(rec, s, k, t),
      state, key, target)
