import jax, sys
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "tests")
from test_reconstruct_e2e import make_target, RES, GRID
from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.render.material import MLPTexture3DConfig, default_kd_ks_min_max
from gshell_tpu.render.render import RenderFlags, render_mesh
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig
from gshell_tpu.render.light import update_pdf
from gshell_tpu.ops.rasterize import rasterize, interpolate, antialias
from gshell_tpu.ops.math import xfm_points

gcfg = GeometryConfig(grid_res=GRID, scale=1.4, use_sdf_mlp=False, use_eikonal=False,
                      n_eikonal_samples=256, total_iters=100)
geo = GShellGeometry(gcfg)
mat_cfg = MLPTexture3DConfig(channels=6, internal_dims=16, hidden=2,
    hash=HashGridConfig(n_levels=4, log2_table_size=12, base_resolution=4, desired_resolution=32),
    aabb_min=(-1.0,)*3, aabb_max=(1.0,)*3, min_max=default_kd_ks_min_max())
flags = RenderFlags(resolution=(RES, RES), n_samples=2, bsdf="diffuse", use_denoiser=False, raster_chunk=512)
tcfg = TrainConfig(iters=10, batch=1, use_shadows=False)
rec = Reconstructor(geo, mat_cfg, flags, tcfg)
state = rec.init_state(jax.random.PRNGKey(0), pretrain_steps=0)
target = make_target()
key = jax.random.PRNGKey(7)
for i in range(3):
    key, k = jax.random.split(key)
    state, metrics = rec.train_step(state, k, target)
print("pre-NaN state total:", float(metrics["total"]), flush=True)

pg = state.params_geo
mvp = target["mvp"][0]; k2 = jax.random.PRNGKey(99)

def mesh_of(pg):
    return geo.extractor(*geo.fields(pg), watertight_template=True)

def check(name, fn):
    g = jax.jit(jax.grad(fn))(pg)
    bad = [jax.tree_util.keystr(p) for p, l in jax.tree_util.tree_flatten_with_path(g)[0]
           if not np.isfinite(np.asarray(l)).all()]
    print(f"{name}: {'NONFINITE ' + str(bad) if bad else 'ok'}", flush=True)

# 1. extraction-only losses
check("vert-sum", lambda pg: mesh_of(pg).verts.sum())
check("normal-sum", lambda pg: mesh_of(pg).v_nrm.sum())
check("msdf-sum", lambda pg: mesh_of(pg).msdf.sum())

# 2. raster mask only (no AA)
def mask_loss(pg, aa):
    m = mesh_of(pg)
    v_clip = xfm_points(m.verts, mvp)
    rast = rasterize(v_clip, m.faces, (RES, RES), chunk=512)
    alpha = (rast.tri_id > 0).astype(jnp.float32)[..., None]
    if aa:
        alpha = antialias(alpha, rast, v_clip, m.faces)
    return (alpha**2).sum()
check("mask-noAA", lambda pg: mask_loss(pg, False))
check("mask-AA", lambda pg: mask_loss(pg, True))

# 3. interpolate gb_pos
def interp_loss(pg):
    m = mesh_of(pg)
    v_clip = xfm_points(m.verts, mvp)
    rast = rasterize(v_clip, m.faces, (RES, RES), chunk=512)
    gb = interpolate(m.verts, rast, m.faces, v_clip=v_clip)
    return (gb**2).sum()
check("interp-pos", interp_loss)

# 4. msdf image
def msdf_img_loss(pg):
    m = mesh_of(pg)
    v_clip = xfm_points(m.verts, mvp)
    rast = rasterize(v_clip, m.faces, (RES, RES), chunk=512)
    mi = interpolate(m.msdf[:, None], rast, m.faces, v_clip=v_clip)
    return (mi**2).sum()
check("msdf-image", msdf_img_loss)

# 5. full render shaded
def shaded_loss(pg):
    m = mesh_of(pg)
    light = update_pdf(state.light_base)
    buf = render_mesh(k2, m.verts, m.faces, m.v_nrm, m.msdf, state.params_mat, mat_cfg,
                      mvp, target["campos"][0], light, flags, shadow_scale=0.0)
    return (buf["shaded"]**2).sum()
check("full-shaded", shaded_loss)
