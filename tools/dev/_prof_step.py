"""A/B the full train step: raster backend xla vs pallas at a given config."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.render.material import MLPTexture3DConfig, default_kd_ks_min_max
from gshell_tpu.render.render import RenderFlags
from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig
from gshell_tpu.ops import math as gmath

res, grid, spp, batch = (int(v) for v in (sys.argv[1] if len(sys.argv)>1 else "128,32,2,1").split(","))

def make(backend):
    gcfg = GeometryConfig(grid_res=grid, use_sdf_mlp=False, use_eikonal=False, total_iters=5000)
    geo = GShellGeometry(gcfg)
    mat_cfg = MLPTexture3DConfig(channels=6, hash=HashGridConfig(), min_max=default_kd_ks_min_max())
    flags = RenderFlags(resolution=(res, res), n_samples=spp, bsdf="pbr",
                        use_denoiser=True, tiled_raster=True, raster_backend=backend)
    tcfg = TrainConfig(batch=batch, use_shadows=True)
    rec = Reconstructor(geo, mat_cfg, flags, tcfg)
    state = rec.init_state(jax.random.PRNGKey(0), pretrain_steps=0)
    proj = gmath.perspective(np.deg2rad(45.0), 1.0, 0.1, 1000.0)
    view = gmath.lookat(jnp.array([0.0, 0.0, 2.5]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    mvp = (proj @ view)[None].repeat(batch, 0)
    campos = jnp.array([[0.0, 0.0, 2.5]]).repeat(batch, 0)
    ys, xs = jnp.meshgrid(jnp.arange(res), jnp.arange(res), indexing="ij")
    r = jnp.sqrt((xs - res/2)**2 + (ys - res/2)**2)
    mask = (r < 0.3*res).astype(jnp.float32)[None, ..., None].repeat(batch, 0)
    img = jnp.concatenate([jnp.ones((batch, res, res, 3))*0.5*mask, mask], -1)
    target = {"mvp": mvp, "campos": campos, "img": img,
              "background": jnp.zeros((batch, res, res, 3))}
    return rec, state, target

for backend in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["xla", "pallas"]):
    rec, state, target = make(backend)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    state, m = rec.train_step(state, key, target)
    float(m["total"])
    print(f"{backend}: compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); n = 10
    for i in range(n):
        key, k = jax.random.split(key)
        state, m = rec.train_step(state, k, target)
    float(m["total"])
    print(f"{backend}: {(time.time()-t0)/n*1000:.1f} ms/step", flush=True)
