import jax, sys
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "tests")
from test_reconstruct_e2e import make_target, RES, GRID
from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.render.material import MLPTexture3DConfig, default_kd_ks_min_max
from gshell_tpu.render.render import RenderFlags
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig

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
for i in range(30):
    key, k = jax.random.split(key)
    state, m = rec.train_step(state, k, target)
    if i % 5 == 0 or not np.isfinite(float(m["total"])):
        print(f"step {i}: total={float(m['total']):.5f} badgrads={int(m['nonfinite_grads'])}", flush=True)
    if not np.isfinite(float(m["total"])):
        break
print("done", flush=True)
