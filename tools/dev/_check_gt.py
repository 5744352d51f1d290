"""Inspect DatasetMesh GT images + the model's initial render for the sphere."""
import jax, jax.numpy as jnp, numpy as np
from gshell_tpu.data.datasets import DatasetMesh
from gshell_tpu.render.light import create_trainable_env_rnd, update_pdf
from gshell_tpu.render.material import MLPTexture3DConfig, default_kd_ks_min_max, init_mlp_texture
from gshell_tpu.render.mesh import load_obj, unit_size
from gshell_tpu.render.render import RenderFlags
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.utils.image import save_image

mat_cfg = MLPTexture3DConfig(channels=6, hash=HashGridConfig(), min_max=default_kd_ks_min_max())
rflags = RenderFlags(resolution=(128, 128), n_samples=2, bsdf="pbr", use_denoiser=True)
gt_mesh = unit_size(load_obj("/tmp/sphere.obj"))
gt_light = create_trainable_env_rnd(jax.random.PRNGKey(42), 256)
gt_mat = init_mlp_texture(jax.random.PRNGKey(43), mat_cfg)
ds = DatasetMesh(gt_mesh, gt_light, gt_mat, mat_cfg, rflags, n_views=4)
for i in range(2):
    img = ds.imgs[i]
    print(f"view {i}: rgb range [{img[...,:3].min():.3f},{img[...,:3].max():.3f}] "
          f"mean {img[...,:3].mean():.3f} alpha cover {img[...,3].mean():.3f}")
    save_image(f"/tmp/gt_{i}.png", np.clip(img[..., :3], 0, 1))
    save_image(f"/tmp/gt_{i}_a.png", img[..., 3:].repeat(3, -1))

# initial model render from same view
from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig
gcfg = GeometryConfig(grid_res=32, use_sdf_mlp=False, use_eikonal=False, total_iters=800)
geo = GShellGeometry(gcfg)
rec = Reconstructor(geo, mat_cfg, rflags, TrainConfig(batch=1, use_shadows=True))
state = rec.init_state(jax.random.PRNGKey(0), pretrain_steps=0)
target = {"mvp": ds.mvp[:1], "campos": ds.campos[:1], "img": ds.imgs[:1],
          "background": np.zeros((1, 128, 128, 3), np.float32)}
target = {k: jnp.asarray(v) for k, v in target.items()}
state2, m = rec.train_step(state, jax.random.PRNGKey(1), target)
print("metrics:", {k: float(v) for k, v in m.items() if np.ndim(v) == 0})
