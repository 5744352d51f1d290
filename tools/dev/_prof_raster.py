import time, sys
import jax, jax.numpy as jnp, numpy as np
from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.ops import math as gmath
from gshell_tpu.ops.rasterize import rasterize_tiled
from gshell_tpu.ops.mesh_ops import compact_faces

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
GRID = int(sys.argv[2]) if len(sys.argv) > 2 else 64

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])

def timeit(name, fn, *args, n=20):
    out = fn(*args); _sync(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    _sync(outs[-1])
    print(f"{name:34s} {(time.time()-t0)/n*1000:9.2f} ms", flush=True)
    return out

geo = GShellGeometry(GeometryConfig(grid_res=GRID, use_sdf_mlp=False, use_eikonal=False))
params = geo.init_params(jax.random.PRNGKey(0))
mesh = jax.jit(lambda p: geo.get_mesh(p))(params)
proj = gmath.perspective(np.deg2rad(45.0), 1.0, 0.1, 1000.0)
view = gmath.lookat(jnp.array([0.0, 0.0, 2.5]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
mvp = proj @ view
v_clip = gmath.xfm_points(mesh.verts, mvp)
fc, fv, nf = compact_faces(mesh.faces, mesh.face_valid, cap=geo.extractor.max_tets)
print(f"faces cap {fc.shape[0]}, valid {int(fv.sum())}")

xla_r = jax.jit(lambda v, f: rasterize_tiled(v, f, (RES, RES), tile=16, max_per_tile=1024, backend="xla"))
pal_r = jax.jit(lambda v, f: rasterize_tiled(v, f, (RES, RES), tile=16, backend="pallas"))
rx = timeit("tiled raster (xla)", xla_r, v_clip, fc)
rp = timeit("tiled raster (pallas)", pal_r, v_clip, fc)
tx, tp = np.asarray(rx.tri_id), np.asarray(rp.tri_id)
print("match:", (tx == tp).mean(), "hits:", (tx > 0).sum(), (tp > 0).sum())
