import time, sys
import jax, jax.numpy as jnp, numpy as np
from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 64

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])

def timeit(name, fn, *args, n=8):
    out = fn(*args); _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args); _sync(out)
    print(f"{name:34s} {(time.time()-t0)/n*1000:9.2f} ms", flush=True)
    return out

gcfg = GeometryConfig(grid_res=GRID, use_sdf_mlp=False, use_eikonal=False)
geo = GShellGeometry(gcfg)
ex = geo.extractor
params = geo.init_params(jax.random.PRNGKey(0))
print(f"MT={ex.max_tets} V={ex.max_verts} MC={ex.max_cubes} MVL={ex.max_lat_verts}")

pos = jnp.asarray(geo.grid.verts)
sdf = 0.3 - jnp.linalg.norm(pos, axis=-1)
msdf = jnp.ones((pos.shape[0],)) * 0.5
r1 = GRID + 1

occ_vol = (sdf > 0).reshape(r1, r1, r1)
occ_flat = occ_vol.reshape(-1)

ac = jax.jit(lambda v: ex.active_cubes(v))
cube_act, cube_xyz, cube_ok = timeit("active_cubes", ac, occ_vol)

ct = jax.jit(lambda of, cx, co: ex.compact_tets(of, cx, co))
tv, cxyz, cvid, nv = timeit("compact_tets", ct, occ_flat, cube_xyz, cube_ok)
print("  n_valid", int(nv))

ce = jax.jit(lambda of, ca: ex.compact_edges(of, ca)[:5])
timeit("compact_edges", ce, occ_flat, cube_act)

full = jax.jit(lambda p, s, m: ex(p, s, m))
mesh = timeit("extractor.__call__", full, pos, sdf, msdf)

gm = jax.jit(lambda pr: geo.get_mesh(pr))
timeit("geo.get_mesh (full)", gm, params)
