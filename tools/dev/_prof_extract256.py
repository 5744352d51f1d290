"""Per-stage extraction profile at large grid res with budget sweeps."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from gshell_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from gshell_tpu.geometry.tet_grid import build_tet_grid
from gshell_tpu.geometry.gshell_tets import GShellTets

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SAFETY = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])

def timeit(name, fn, *args, n=10):
    out = fn(*args); _sync(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    _sync(outs[-1])
    print(f"{name:36s} {(time.time()-t0)/n*1000:9.1f} ms", flush=True)
    return out

t0 = time.time()
grid = build_tet_grid(GRID, build_topology=False)
from gshell_tpu.geometry.tet_grid import default_capacities
mt, mv = default_capacities(GRID, grid.n_tets, grid.n_edges, safety=SAFETY)
ex = GShellTets(grid, max_tets=mt, max_verts=mv)
print(f"build {time.time()-t0:.1f}s  MT={ex.max_tets} V={ex.max_verts} MC={ex.max_cubes} MVL={ex.max_lat_verts}", flush=True)
pos = jnp.asarray(grid.verts)
sdf = 0.3 - jnp.linalg.norm(pos, axis=-1)
msdf = jnp.sin(8 * jnp.asarray(grid.verts[:, 1]))
r1 = GRID + 1
occ_vol = (sdf > 0).reshape(r1, r1, r1)
occ_flat = occ_vol.reshape(-1)

ac = jax.jit(lambda v: ex.active_cubes(v))
cube_act, cube_xyz, cube_ok = ac(occ_vol)
timeit("active_cubes", ac, occ_vol)
ct = jax.jit(lambda of, cx, co: ex.compact_tets(of, cx, co))
tet_valid, corner_xyz, corner_vid, n_valid = ct(occ_flat, cube_xyz, cube_ok)
print(f"  n_valid_tets={int(n_valid)} / MT={ex.max_tets}", flush=True)
timeit("compact_tets", ct, occ_flat, cube_xyz, cube_ok)
ce = jax.jit(lambda of, ca: ex.compact_edges(of, ca)[:5])
timeit("compact_edges", ce, occ_flat, cube_act)
full_min = jax.jit(lambda p, s, m: ex(p, s, m, compute_aug_normals=False, compute_tangents=False))
mesh = full_min(pos, sdf, msdf)
print(f"  n_cross={int(mesh.n_crossing_edges)} / V={ex.max_verts}", flush=True)
timeit("extractor (tick mode)", full_min, pos, sdf, msdf)
# gradient cost (what the train step actually pays)
def loss(p, s, m):
    out = ex(p, s, m, compute_aug_normals=False, compute_tangents=False)
    return (out.verts**2).sum() + (out.msdf**2).sum()
g = jax.jit(jax.grad(loss, argnums=(0,1,2)))
timeit("extractor fwd+bwd", g, pos, sdf, msdf)
