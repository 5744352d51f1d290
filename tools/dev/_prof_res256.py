import time, sys
import jax, jax.numpy as jnp, numpy as np
from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 256
t0 = time.time()
geo = GShellGeometry(GeometryConfig(grid_res=GRID, use_sdf_mlp=False, use_eikonal=False))
print(f"build grid {GRID}: {time.time()-t0:.1f}s  n_verts={geo.grid.n_verts}", flush=True)
ex = geo.extractor
print(f"MT={ex.max_tets} V={ex.max_verts} MC={ex.max_cubes}", flush=True)
pos = jnp.asarray(geo.grid.verts)
sdf = 0.3 - jnp.linalg.norm(pos, axis=-1)
msdf = jnp.sin(8 * jnp.asarray(geo.grid.verts[:, 1]))

full = jax.jit(lambda p, s, m: ex(p, s, m, compute_tangents=False))
t0 = time.time()
mesh = full(pos, sdf, msdf)
nv = int(mesh.n_valid_tets)
print(f"compile+run: {time.time()-t0:.1f}s n_valid_tets={nv} n_cross={int(mesh.n_crossing_edges)} cubes={int(mesh.n_active_cubes)}", flush=True)
t0 = time.time()
outs = [full(pos, sdf, msdf) for _ in range(5)]
np.asarray(outs[-1].n_valid_tets)
print(f"extract res{GRID}: {(time.time()-t0)/5*1000:.1f} ms", flush=True)
