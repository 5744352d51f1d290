"""Cumulative stage ablation of GShellTets.__call__ at large res."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from gshell_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from gshell_tpu.geometry.tet_grid import build_tet_grid, default_capacities
from gshell_tpu.geometry.gshell_tets import GShellTets

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SAFETY = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])

def timeit(name, fn, *args, n=8):
    out = fn(*args); _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    print(f"{name:30s} {(time.time()-t0)/n*1000:9.1f} ms", flush=True)

grid = build_tet_grid(GRID, build_topology=False)
mt, mv = default_capacities(GRID, grid.n_tets, grid.n_edges, safety=SAFETY)
ex = GShellTets(grid, max_tets=mt, max_verts=mv)
pos = jnp.asarray(grid.verts)
sdf = 0.3 - jnp.linalg.norm(pos, axis=-1)
msdf = jnp.sin(8 * jnp.asarray(grid.verts[:, 1]))
r1 = GRID + 1
V, MT = ex.max_verts, ex.max_tets
print(f"MT={MT} V={V} MC={ex.max_cubes} MVL={ex.max_lat_verts}", flush=True)

def stages(p, s, m, upto):
    pos_p = jnp.concatenate([p, jnp.zeros((1, 3))])
    sdf_p = jnp.concatenate([s, jnp.ones((1,))])
    msdf_p = jnp.concatenate([m, -jnp.ones((1,))])
    occ_vol = (s > 0).reshape(r1, r1, r1)
    occ_flat = occ_vol.reshape(-1)
    cube_act, cube_xyz, cube_ok = ex.active_cubes(occ_vol)
    tet_valid, corner_xyz, corner_vid, n_valid = ex.compact_tets(occ_flat, cube_xyz, cube_ok)
    slot_valid, ev0, ev1, _, _, vsoe = ex.compact_edges(occ_flat, cube_act)
    if upto == 0:
        return tet_valid, slot_valid
    pa, pb = pos_p[ev0], pos_p[ev1]
    sa, sb = sdf_p[ev0], sdf_p[ev1]
    d = sa - sb
    d = jnp.where(jnp.abs(d) > 1e-8, d, 1.0)
    wa, wb = -sb / d, sa / d
    verts = jnp.where(slot_valid[:, None], pa * wa[:, None] + pb * wb[:, None], 0.0)
    mv_ = jnp.where(slot_valid, msdf_p[ev0] * wa + msdf_p[ev1] * wb, 0.0)
    if upto == 1:
        return verts, mv_
    g_occ4 = occ_flat[corner_vid].astype(jnp.int32)
    tetindex = jnp.where(tet_valid, (g_occ4 * jnp.asarray([1, 2, 4, 8])).sum(-1), 15)
    if upto == 2:
        return tetindex, verts
    te_lo, te_cls = ex.tet_edge_lo_cls(corner_xyz)
    idx6 = vsoe(te_lo, te_cls, tet_valid[:, None])
    if upto == 3:
        return idx6, verts
    trow = jnp.clip(ex.triangle_table[tetindex], 0, 5)
    f01 = jnp.take_along_axis(idx6, trow, axis=1)
    num_tri = ex.num_tri_table[tetindex]
    face0 = jnp.where((num_tri >= 1)[:, None], f01[:, :3], V)
    face1 = jnp.where((num_tri == 2)[:, None], f01[:, 3:6], V)
    faces_wt = jnp.stack([face0, face1], 1).reshape(-1, 3)
    if upto == 4:
        return faces_wt, verts
    me = jnp.clip(ex.mesh_edge_table[tetindex], 0, 5)
    corners = jnp.take_along_axis(idx6, me[:, :4], axis=1)
    verts_buf = jnp.concatenate([verts, jnp.zeros((1, 3))])
    msdf_buf = jnp.concatenate([mv_, jnp.zeros((1,))])
    attr = jnp.concatenate([verts_buf, msdf_buf[:, None], msdf_buf[:, None]], 1)
    cattr = attr[corners]
    if upto == 5:
        return cattr, verts
    return cattr, verts

for k in range(6):
    fn = jax.jit(lambda p, s, m, k=k: stages(p, s, m, k))
    timeit(f"upto={k}", fn, pos, sdf, msdf)

full = jax.jit(lambda p, s, m: ex(p, s, m, compute_aug_normals=False, compute_tangents=False))
timeit("full __call__", full, pos, sdf, msdf)
