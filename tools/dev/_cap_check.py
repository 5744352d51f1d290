import os
import jax; jax.config.update('jax_platforms','cpu')
import jax.numpy as jnp, numpy as np
from gshell_tpu.geometry.tet_grid import build_tet_grid
from gshell_tpu.geometry.gshell_tets import GShellTets

for res in (32, 64):
    g = build_tet_grid(res, build_topology=False)
    ex = GShellTets(g)
    pos = jnp.asarray(g.verts)
    rng = np.random.default_rng(0)
    for name, sdf in [
        ("sphere", 0.3 - jnp.linalg.norm(pos, axis=-1)),
        ("wavy", 0.3 - jnp.linalg.norm(pos, axis=-1) + 0.05*jnp.sin(20*pos[:,0])*jnp.sin(20*pos[:,1])),
        ("two-blobs", jnp.maximum(0.22 - jnp.linalg.norm(pos-0.2, axis=-1), 0.22 - jnp.linalg.norm(pos+0.2, axis=-1))),
    ]:
        r1 = res + 1
        occ_vol = (sdf > 0).reshape(r1, r1, r1)
        occ_flat = occ_vol.reshape(-1)
        cube_act, cube_xyz, cube_ok = ex.active_cubes(occ_vol)
        n_cubes = int(cube_act.sum())
        tv, _, _, nv = ex.compact_tets(occ_flat, cube_xyz, cube_ok)
        sv, *_ = ex.compact_edges(occ_flat, cube_act)
        # dilated vertex count
        act_pad = jnp.pad(cube_act, ((1,1),(1,1),(1,1)))
        va = jnp.zeros((r1,r1,r1), bool)
        for dx in (0,1):
            for dy in (0,1):
                for dz in (0,1):
                    va = va | act_pad[dx:dx+r1, dy:dy+r1, dz:dz+r1]
        print(f"res{res} {name:10s} cubes={n_cubes:7d} ({n_cubes/res**2:.1f}/res2) "
              f"tets={int(nv):7d} ({int(nv)/res**2:.1f}) verts={int(sv.sum()):7d} ({int(sv.sum())/res**2:.1f}) "
              f"dilated={int(va.sum()):7d} ({int(va.sum())/res**2:.1f}) dil/cube={int(va.sum())/max(n_cubes,1):.2f}")
