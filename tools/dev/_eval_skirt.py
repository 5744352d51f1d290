"""Chamfer + open-surface check of the skirt quality run."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

# 20k-sample chamfer needs no accelerator; stay off the (possibly claimed)
# TPU tunnel — the env var alone does not force CPU here, jax.config does.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np

mesh_path, gt_path = sys.argv[1], sys.argv[2]

def load_obj(p):
    vs, fs = [], []
    for line in open(p):
        t = line.split()
        if not t: continue
        if t[0] == "v": vs.append([float(x) for x in t[1:4]])
        elif t[0] == "f": fs.append([int(x.split("/")[0]) - 1 for x in t[1:4]])
    return np.asarray(vs, np.float32), np.asarray(fs, np.int32)

v1, f1 = load_obj(mesh_path)
v2, f2 = load_obj(gt_path)
print(f"recon: {len(v1)} verts {len(f1)} faces; gt: {len(v2)} verts {len(f2)} faces")

# The training GT is unit_size-normalized (DatasetMesh convention) — the
# reconstruction lives in THAT frame, so normalize the GT identically before
# comparing (a raw-scale GT silently inflates chamfer by the scale gap²).
c = (v2.min(0) + v2.max(0)) / 2.0
v2 = (v2 - c) / (v2.max(0) - v2.min(0)).max()
print(f"extents: recon {np.abs(v1).max():.3f}  gt(unit) {np.abs(v2).max():.3f}")

from gshell_tpu.train.validate import chamfer_distance
cd = chamfer_distance(jax.random.PRNGKey(0), jnp.asarray(v1), jnp.asarray(f1),
                      jnp.asarray(v2), jnp.asarray(f2), n_samples=20000)
print(f"chamfer (squared, 20k samples): {float(cd):.6f}")

# open-surface check: boundary edges (edges used by exactly one face)
from collections import Counter
cnt = Counter()
for a, b, c in f1:
    for u, v in ((a,b),(b,c),(c,a)):
        cnt[(min(u,v),max(u,v))] += 1
n_boundary = sum(1 for k, n in cnt.items() if n == 1)
print(f"boundary edges (recon): {n_boundary} (open surface iff > 0)")
cnt2 = Counter()
for a, b, c in f2:
    for u, v in ((a,b),(b,c),(c,a)):
        cnt2[(min(u,v),max(u,v))] += 1
print(f"boundary edges (gt): {sum(1 for k,n in cnt2.items() if n==1)}")
