"""Device-trace attribution of the full train step.

Runs the bench-config train step under jax.profiler.trace and aggregates the
TPU device events by HLO category + source line.  One run = the complete
per-op cost picture (no ablation compiles).

Usage: python tools/dev/_trace_step.py [res,grid,spp,batch] [top_n]
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gshell_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

res, grid, spp, batch = (
    int(v) for v in (sys.argv[1] if len(sys.argv) > 1 else "512,64,8,1").split(",")
)
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.render.material import MLPTexture3DConfig, default_kd_ks_min_max
from gshell_tpu.render.render import RenderFlags
from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig
from gshell_tpu.ops import math as gmath

gcfg = GeometryConfig(
    grid_res=grid, use_sdf_mlp=True, use_eikonal=True,
    n_eikonal_samples=16384, total_iters=5000, view_batch_mode="map",
)
geo = GShellGeometry(gcfg)
mat_cfg = MLPTexture3DConfig(channels=6, hash=HashGridConfig(), min_max=default_kd_ks_min_max())
flags = RenderFlags(
    resolution=(res, res), n_samples=spp, bsdf="pbr", use_denoiser=True,
    raster_chunk=512, tiled_raster=True, max_per_tile=1024,
    shade_budget=0.5, mc_block=8,
)
rec = Reconstructor(geo, mat_cfg, flags, TrainConfig(batch=batch, use_shadows=True))
state = rec.init_state(jax.random.PRNGKey(0), pretrain_steps=50)
proj = gmath.perspective(np.deg2rad(45.0), 1.0, 0.1, 1000.0)
view = gmath.lookat(jnp.array([0.0, 0.0, 2.5]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
mvp = (proj @ view)[None].repeat(batch, 0)
campos = jnp.array([[0.0, 0.0, 2.5]]).repeat(batch, 0)
ys, xs = jnp.meshgrid(jnp.arange(res), jnp.arange(res), indexing="ij")
r = jnp.sqrt((xs - res / 2) ** 2 + (ys - res / 2) ** 2)
mask = (r < 0.3 * res).astype(jnp.float32)[None, ..., None].repeat(batch, 0)
img = jnp.concatenate([jnp.ones((batch, res, res, 3)) * 0.5 * mask, mask], -1)
target = {"mvp": mvp, "campos": campos, "img": img,
          "background": jnp.zeros((batch, res, res, 3))}

key = jax.random.PRNGKey(1)
t0 = time.time()
state, m = rec.train_step(state, key, target)
float(m["total"])
print(f"# compile {time.time()-t0:.1f}s", flush=True)

tdir = "/tmp/gshell_trace"
os.system(f"rm -rf {tdir}")
t0 = time.time()
with jax.profiler.trace(tdir):
    for _ in range(2):
        key, k = jax.random.split(key)
        state, m = rec.train_step(state, k, target)
    float(m["total"])
print(f"# 2 steps traced in {time.time()-t0:.2f}s", flush=True)

# ---- aggregate ----
(path,) = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
with gzip.open(path) as f:
    d = json.load(f)
ev = d["traceEvents"]
dev_pid = None
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name" and "TPU" in str(e.get("args", {}).get("name", "")):
        dev_pid = e["pid"]

by_key = collections.Counter()
by_cat = collections.Counter()
total = 0.0
for e in ev:
    if e.get("ph") != "X" or e.get("pid") != dev_pid:
        continue
    a = e.get("args", {})
    if "device_duration_ps" not in a:
        continue
    us = int(a["device_duration_ps"]) / 1e6
    cat = a.get("hlo_category", "?")
    if cat in ("copy-start", "copy-done") or e.get("tid") == 2:
        continue  # tid2 = the outer jit span duplicating everything
    total += us
    src = a.get("source", "")
    tf_op = a.get("tf_op", "")
    # strip to something readable
    name = e.get("name", "?")
    base = name.rstrip("0123456789.")
    by_key[(cat, base, src, tf_op[:80])] += us
    by_cat[cat] += us

print(f"\ntotal device us (2 steps): {total:.0f}  -> {total/2/1000:.1f} ms/step")
print("\n== by category ==")
for cat, us in by_cat.most_common(15):
    print(f"{us/2/1000:9.2f} ms  {cat}")
print("\n== top ops ==")
for (cat, base, src, tf_op), us in by_key.most_common(top_n):
    print(f"{us/2/1000:9.2f} ms  {cat:24s} {base:40s} {src:34s} {tf_op}")
