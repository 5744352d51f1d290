"""Feature-ablation attribution of the full train step at a given config.

Runs the full reconstruction step, then variants with one feature disabled
each; the ms delta attributes that feature's cost.  Usage:
    python tools/dev/_prof_ablate.py 512,64,8,1 [variant,variant,...]

GSHELL_BENCH_COMPILE_ONLY=1: AOT-compile each variant against abstract
(eval_shape) state and report compile seconds only — no device memory or
programs, so it can run while the chip is busy; the persistent compilation
cache it warms makes the later on-chip pass start instantly.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.render.material import MLPTexture3DConfig, default_kd_ks_min_max
from gshell_tpu.render.render import RenderFlags
from gshell_tpu.train.reconstruct import Reconstructor, TrainConfig
from gshell_tpu.ops import math as gmath
from gshell_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

res, grid, spp, batch = (
    int(v) for v in (sys.argv[1] if len(sys.argv) > 1 else "512,64,8,1").split(",")
)

VARIANTS = {
    "full": {},
    "spp1": {"n_samples": 1},
    "no_eikonal": {"use_eikonal": False},
    "no_mlp": {"use_sdf_mlp": False, "use_eikonal": False},
    "bsdf_kd": {"bsdf": "kd", "use_denoiser": False},
    "no_shadows": {"use_shadows": False},
    "no_denoiser": {"use_denoiser": False},
    "jtap1": {"jitter_tap_frac": 1.0},
    "jtap0": {"jitter_tap_frac": 0.02},
    "eik4k": {"n_eikonal_samples": 4096},
    "mcblock16": {"mc_block": 16},
    "mcblock1": {"mc_block": 1},
    "light_f32": {"light_bf16": False},
    "budget375": {"shade_budget": 0.375},
}

GEO_KEYS = {"use_eikonal", "use_sdf_mlp", "n_eikonal_samples"}
TC_KEYS = {"use_shadows"}


def make(over):
    gkw = dict(
        grid_res=grid, use_sdf_mlp=True, use_eikonal=True,
        n_eikonal_samples=16384, total_iters=5000, view_batch_mode="map",
    )
    fkw = dict(
        resolution=(res, res), n_samples=spp, bsdf="pbr", use_denoiser=True,
        raster_chunk=512, tiled_raster=True, max_per_tile=1024,
        shade_budget=0.5, mc_block=8,
    )
    tkw = dict(batch=batch, use_shadows=True)
    for k, v in over.items():
        (gkw if k in GEO_KEYS else tkw if k in TC_KEYS else fkw)[k] = v
    geo = GShellGeometry(GeometryConfig(**gkw))
    mat_cfg = MLPTexture3DConfig(
        channels=6, hash=HashGridConfig(), min_max=default_kd_ks_min_max()
    )
    rec = Reconstructor(geo, mat_cfg, RenderFlags(**fkw), TrainConfig(**tkw))
    if COMPILE_ONLY:
        state = jax.eval_shape(
            lambda: rec.init_state(jax.random.PRNGKey(0), pretrain_steps=1)
        )
    else:
        state = rec.init_state(jax.random.PRNGKey(0), pretrain_steps=50)
    def make_target():
        proj = gmath.perspective(np.deg2rad(45.0), 1.0, 0.1, 1000.0)
        view = gmath.lookat(jnp.array([0.0, 0.0, 2.5]), jnp.zeros(3),
                            jnp.array([0.0, 1.0, 0.0]))
        mvp = (proj @ view)[None].repeat(batch, 0)
        campos = jnp.array([[0.0, 0.0, 2.5]]).repeat(batch, 0)
        ys, xs = jnp.meshgrid(jnp.arange(res), jnp.arange(res), indexing="ij")
        r = jnp.sqrt((xs - res / 2) ** 2 + (ys - res / 2) ** 2)
        mask = (r < 0.3 * res).astype(jnp.float32)[None, ..., None].repeat(batch, 0)
        img = jnp.concatenate([jnp.ones((batch, res, res, 3)) * 0.5 * mask, mask], -1)
        return {"mvp": mvp, "campos": campos, "img": img,
                "background": jnp.zeros((batch, res, res, 3))}

    target = jax.eval_shape(make_target) if COMPILE_ONLY else make_target()
    return rec, state, target


COMPILE_ONLY = bool(os.environ.get("GSHELL_BENCH_COMPILE_ONLY"))

names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(VARIANTS)
base_ms = None
for name in names:
    over = VARIANTS[name]
    try:
        rec, state, target = make(over)
        if COMPILE_ONLY:
            key = jax.eval_shape(lambda: jax.random.PRNGKey(1))
            t0 = time.time()
            type(rec).train_step.lower(rec, state, key, target).compile()
            print(f"{name:14s} compile={time.time()-t0:6.1f}s (AOT, cache warmed)",
                  flush=True)
            continue
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        state, m = rec.train_step(state, key, target)
        float(m["total"])
        ct = time.time() - t0
        n = 8
        t0 = time.time()
        for _ in range(n):
            key, k = jax.random.split(key)
            state, m = rec.train_step(state, k, target)
        float(m["total"])
        ms = (time.time() - t0) / n * 1000
        if name == "full":
            base_ms = ms
        delta = f" delta={base_ms - ms:+8.1f}" if base_ms is not None and name != "full" else ""
        print(f"{name:14s} {ms:8.1f} ms/step  compile={ct:6.1f}s{delta}", flush=True)
    except Exception as e:  # keep going; later variants still informative
        print(f"{name:14s} FAILED: {type(e).__name__}: {e}", flush=True)
