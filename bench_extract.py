"""Microbenchmark: G-Shell tet extraction throughput (BASELINE.json metric
"extraction ms/grid").  Runs the full fixed-capacity extractor (template +
mSDF cutting + normals) on the real TPU at the requested lattice resolution.

Also benchmarks FlexiCubes extraction and the op-level pbr_bsdf fwd/bwd
microbench (twin of ``render/renderutils/tests/test_perf.py:19-40``).
"""
import json
import sys
import time

import jax

from gshell_tpu.utils.platform import apply_platform_env

apply_platform_env()  # make JAX_PLATFORMS=cpu actually mean cpu here
import jax.numpy as jnp
import numpy as np


def bench_fn(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000.0


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from gshell_tpu.geometry.gshell_tets import GShellTets
    from gshell_tpu.geometry.tet_grid import build_tet_grid
    from gshell_tpu.geometry.cube_grid import build_cube_grid
    from gshell_tpu.geometry.gshell_flexicubes import GShellFlexiCubes

    grid = build_tet_grid(res)
    ex = GShellTets(grid)
    pos = jnp.asarray(grid.verts)
    sdf = 0.35 - jnp.linalg.norm(pos, axis=-1)
    msdf = pos[:, 2] + 0.05

    fn = jax.jit(lambda p, s, m: ex(p, s, m))
    ms = bench_fn(fn, pos, sdf, msdf)
    print(f"# gshell_tets extraction res{res}: {ms:.2f} ms/grid", file=sys.stderr)

    cgrid = build_cube_grid(min(res, 80))
    fc = GShellFlexiCubes(cgrid)
    cpos = jnp.asarray(cgrid.verts)
    csdf = jnp.linalg.norm(cpos, axis=-1) - 0.35
    cmsdf = cpos[:, 2] + 0.05
    fn2 = jax.jit(lambda p, s, m: fc(p, s, m))
    ms2 = bench_fn(fn2, cpos, csdf, cmsdf)
    print(f"# flexicubes extraction res{cgrid.res}: {ms2:.2f} ms/grid", file=sys.stderr)

    # pbr_bsdf op microbench (ref test_perf.py: [batch, res, res] tensors)
    from gshell_tpu.ops.bsdf import pbr_bsdf

    b, r = 8, 512
    key = jax.random.PRNGKey(0)
    mk = lambda k: jax.random.uniform(jax.random.fold_in(key, k), (b, r, r, 3))
    kd, arm, pos_, nrm, view, lightp = (mk(i) for i in range(6))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    fwd = jax.jit(lambda *a: pbr_bsdf(*a))
    ms3 = bench_fn(fwd, kd, arm, pos_, nrm, view, lightp)
    bwd = jax.jit(jax.grad(lambda *a: pbr_bsdf(*a).sum(), argnums=(0, 1)))
    ms4 = bench_fn(bwd, kd, arm, pos_, nrm, view, lightp)
    print(f"# pbr_bsdf [{b},{r},{r}] fwd {ms3:.2f} ms / bwd {ms4:.2f} ms", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"gshell_tet_extraction_ms(res{res})",
                "value": round(ms, 3),
                "unit": "ms/grid",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
