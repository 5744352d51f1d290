"""nonzero_compact vs stable-argsort compaction microbench."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from gshell_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from gshell_tpu.ops.compact import nonzero_compact


def _sync(x):
    np.asarray(jnp.ravel(x)[:1])


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    print(f"{name:44s} {(time.time()-t0)/n*1000:9.2f} ms", flush=True)
    return out


for n, size, frac in [
    (1_179_648, 786_432, 0.43),   # compact_tets shape @ res 256 (cands -> MT)
    (4_128_768, 393_216, 0.08),   # compact_edges cand edges -> V
    (16_974_593, 589_824, 0.033), # lattice verts -> MVL
]:
    key = jax.random.PRNGKey(0)
    mask = jax.random.uniform(key, (n,)) < frac

    f1 = jax.jit(lambda m: nonzero_compact(m, size, n))
    f2 = jax.jit(
        lambda m: jnp.where(
            jnp.arange(size) < m.sum(),
            jnp.argsort(~m, stable=True)[:size].astype(jnp.int32),
            n,
        )
    )
    a, b = f1(mask), f2(mask)
    print(f"n={n} size={size} true={int(mask.sum())} match={bool((a==b).all())}")
    timeit("  nonzero_compact", f1, mask)
    timeit("  argsort", f2, mask)
