"""Microbench: stream-compaction primitives at extraction-scale shapes.

jnp.nonzero(size=k) lowers to cumsum + SCATTER of every input row; the
alternative is cumsum + searchsorted (k queries x log2(n) gathers).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    print(f"{name:44s} {(time.time()-t0)/n*1000:9.2f} ms", flush=True)
    return out


def nonzero_ss(mask, size, fill):
    cs = jnp.cumsum(mask.astype(jnp.int32))
    idx = jnp.searchsorted(cs, jnp.arange(1, size + 1, dtype=jnp.int32)).astype(
        jnp.int32
    )
    ok = jnp.arange(size) < cs[-1]
    return jnp.where(ok, idx, fill)


for n, k in [(16_800_000, 393_216), (17_000_000, 1_179_648), (8_300_000, 786_432),
             (6_300_000, 1_572_864), (2_400_000, 1_572_864)]:
    rng = np.random.default_rng(0)
    mask_np = rng.random(n) < (k / 2.5 / n)
    mask = jnp.asarray(mask_np)
    f_nz = jax.jit(lambda m: jnp.nonzero(m, size=k, fill_value=n)[0])
    f_ss = jax.jit(lambda m: nonzero_ss(m, k, n))
    a = timeit(f"nonzero   n={n//1000}k k={k//1000}k", f_nz, mask)
    b = timeit(f"cumsum+ss n={n//1000}k k={k//1000}k", f_ss, mask)
    assert np.array_equal(np.asarray(a), np.asarray(b)), "mismatch!"
    print("  parity ok", flush=True)
