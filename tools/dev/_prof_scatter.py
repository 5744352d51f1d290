import time
import jax, jax.numpy as jnp, numpy as np
from gshell_tpu.ops.hashgrid import HashGridConfig, init_hashgrid, hashgrid_encode

P = 512 * 512
cfg = HashGridConfig()
hp = init_hashgrid(jax.random.PRNGKey(0), cfg)
pts = jax.random.uniform(jax.random.PRNGKey(1), (P, 3))

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])

def timeit(name, fn, *args, n=6):
    out = fn(*args); _sync(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    _sync(outs[-1])
    print(f"{name:44s} {(time.time()-t0)/n*1000:9.2f} ms", flush=True)
    return out

# grad wrt tables only vs x only
g_t = jax.jit(jax.grad(lambda t, x: hashgrid_encode(type(hp)(t), x, cfg).sum(), argnums=0))
timeit("grad wrt tables (scatter)", g_t, hp.tables, pts)
g_x = jax.jit(jax.grad(lambda t, x: hashgrid_encode(type(hp)(t), x, cfg).sum(), argnums=1))
timeit("grad wrt x only", g_x, hp.tables, pts)

# raw scatter benchmarks
L, T = cfg.n_levels, cfg.table_size
idx_rand = jax.random.randint(jax.random.PRNGKey(2), (P, 128), 0, L * T)
vals = jnp.ones((P, 128, 2))
sc = jax.jit(lambda i, v: jnp.zeros((L * T, 2)).at[i.reshape(-1)].add(v.reshape(-1, 2)))
timeit("scatter 33.5M rows, random idx", sc, idx_rand, vals)

idx_coarse = jax.random.randint(jax.random.PRNGKey(3), (P, 8), 0, 4913)
vals8 = jnp.ones((P, 8, 2))
sc2 = jax.jit(lambda i, v: jnp.zeros((4913, 2)).at[i.reshape(-1)].add(v.reshape(-1, 2)))
timeit("scatter 2.1M rows -> 4913 targets", sc2, idx_coarse, vals8)

idx_fine = jax.random.randint(jax.random.PRNGKey(4), (P, 8), 0, T)
sc3 = jax.jit(lambda i, v: jnp.zeros((T, 2)).at[i.reshape(-1)].add(v.reshape(-1, 2)))
timeit("scatter 2.1M rows -> 524k targets", sc3, idx_fine, vals8)

# sorted segment-sum alternative
def seg(i, v):
    ii = i.reshape(-1)
    vv = v.reshape(-1, 2)
    order = jnp.argsort(ii)
    return jax.ops.segment_sum(vv[order], ii[order], num_segments=L*T, indices_are_sorted=True)
timeit("sort+segment_sum 33.5M", jax.jit(seg), idx_rand, vals)
