import time, sys
import jax, jax.numpy as jnp, numpy as np
from gshell_tpu.ops.hashgrid import HashGridConfig, init_hashgrid, hashgrid_encode
from gshell_tpu.ops.shade import env_shade, make_shadow_field_parts, make_sdf_visibility_parts
from gshell_tpu.render.light import update_pdf

RES = 512
P = RES * RES

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])

def timeit(name, fn, *args, n=10):
    out = fn(*args); _sync(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    _sync(outs[-1])
    print(f"{name:40s} {(time.time()-t0)/n*1000:9.2f} ms", flush=True)
    return out

cfg = HashGridConfig()
hp = init_hashgrid(jax.random.PRNGKey(0), cfg)
pts = jax.random.uniform(jax.random.PRNGKey(1), (P, 3))
enc = jax.jit(lambda hp, x: hashgrid_encode(hp, x, cfg))
timeit("hashgrid fwd 262k", enc, hp, pts)
encg = jax.jit(jax.grad(lambda t, x: hashgrid_encode(type(hp)(t), x, cfg).sum(), argnums=(0,1)))
timeit("hashgrid fwd+bwd 262k", encg, hp.tables, pts)

light = update_pdf(jax.random.uniform(jax.random.PRNGKey(2), (512, 512, 3)))
nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (P, 1))
pos = jax.random.uniform(jax.random.PRNGKey(3), (P, 3)) - 0.5
kd = jnp.ones((P, 3)) * 0.5
ks = jnp.stack([jnp.zeros(P), jnp.full(P, 0.5), jnp.zeros(P)], -1)
mask = jnp.ones((P, 1))
view = jnp.tile(jnp.array([[0., 0., 2.5]]), (P, 1))
key = jax.random.PRNGKey(4)

sdf_grid = jax.random.normal(jax.random.PRNGKey(5), (65, 65, 65)) - 1.0

for spp in (4,):
    f = jax.jit(lambda k: env_shade(k, mask, pos, pos, nrm, view, kd, ks, light,
                                    n_samples_x=spp, bsdf="pbr", shadow_scale=0.0))
    timeit(f"env_shade fwd spp{spp} (no shadows)", f, key, n=4)

    vf = make_shadow_field_parts(sdf_grid, (-0.7,)*3, (1.4,)*3, ko=16)
    fs = jax.jit(lambda k: env_shade(k, mask, pos, pos, nrm, view, kd, ks, light,
                                     n_samples_x=spp, bsdf="pbr", shadow_scale=1.0,
                                     visibility_fn=vf))
    timeit(f"env_shade fwd spp{spp} (field shadows)", fs, key, n=4)

    g = jax.jit(jax.grad(lambda kd_, k: env_shade(k, mask, pos, pos, nrm, view, kd_, ks, light,
                                                  n_samples_x=spp, bsdf="pbr", shadow_scale=0.0).diffuse.sum()))
    timeit(f"env_shade bwd spp{spp} (no shadows)", g, kd, key, n=4)
    gs = jax.jit(jax.grad(lambda kd_, k: env_shade(k, mask, pos, pos, nrm, view, kd_, ks, light,
                                                   n_samples_x=spp, bsdf="pbr", shadow_scale=1.0,
                                                   visibility_fn=make_shadow_field_parts(sdf_grid, (-0.7,)*3, (1.4,)*3, ko=16)).diffuse.sum()))
    timeit(f"env_shade bwd spp{spp} (field shadows)", gs, kd, key, n=4)

# shadow field precompute alone
pre = jax.jit(lambda g: make_shadow_field_parts(g, (-0.7,)*3, (1.4,)*3, ko=16)[1])
timeit("shadow field precompute ko16", pre, sdf_grid, n=4)
