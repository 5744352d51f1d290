"""Per-stage timing of the reconstruction step on the real TPU.

Identifies where the milliseconds go: extraction, rasterization, G-buffer
interpolation + AA, MC shading (with/without shadows), losses+backward.
"""
import time

import jax

from gshell_tpu.utils.platform import apply_platform_env

apply_platform_env()  # make JAX_PLATFORMS=cpu actually mean cpu here
import jax.numpy as jnp
import numpy as np

from gshell_tpu.geometry.geometry import GeometryConfig, GShellGeometry
from gshell_tpu.ops import math as gmath
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.ops.rasterize import antialias, interpolate, rasterize
from gshell_tpu.ops.shade import env_shade, make_sdf_visibility
from gshell_tpu.render.light import update_pdf
from gshell_tpu.render.material import (
    MLPTexture3DConfig,
    default_kd_ks_min_max,
    init_mlp_texture,
    sample_mlp_texture,
)
from gshell_tpu.render.render import RenderFlags, render_mesh

import sys
RES = int(sys.argv[1]) if len(sys.argv) > 1 else 128
GRID = int(sys.argv[2]) if len(sys.argv) > 2 else 32
NSAMP = int(sys.argv[3]) if len(sys.argv) > 3 else 2


def _sync(out):
    # On the tunneled axon platform block_until_ready returns before the
    # device program finishes; transferring one element forces completion.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])  # 1-element transfer, not the whole leaf


def timeit(name, fn, *args, n=8):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        _sync(out)
    dt = (time.time() - t0) / n
    print(f"{name:32s} {dt*1000:9.2f} ms", flush=True)
    return out


def main():
    gcfg = GeometryConfig(grid_res=GRID, use_sdf_mlp=False, use_eikonal=False)
    geo = GShellGeometry(gcfg)
    key = jax.random.PRNGKey(0)
    params = geo.init_params(key)
    mat_cfg = MLPTexture3DConfig(channels=6, hash=HashGridConfig(), min_max=default_kd_ks_min_max())
    mat_params = init_mlp_texture(jax.random.PRNGKey(1), mat_cfg)
    light = update_pdf(jax.random.uniform(jax.random.PRNGKey(2), (512, 512, 3)))

    proj = gmath.perspective(np.deg2rad(45.0), 1.0, 0.1, 1000.0)
    view = gmath.lookat(jnp.array([0.0, 0.0, 2.5]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    mvp = proj @ view
    campos = jnp.array([0.0, 0.0, 2.5])

    extract = jax.jit(lambda p: geo.get_mesh(p))
    mesh = timeit("extract", extract, params)
    print(f"  n_valid_tets={int(mesh.n_valid_tets)} faces_cap={mesh.faces.shape[0]} "
          f"valid_faces={int(mesh.face_valid.sum())}")

    v_clip = gmath.xfm_points(mesh.verts, mvp)
    rast_fn = jax.jit(lambda v, f: rasterize(v, f, (RES, RES), chunk=512))
    rast = timeit("rasterize(all slots)", rast_fn, v_clip, mesh.faces)

    # compacted raster
    @jax.jit
    def compact_raster(v, faces, valid):
        cap = 6 * int(geo.extractor.max_tets ** 0.5) ** 2  # placeholder; see below
        (idx,) = jnp.nonzero(valid, size=faces.shape[0] // 4, fill_value=faces.shape[0] - 1)
        fc = faces[idx]
        return rasterize(v, fc, (RES, RES), chunk=512)

    timeit("rasterize(compacted /4)", compact_raster, v_clip, mesh.faces, mesh.face_valid)

    from gshell_tpu.ops.rasterize import rasterize_tiled
    from gshell_tpu.ops.mesh_ops import compact_faces

    @jax.jit
    def tiled_raster(v, faces, valid):
        fc, _, _ = compact_faces(faces, valid, cap=faces.shape[0] // 4)
        return rasterize_tiled(v, fc, (RES, RES), tile=16, max_per_tile=1024)

    timeit("rasterize_tiled(compacted)", tiled_raster, v_clip, mesh.faces, mesh.face_valid)

    interp_fn = jax.jit(lambda a, f, v: interpolate(a, rast, f, v_clip=v))
    timeit("interpolate(pos)", interp_fn, mesh.verts, mesh.faces, v_clip)

    aa_fn = jax.jit(lambda c, v, f: antialias(c, rast, v, f))
    col = jnp.ones((RES, RES, 4))
    timeit("antialias", aa_fn, col, v_clip, mesh.faces)

    mat_fn = jax.jit(lambda mp, pos: sample_mlp_texture(mp, mat_cfg, pos))
    gbpos = interpolate(mesh.verts, rast, mesh.faces, v_clip=v_clip)
    timeit("hashgrid material sample", mat_fn, mat_params, gbpos)

    p = RES * RES
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (p, 1))
    pos = gbpos.reshape(p, 3)
    kd = jnp.ones((p, 3)) * 0.5
    ks = jnp.stack([jnp.zeros(p), jnp.full(p, 0.5), jnp.zeros(p)], -1)
    mask = jnp.ones((p, 1))
    view_b = jnp.tile(campos[None], (p, 1))

    shade_ns = jax.jit(
        lambda k: env_shade(k, mask, pos, pos, nrm, view_b, kd, ks, light,
                            n_samples_x=NSAMP, bsdf="pbr", shadow_scale=0.0)
    )
    timeit("env_shade (no shadows)", shade_ns, key, n=4)

    # occupancy = inside = sdf < 0 (the trained SDF is inside-negative)
    sdf_grid = geo.sdf_lattice(params)
    vis = make_sdf_visibility(-sdf_grid, (-0.7,) * 3, (1.4,) * 3)
    shade_sh = jax.jit(
        lambda k: env_shade(k, mask, pos, pos, nrm, view_b, kd, ks, light,
                            n_samples_x=NSAMP, bsdf="pbr", shadow_scale=1.0,
                            visibility_fn=vis)
    )
    timeit("env_shade (with shadows)", shade_sh, key, n=4)

    vis_only = jax.jit(lambda: vis(pos, nrm))
    timeit("visibility(1 batch rays)", vis_only)

    shade_bwd = jax.jit(jax.grad(lambda kd_s: env_shade(
        key, mask, pos, pos, nrm, view_b, kd_s, ks, light,
        n_samples_x=NSAMP, bsdf="pbr", shadow_scale=0.0).diffuse.sum()))
    timeit("env_shade bwd (no shadows)", shade_bwd, kd, n=4)

    flags = RenderFlags(resolution=(RES, RES), n_samples=NSAMP, bsdf="pbr", use_denoiser=False, raster_chunk=512)
    full = jax.jit(
        lambda k, pg: render_mesh(k, *(lambda m: (m.verts, m.faces, m.v_nrm, m.msdf))(geo.get_mesh(pg)),
                                  mat_params, mat_cfg, mvp, campos, light, flags, shadow_scale=0.0)["shaded"]
    )
    timeit("full fwd render (no shadow)", full, key, params, n=4)

    def loss(pg, mp, lb, k):
        mesh = geo.get_mesh(pg)
        lg = update_pdf(lb)
        buf = render_mesh(k, mesh.verts, mesh.faces, mesh.v_nrm, mesh.msdf,
                          mp, mat_cfg, mvp, campos, lg, flags, shadow_scale=0.0)
        return buf["shaded"].sum()

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    timeit("full fwd+bwd (no shadow)", grad_fn, params, mat_params, light.base, key, n=4)


if __name__ == "__main__":
    main()
