"""Generic UV unwrap (xatlas replacement): coverage, bounds, no overlap."""
import numpy as np

from gshell_tpu.ops.uv_unwrap import unwrap


def sphere_mesh(nu=12, nv=8):
    vs, fs = [], []
    for i in range(nv + 1):
        th = np.pi * i / nv
        for j in range(nu):
            ph = 2 * np.pi * j / nu
            vs.append((np.sin(th) * np.cos(ph), np.cos(th), np.sin(th) * np.sin(ph)))
    for i in range(nv):
        for j in range(nu):
            a = i * nu + j
            b = i * nu + (j + 1) % nu
            c = (i + 1) * nu + (j + 1) % nu
            d = (i + 1) * nu + j
            fs.append((a, b, c))
            fs.append((a, c, d))
    return np.asarray(vs, np.float32), np.asarray(fs, np.int32)


def _tri_area_2d(uv, idx):
    p = uv[idx]
    return 0.5 * np.abs(
        (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
        - (p[:, 2, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1])
    )


def test_unwrap_sphere():
    verts, faces = sphere_mesh()
    uvs, uv_idx = unwrap(verts, faces)
    assert uv_idx.shape == faces.shape
    assert uvs.min() >= -1e-6 and uvs.max() <= 1.0 + 1e-6
    # every 3D-nondegenerate face has nonzero UV area (pole triangles of
    # the lat-long test sphere are 3D-degenerate and may map to zero)
    areas = _tri_area_2d(uvs, uv_idx)
    a3 = np.linalg.norm(np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                                 verts[faces[:, 2]] - verts[faces[:, 0]]), axis=1)
    assert (areas[a3 > 1e-6] > 1e-10).all()
    # total UV area is a sane fraction of the atlas (packing not pathological)
    assert 0.05 < areas.sum() < 1.0


def test_unwrap_two_components():
    v1, f1 = sphere_mesh(8, 5)
    v2 = v1 + np.array([3.0, 0.0, 0.0], np.float32)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f1 + len(v1)])
    uvs, uv_idx = unwrap(verts, faces)
    a = _tri_area_2d(uvs, uv_idx)
    a3 = np.linalg.norm(np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                                 verts[faces[:, 2]] - verts[faces[:, 0]]), axis=1)
    assert (a[a3 > 1e-6] > 1e-10).all()


def test_unwrap_rasterizes():
    """The produced atlas drives render_uv (the xatlas consumer flow)."""
    import jax
    import jax.numpy as jnp

    from gshell_tpu.ops.hashgrid import HashGridConfig
    from gshell_tpu.render.material import (
        MLPTexture3DConfig, default_kd_ks_min_max, init_mlp_texture,
    )
    from gshell_tpu.render.render import render_uv

    verts, faces = sphere_mesh(8, 5)
    uvs, uv_idx = unwrap(verts, faces)
    cfg = MLPTexture3DConfig(
        channels=6, internal_dims=16, hidden=2,
        hash=HashGridConfig(n_levels=2, log2_table_size=8, base_resolution=4,
                            desired_resolution=8),
        min_max=default_kd_ks_min_max(),
    )
    mat = init_mlp_texture(jax.random.PRNGKey(0), cfg)
    maskb, kd, ks = render_uv(
        jnp.asarray(uvs), jnp.asarray(uv_idx), jnp.asarray(verts),
        jnp.asarray(faces), (64, 64), mat, cfg,
    )
    assert float(maskb.sum()) > 200  # decent chart coverage
    assert np.isfinite(np.asarray(kd)).all()
