"""render_mesh buffer-contract test + validate/chamfer metrics."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gshell_tpu.ops import math as gmath
from gshell_tpu.ops.hashgrid import HashGridConfig
from gshell_tpu.render.light import update_pdf
from gshell_tpu.render.material import (
    MLPTexture3DConfig,
    default_kd_ks_min_max,
    init_mlp_texture,
)
from gshell_tpu.render.mesh import Mesh
from gshell_tpu.render.render import RenderFlags, render_mesh, render_uv
from gshell_tpu.train.validate import chamfer_distance, validate_view

RES = 48


def quad_mesh(z=0.0, half=0.4):
    v = jnp.array(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]]
    )
    f = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return Mesh(v_pos=v, t_pos_idx=f).with_normals()


def setup():
    mesh = quad_mesh()
    mat_cfg = MLPTexture3DConfig(
        channels=6,
        internal_dims=16,
        hidden=2,
        hash=HashGridConfig(n_levels=4, log2_table_size=10, base_resolution=4, desired_resolution=16),
        min_max=default_kd_ks_min_max(),
    )
    mat = init_mlp_texture(jax.random.PRNGKey(0), mat_cfg)
    light = update_pdf(jnp.full((16, 32, 3), 1.0))
    proj = gmath.perspective(np.deg2rad(45.0))
    view = gmath.lookat(jnp.array([0.0, 0.0, 2.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    return mesh, mat, mat_cfg, light, proj @ view, jnp.array([0.0, 0.0, 2.0])


EXPECTED_BUFFERS = {
    "shaded", "mask", "kd", "ks", "kd_grad", "ks_grad", "normal_grad",
    "normal", "geometric_normal", "z_grad", "invdepth", "diffuse_light",
    "specular_light", "msdf_image", "visible_vert_mask",
}


def test_buffer_contract():
    mesh, mat, mat_cfg, light, mvp, campos = setup()
    flags = RenderFlags(resolution=(RES, RES), n_samples=2, bsdf="pbr", use_denoiser=False)
    msdf = jnp.ones((mesh.v_pos.shape[0],))
    buf = render_mesh(
        jax.random.PRNGKey(1), mesh.v_pos, mesh.t_pos_idx, mesh.v_nrm, msdf,
        mat, mat_cfg, mvp, campos, light, flags, shadow_scale=0.0,
    )
    assert EXPECTED_BUFFERS <= set(buf.keys()), set(buf.keys())
    assert buf["shaded"].shape == (RES, RES, 4)
    for k in EXPECTED_BUFFERS - {"visible_vert_mask"}:
        assert np.isfinite(np.asarray(buf[k])).all(), k
    # quad covers the center
    assert float(buf["mask"][RES // 2, RES // 2, 0]) == 1.0
    # visible verts: all 4 quad corners project on-screen
    assert int(buf["visible_vert_mask"].sum()) == 4


def test_render_uv_bake():
    mesh, mat, mat_cfg, light, mvp, campos = setup()
    v_tex = jnp.array([[0.1, 0.1], [0.9, 0.1], [0.9, 0.9], [0.1, 0.9]])
    maskb, kd, ks = render_uv(
        v_tex, mesh.t_pos_idx, mesh.v_pos, mesh.t_pos_idx, (32, 32), mat, mat_cfg
    )
    assert maskb.shape == (32, 32, 1)
    assert float(maskb.sum()) > 100  # most of the atlas covered
    assert np.isfinite(np.asarray(kd)).all()


def test_validate_view_psnr():
    img = jnp.ones((8, 8, 4)) * 0.5
    buf = {"shaded": img}
    mse, psnr = validate_view(buf, img)
    assert float(mse) < 1e-10
    assert float(psnr) >= 100.0 - 1e-3


def test_chamfer_identical_meshes():
    mesh = quad_mesh()
    cd = chamfer_distance(
        jax.random.PRNGKey(0), mesh.v_pos, mesh.t_pos_idx,
        mesh.v_pos, mesh.t_pos_idx, n_samples=4096,
    )
    assert float(cd) < 1e-3
    mesh2 = quad_mesh(z=0.5)
    cd2 = chamfer_distance(
        jax.random.PRNGKey(0), mesh.v_pos, mesh.t_pos_idx,
        mesh2.v_pos, mesh2.t_pos_idx, n_samples=4096,
    )
    assert float(cd2) > 0.4  # ≈ 2 × 0.25 (squared distance both ways)


@pytest.mark.slow
def test_render_spp_supersampling():
    """spp>1 renders at resolution·spp and pools every image buffer back to
    base resolution (ref render.py:333,361)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gshell_tpu.ops import math as gmath
    from gshell_tpu.render.light import update_pdf
    from gshell_tpu.render.material import (
        MLPTexture3DConfig,
        default_kd_ks_min_max,
        init_mlp_texture,
    )
    from gshell_tpu.render.render import RenderFlags, render_mesh

    verts = jnp.array([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.6, 0.0]])
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1))
    cfg = MLPTexture3DConfig(channels=6, min_max=default_kd_ks_min_max())
    mp = init_mlp_texture(jax.random.PRNGKey(0), cfg)
    light = update_pdf(jnp.full((16, 32, 3), 0.5))
    proj = gmath.perspective(np.deg2rad(45.0), 1.0, 0.1, 100.0)
    view = gmath.lookat(jnp.array([0.0, 0.0, 2.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    mvp = proj @ view
    campos = jnp.array([0.0, 0.0, 2.0])

    outs = {}
    for spp in (1, 2):
        fl = RenderFlags(resolution=(32, 32), n_samples=2, spp=spp, use_denoiser=False)
        f = jax.jit(
            lambda k: render_mesh(
                k, verts, faces, nrm, None, mp, cfg, mvp, campos, light, fl,
                background=jnp.zeros((32, 32, 3)),
            )
        )
        outs[spp] = f(jax.random.PRNGKey(1))

    for k, v in outs[2].items():
        assert v.shape == outs[1][k].shape, k
    # spp=2 mask is fractional on silhouette pixels (supersampled coverage)
    m2 = np.asarray(outs[2]["mask"])
    assert ((m2 > 0.1) & (m2 < 0.9)).sum() > 0
    # radiance consistent between spp settings
    d = np.abs(
        np.asarray(outs[1]["shaded"][..., :3]) - np.asarray(outs[2]["shaded"][..., :3])
    ).mean()
    assert d < 0.05


@pytest.mark.slow
def test_render_texture2d_material():
    """Texture2D kd/ks material path: UV-sampled colors land in the buffers
    (ref shade() render.py:79-97 'kd'/'ks' lookups)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gshell_tpu.ops import math as gmath
    from gshell_tpu.render import texture as tex2d
    from gshell_tpu.render.light import update_pdf
    from gshell_tpu.render.render import RenderFlags, render_mesh

    mesh = quad_mesh()
    v_tex = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    # kd: left half red, right half green; ks: constant rough metal-free
    base = np.zeros((16, 16, 3), np.float32)
    base[:, :8] = (1.0, 0.0, 0.0)
    base[:, 8:] = (0.0, 1.0, 0.0)
    kd = tex2d.build_mips(jnp.asarray(base))
    ks = tex2d.build_mips(
        jnp.broadcast_to(jnp.asarray([0.0, 0.6, 0.0], jnp.float32), (4, 4, 3))
    )
    mat = {"kd": kd, "ks": ks}

    light = update_pdf(jnp.full((16, 32, 3), 1.0))
    proj = gmath.perspective(np.deg2rad(45.0))
    view = gmath.lookat(jnp.array([0.0, 0.0, 2.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    flags = RenderFlags(resolution=(RES, RES), n_samples=2, bsdf="pbr", use_denoiser=False)
    buf = render_mesh(
        jax.random.PRNGKey(1), mesh.v_pos, mesh.t_pos_idx, mesh.v_nrm, None,
        mat, None, proj @ view, jnp.array([0.0, 0.0, 2.0]), light, flags,
        shadow_scale=0.0, v_tex=v_tex, t_tex_idx=mesh.t_pos_idx,
    )
    kd_img = np.asarray(buf["kd"])
    m = np.asarray(buf["mask"])[..., 0]
    ys, xs = np.nonzero(m)
    left = kd_img[ys, xs[xs < RES // 2 - 2]] if False else None
    # left-of-center covered pixels are red, right-of-center green
    lm = m[:, : RES // 2 - 2].astype(bool)
    rm = m[:, RES // 2 + 2 :].astype(bool)
    assert lm.sum() > 50 and rm.sum() > 50
    kd_l = kd_img[:, : RES // 2 - 2][lm]
    kd_r = kd_img[:, RES // 2 + 2 :][rm]
    # u=0 is the -x edge; with the reference projection x is not mirrored,
    # but allow either orientation: one side red, the other green
    sides = {tuple(np.round(kd_l[:, :3].mean(0)).astype(int)),
             tuple(np.round(kd_r[:, :3].mean(0)).astype(int))}
    assert sides == {(1, 0, 0), (0, 1, 0)}, sides
    assert np.isfinite(np.asarray(buf["shaded"])).all()
    # gradients flow to the texture
    g = jax.grad(
        lambda kd_t: render_mesh(
            jax.random.PRNGKey(1), mesh.v_pos, mesh.t_pos_idx, mesh.v_nrm, None,
            {"kd": kd_t, "ks": ks}, None, proj @ view, jnp.array([0.0, 0.0, 2.0]),
            light, flags, shadow_scale=0.0, v_tex=v_tex, t_tex_idx=mesh.t_pos_idx,
        )["shaded"].sum()
    )(kd)
    assert float(jnp.abs(g.base).sum()) > 0


def test_shade_budget_compaction_matches_exact():
    """shade_budget compaction: deterministic buffers match the exact path
    when the budget covers the foreground; the overflow counter fires (and
    nothing crashes) when it does not."""
    mesh, mat, mat_cfg, light, mvp, campos = setup()
    msdf = jnp.ones((mesh.v_pos.shape[0],))

    def render(budget, bsdf):
        flags = RenderFlags(
            resolution=(RES, RES), n_samples=2, bsdf=bsdf,
            use_denoiser=False, shade_budget=budget,
        )
        return render_mesh(
            jax.random.PRNGKey(1), mesh.v_pos, mesh.t_pos_idx, mesh.v_nrm,
            msdf, mat, mat_cfg, mvp, campos, light, flags, shadow_scale=0.0,
        )

    exact = render(None, "kd")
    comp = render(0.6, "kd")
    n_fg = int(np.asarray(exact["mask"]).sum())
    assert n_fg < int(RES * RES * 0.6)  # budget really covers the quad
    assert int(comp["n_px_dropped"]) == 0
    for name in ("shaded", "mask", "kd", "ks", "invdepth", "msdf_image"):
        np.testing.assert_allclose(
            np.asarray(comp[name]), np.asarray(exact[name]), atol=1e-5,
            err_msg=name,
        )

    # saturated budget: counter reports the overflow, output stays finite
    big = quad_mesh(half=1.2)  # covers the whole 64² frame
    flags_t = RenderFlags(
        resolution=(64, 64), n_samples=2, bsdf="kd", use_denoiser=False,
        shade_budget=1.0 / 4096.0,  # rounds up to 1024 slots
    )
    tiny = render_mesh(
        jax.random.PRNGKey(1), big.v_pos, big.t_pos_idx, big.v_nrm,
        jnp.ones((4,)), mat, mat_cfg, mvp, campos, light, flags_t,
        shadow_scale=0.0,
    )
    n_fg_big = int(np.asarray(tiny["mask"]).sum())
    assert n_fg_big > 1024
    assert int(tiny["n_px_dropped"]) == n_fg_big - 1024
    assert np.isfinite(np.asarray(tiny["shaded"])).all()


@pytest.mark.slow
def test_shade_budget_grads():
    """Gradients flow through the compaction gather/scatter on the full MC
    path (pbr + shade_budget)."""
    mesh, mat, mat_cfg, light, mvp, campos = setup()
    msdf = jnp.ones((mesh.v_pos.shape[0],))

    def loss(v):
        flags = RenderFlags(
            resolution=(RES, RES), n_samples=2, bsdf="pbr",
            use_denoiser=False, shade_budget=0.6,
        )
        buf = render_mesh(
            jax.random.PRNGKey(1), v, mesh.t_pos_idx, mesh.v_nrm, msdf,
            mat, mat_cfg, mvp, campos, light, flags, shadow_scale=0.0,
        )
        return (buf["shaded"] ** 2).sum()

    g = jax.grad(loss)(mesh.v_pos)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_merge_materials_atlas():
    """merge_materials builds a real uber-texture atlas with UV remap
    (ref render/material.py:118-169): a 2-material OBJ quad renders each
    face with its own material's texture through the Texture2D path."""
    import os
    import tempfile

    from gshell_tpu.render import texture as tex2d
    from gshell_tpu.render.light import update_pdf
    from gshell_tpu.render.material import merge_materials
    from gshell_tpu.render.mesh import load_obj
    from gshell_tpu.render.render import RenderFlags, render_mesh

    obj_src = """
mtllib two.mtl
v -0.4 -0.4 0
v 0.4 -0.4 0
v 0.4 0.4 0
v -0.4 0.4 0
vt 0.25 0.25
vt 0.75 0.25
vt 0.75 0.75
vt 0.25 0.75
usemtl matA
f 1/1 2/2 3/3
usemtl matB
f 1/1 3/3 4/4
"""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "two.obj")
        open(path, "w").write(obj_src)
        mesh, attrs = load_obj(path, with_attrs=True)
    assert attrs["mat_names"] == ["matA", "matB"]
    np.testing.assert_array_equal(attrs["m_face_idx"], [0, 1])

    # matA: textured red (8x8), matB: flat blue (1x1) — exercises resize,
    # PoT padding, and per-face UV remap.
    red = np.zeros((8, 8, 3), np.float32)
    red[..., 0] = 1.0
    mats = [
        {"name": "matA", "bsdf": "pbr", "kd_data": red, "ks": [0.0, 0.6, 0.0]},
        {"name": "matB", "bsdf": "pbr", "kd": [0.0, 0.0, 1.0], "ks": [0.0, 0.6, 0.0]},
    ]
    uv = attrs["t_tex_idx"]
    texcoords = np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75]], np.float32)
    uber, new_uv, new_tf = merge_materials(mats, texcoords, uv, attrs["m_face_idx"])

    # atlas is PoT and both tiles present
    ah, aw, _ = np.asarray(uber["kd"].base).shape
    assert (ah & (ah - 1)) == 0 and (aw & (aw - 1)) == 0
    assert "ks" in uber
    # shared corner tex-vertices are duplicated per material
    assert new_uv.shape[0] == 6  # 4 uniques for matA's tri + matB's tri share 2 → 6
    # each face samples its own tile color
    for fi, expect in [(0, (1.0, 0.0, 0.0)), (1, (0.0, 0.0, 1.0))]:
        center = new_uv[new_tf[fi]].mean(0)
        got = np.asarray(tex2d.sample(uber["kd"], jnp.asarray(center)))
        np.testing.assert_allclose(got, expect, atol=0.05)

    # render end-to-end through the Texture2D path: lower-right triangle red,
    # upper-left blue
    light = update_pdf(jnp.full((16, 32, 3), 1.0))
    proj = gmath.perspective(np.deg2rad(45.0))
    view = gmath.lookat(jnp.array([0.0, 0.0, 2.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    flags = RenderFlags(resolution=(RES, RES), n_samples=2, bsdf="kd", use_denoiser=False)
    buf = render_mesh(
        jax.random.PRNGKey(1), mesh.v_pos, mesh.t_pos_idx, mesh.v_nrm, None,
        uber, None, proj @ view, jnp.array([0.0, 0.0, 2.0]), light, flags,
        shadow_scale=0.0, v_tex=jnp.asarray(new_uv), t_tex_idx=jnp.asarray(new_tf),
    )
    kd_img = np.asarray(buf["kd"])[..., :3]
    m = np.asarray(buf["mask"])[..., 0] > 0.5
    reds = (kd_img[..., 0] > 0.7) & (kd_img[..., 2] < 0.3) & m
    blues = (kd_img[..., 2] > 0.7) & (kd_img[..., 0] < 0.3) & m
    assert reds.sum() > 100 and blues.sum() > 100, (reds.sum(), blues.sum())
    assert (reds.sum() + blues.sum()) > 0.9 * m.sum()
