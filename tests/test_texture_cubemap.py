import jax
import jax.numpy as jnp
import numpy as np

from gshell_tpu.ops.cubemap import cube_dirs, diffuse_cubemap, specular_cubemap, texel_solid_angles
from gshell_tpu.ops.rasterize import rasterize_peel
from gshell_tpu.render import texture as tex


def test_solid_angles_sum_to_sphere():
    sa = np.asarray(texel_solid_angles(16))
    np.testing.assert_allclose(sa.sum(), 4 * np.pi, rtol=1e-3)


def test_diffuse_prefilter_constant():
    c = jnp.full((6, 8, 8, 3), 0.7)
    out = np.asarray(diffuse_cubemap(c))
    np.testing.assert_allclose(out, 0.7, rtol=1e-4)


def test_specular_prefilter_constant():
    c = jnp.full((6, 8, 8, 3), 1.3)
    out = np.asarray(specular_cubemap(c, roughness=0.3))
    rgb = out[..., :3] / np.maximum(out[..., 3:], 1e-8)
    np.testing.assert_allclose(rgb, 1.3, rtol=1e-3)


def test_texture_mips_and_sampling():
    base = jnp.arange(16 * 16 * 3, dtype=jnp.float32).reshape(16, 16, 3) / 100.0
    t = tex.build_mips(base)
    assert len(t.mips) == 5  # 16, 8, 4, 2, 1
    np.testing.assert_allclose(float(t.mips[-1].mean()), float(base.mean()), rtol=1e-5)
    uv = jnp.array([[0.5, 0.5], [0.0, 0.0]])
    out = tex.sample(t, uv)
    assert out.shape == (2, 3)
    # coarse LOD → mip values
    deriv = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 1.0]]), (2, 1))  # footprint = whole tex
    out2 = tex.sample(t, uv, deriv)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(t.mips[-1][0, 0]), rtol=1e-3)


def test_depth_peeling_two_layers():
    # two stacked quads; layer 2 must see the back quad in the overlap
    v = jnp.array(
        [
            [-0.5, -0.5, -0.2, 1.0], [0.5, -0.5, -0.2, 1.0], [0.5, 0.5, -0.2, 1.0], [-0.5, 0.5, -0.2, 1.0],
            [-0.3, -0.3, 0.4, 1.0], [0.3, -0.3, 0.4, 1.0], [0.3, 0.3, 0.4, 1.0], [-0.3, 0.3, 0.4, 1.0],
        ]
    )
    f = jnp.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], jnp.int32)
    r1, r2 = rasterize_peel(v, f, (32, 32), n_layers=2)
    ids1 = np.asarray(r1.tri_id)
    ids2 = np.asarray(r2.tri_id)
    c = 16
    assert ids1[c, c] in (1, 2)  # front quad wins layer 1
    assert ids2[c, c] in (3, 4)  # back quad appears in layer 2
    assert ids2[2, 2] == 0  # no second layer outside the overlap
