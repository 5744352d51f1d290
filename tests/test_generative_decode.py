"""Bake → decode roundtrip: the grid-driven marching must reproduce the
training-time mesh (same topology, near-identical vertices) from quantized
data — the property the reference's generative pipeline depends on
(gshell_tets.py:446-629)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gshell_tpu.geometry.generative_decode import GenerativeCodec
from gshell_tpu.geometry.gshell_tets import GShellTets
from gshell_tpu.geometry.tet_grid import build_tet_grid

RES = 12


@pytest.fixture(scope="module")
def setup():
    grid = build_tet_grid(RES)
    ex = GShellTets(grid)
    codec = GenerativeCodec(ex)
    pos = jnp.asarray(grid.verts)
    sdf = 0.35 - jnp.linalg.norm(pos, axis=-1)
    msdf = pos[:, 2] + 0.07
    return codec, ex, pos, sdf, msdf


@pytest.mark.slow
def test_roundtrip(setup):
    codec, ex, pos, sdf, msdf = setup
    direct = ex(pos, sdf, msdf, watertight_template=True)
    baked = codec.bake(pos, sdf, msdf, jnp.zeros_like(pos))
    decoded = codec.decode(pos, baked)

    # identical face topology (same slot layout)
    np.testing.assert_array_equal(
        np.asarray(direct.face_valid), np.asarray(decoded.face_valid)
    )
    fv = np.asarray(direct.face_valid)
    np.testing.assert_array_equal(
        np.asarray(direct.faces)[fv], np.asarray(decoded.faces)[fv]
    )
    # template vertices match (coefficients quantized to f32 grid → tight)
    used = np.unique(np.asarray(direct.faces)[fv].reshape(-1))
    dv = np.asarray(direct.verts)[used]
    cv = np.asarray(decoded.verts)[used]
    np.testing.assert_allclose(dv, cv, atol=2e-2)


def test_masks_cover_sites(setup):
    codec, ex, pos, sdf, msdf = setup
    baked = codec.bake(pos, sdf, msdf, jnp.zeros_like(pos))
    fm = np.asarray(baked.feature_mask)
    # every lattice vertex site inside the (2R)³ crop is marked (the
    # outermost site plane is cropped to the reference's even grid shape)
    vc = np.asarray(codec.vert_coords)
    inb = (vc < fm.shape[0]).all(axis=1)
    assert inb.sum() > 0
    assert (fm[vc[inb, 0], vc[inb, 1], vc[inb, 2], 0] == 1).all()
    assert np.asarray(baked.occ_mask).sum() > 0
