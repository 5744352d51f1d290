"""Radiance HDR round-trip (env probe IO, ref util.save_image .hdr branch)."""
import numpy as np

from gshell_tpu.utils.image import load_hdr, load_image, save_hdr, save_image


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, size=(16, 24, 3)) ** 2 * 37.0).astype(np.float32)
    img[0, 0] = 0.0  # zero pixel
    p = str(tmp_path / "probe.hdr")
    save_hdr(p, img)
    back = load_hdr(p)
    assert back.shape == img.shape
    # RGBE has an 8-bit shared-exponent mantissa: ~0.4% relative error
    rel = np.abs(back - img) / np.maximum(img.max(axis=-1, keepdims=True), 1e-6)
    assert rel.max() < 0.01, rel.max()
    assert back[0, 0].max() == 0.0


def test_save_image_dispatches_hdr(tmp_path):
    img = np.full((8, 8, 3), 3.5, np.float32)  # > 1: clipped by png, kept by hdr
    p = str(tmp_path / "x.hdr")
    save_image(p, img)
    back = load_image(p)
    np.testing.assert_allclose(back, img, rtol=0.01)
