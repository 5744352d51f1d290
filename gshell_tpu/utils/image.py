"""Image IO helpers (twin of the reference util.save_image/load_image)."""
from __future__ import annotations

import numpy as np


def save_image(path: str, img) -> None:
    """Save float image [0,1] (H, W, 3|4) as PNG (sRGB'd by the caller);
    ``.hdr`` paths write linear Radiance RGBE instead."""
    if path.lower().endswith(".hdr"):
        return save_hdr(path, np.asarray(img)[..., :3])
    import imageio.v2 as imageio

    arr = np.asarray(img)
    arr = np.clip(arr, 0.0, 1.0)
    imageio.imwrite(path, (arr * 255).astype(np.uint8))


def save_hdr(path: str, img: np.ndarray) -> None:
    """Minimal Radiance RGBE (.hdr) writer (flat, uncompressed scanlines) —
    twin of the reference ``util.save_image`` .hdr branch (env-probe dumps,
    ``train_gshelltet_deepfashion.py:694`` probe.hdr).  imageio's hdr codec
    round-trips incorrectly in this environment, so RGBE is done by hand."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    maxc = img.max(axis=-1)
    valid = maxc > 1e-32
    exp = np.zeros((h, w), np.int32)
    mant = np.zeros((h, w), np.float64)
    m, e = np.frexp(maxc[valid].astype(np.float64))
    mant[valid] = m
    exp[valid] = e
    scale = np.where(valid, mant * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(valid, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def load_hdr(path: str) -> np.ndarray:
    """Radiance RGBE (.hdr) reader: flat and (new-style) RLE scanlines."""
    with open(path, "rb") as f:
        data = f.read()
    # header ends at the first blank line; next line is the resolution
    pos = data.index(b"\n\n") + 2
    eol = data.index(b"\n", pos)
    res = data[pos:eol].split()
    assert res[0] == b"-Y" and res[2] == b"+X", f"unsupported orientation {res}"
    h, w = int(res[1]), int(res[3])
    buf = data[eol + 1 :]
    rgbe = np.zeros((h, w, 4), np.uint8)
    off = 0
    if not (w >= 8 and w < 32768 and len(buf) >= 4 and buf[0] == 2 and buf[1] == 2):
        rgbe = np.frombuffer(buf[: h * w * 4], np.uint8).reshape(h, w, 4).copy()
    else:
        for y in range(h):
            assert buf[off] == 2 and buf[off + 1] == 2
            off += 4
            for c in range(4):
                x = 0
                while x < w:
                    n = buf[off]
                    off += 1
                    if n > 128:  # run
                        rgbe[y, x : x + n - 128, c] = buf[off]
                        off += 1
                        x += n - 128
                    else:  # literal
                        rgbe[y, x : x + n, c] = np.frombuffer(
                            buf[off : off + n], np.uint8
                        )
                        off += n
                        x += n
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp > 0, np.ldexp(1.0, exp - 136), 0.0)
    return (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None].astype(
        np.float32
    )


def load_image(path: str) -> np.ndarray:
    if path.lower().endswith(".hdr"):
        return load_hdr(path)
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path))
    if img.dtype != np.float32:
        img = img.astype(np.float32) / 255.0
    return img
