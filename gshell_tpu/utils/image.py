"""Image IO helpers (twin of the reference util.save_image/load_image)."""
from __future__ import annotations

import numpy as np


def save_image(path: str, img) -> None:
    """Save float image [0,1] (H, W, 3|4) as PNG (sRGB'd by the caller)."""
    import imageio.v2 as imageio

    arr = np.asarray(img)
    arr = np.clip(arr, 0.0, 1.0)
    imageio.imwrite(path, (arr * 255).astype(np.uint8))


def load_image(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path))
    if img.dtype != np.float32:
        img = img.astype(np.float32) / 255.0
    return img
