"""Shared sample utilities (image output without display dependencies)."""

import numpy as np


def save_ppm(path, pixels):
    """Writes [H, W, 3] float pixels in [0, 1] as a binary PPM image."""
    pixels = np.asarray(pixels)
    data = (np.clip(pixels, 0., 1.) * 255).astype(np.uint8)
    h, w = data.shape[:2]
    with open(path, 'wb') as f:
        f.write(f'P6\n{w} {h}\n255\n'.encode())
        f.write(data.tobytes())
    print(f'wrote {path} ({w}x{h})')
