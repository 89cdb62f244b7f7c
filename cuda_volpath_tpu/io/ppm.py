"""PPM image output (reference src/image.cpp dump_ppm: binary P6, rows
flipped so +y is up)."""

from __future__ import annotations

import numpy as np


def write_ppm(path: str, img: np.ndarray, flip_y: bool = True) -> None:
    """``img`` is (H, W, 3) float in [0, 1] (already tonemapped)."""
    img = np.asarray(img)
    if flip_y:
        img = img[::-1]
    data = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    h, w = data.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(data.tobytes())


def read_ppm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        line = f.readline()
        while line.startswith(b"#"):
            line = f.readline()
        w, h = map(int, line.split())
        maxv = int(f.readline())
        data = np.frombuffer(f.read(w * h * 3), np.uint8)
    return data.reshape(h, w, 3).astype(np.float32) / maxv
