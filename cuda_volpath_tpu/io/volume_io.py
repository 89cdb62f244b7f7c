"""Volume file I/O.

* ``read_binary``/``write_binary`` — the reference's simple dense format:
  three int32 (w, h, d) followed by w*h*d float32, x-fastest
  (reference loadBinaryFile src/volumeRender.cpp:915-965 and
  Volume::dump vdbloader/load_vdb.cpp:52-69).
* ``read_raw`` — headerless uint8 (loadRawFile, volumeRender.cpp:895-913).
* ``load_volume`` — dispatch by extension, incl. .vdb via the native
  minimal OpenVDB reader when built (volume/loaders.py).
"""

from __future__ import annotations

import struct

import numpy as np


def read_binary(path: str) -> np.ndarray:
    """Returns (Nz, Ny, Nx) float32 (the file is x-fastest / z-major)."""
    with open(path, "rb") as f:
        w, h, d = struct.unpack("<iii", f.read(12))
        if min(w, h, d) < 0 or w * h * d > 1 << 33:
            raise ValueError(f"bad volume dims {(w, h, d)}")
        data = np.fromfile(f, np.float32, w * h * d)
    return data.reshape(d, h, w)


def write_binary(path: str, vol: np.ndarray) -> None:
    vol = np.asarray(vol, np.float32)
    d, h, w = vol.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<iii", w, h, d))
        vol.tofile(f)


def read_raw(path: str, shape) -> np.ndarray:
    """(Nz, Ny, Nx) from headerless uint8."""
    d, h, w = shape
    data = np.fromfile(path, np.uint8, w * h * d)
    return data.reshape(d, h, w)
