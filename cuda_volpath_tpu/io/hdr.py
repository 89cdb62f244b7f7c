"""Radiance .hdr (RGBE) reader/writer.

Replaces the reference's HDR pipeline (reader src/hdr/HDRloader.cpp +
rgbe.cpp; writer src/image.cpp dump_hdr) with a from-scratch numpy codec.
Supports both new-style RLE scanlines and flat (uncompressed / old-style)
data on read; writes new-style RLE.
"""

from __future__ import annotations

import numpy as np


def _float_to_rgbe(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) float → (..., 4) uint8 RGBE."""
    rgb = np.maximum(np.asarray(rgb, np.float32), 0.0)
    maxc = rgb.max(axis=-1)
    out = np.zeros(rgb.shape[:-1] + (4,), np.uint8)
    nz = maxc >= 1e-32
    with np.errstate(divide="ignore", invalid="ignore"):
        exp = np.where(nz, np.floor(np.log2(np.maximum(maxc, 1e-38))) + 1, 0)
        scale = np.where(nz, 256.0 / np.exp2(exp), 0.0)
    mant = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    out[..., :3] = np.where(nz[..., None], mant, 0)
    out[..., 3] = np.where(nz, (exp + 128).astype(np.uint8), 0)
    return out


def _rgbe_to_float(rgbe: np.ndarray) -> np.ndarray:
    rgbe = np.asarray(rgbe)
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp > 0, np.exp2(exp - 136, dtype=np.float64), 0.0)
    return (rgbe[..., :3].astype(np.float32) + 0.5) * scale.astype(np.float32)[..., None]


def write_hdr(path: str, img: np.ndarray, flip_y: bool = True) -> None:
    """``img`` is (H, W, 3) linear float radiance."""
    img = np.asarray(img, np.float32)
    if flip_y:
        img = img[::-1]
    h, w = img.shape[:2]
    rgbe = _float_to_rgbe(img)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        if w < 8 or w > 0x7FFF:
            f.write(rgbe.tobytes())
            return
        for y in range(h):
            f.write(bytes([2, 2, (w >> 8) & 0xFF, w & 0xFF]))
            for c in range(4):
                f.write(_rle_encode(rgbe[y, :, c]))


def _rle_encode(row: np.ndarray) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find a run of >= 4 identical bytes
        run_start = i
        while run_start < n:
            run_len = 1
            while (run_start + run_len < n and run_len < 127
                   and row[run_start + run_len] == row[run_start]):
                run_len += 1
            if run_len >= 4:
                break
            run_start += 1
        else:
            run_start = n
        # literal section before the run
        lit = run_start - i
        while lit > 0:
            chunk = min(lit, 128)
            out.append(chunk)
            out.extend(row[i:i + chunk].tobytes())
            i += chunk
            lit -= chunk
        if run_start < n:
            run_len = 1
            while (run_start + run_len < n and run_len < 127
                   and row[run_start + run_len] == row[run_start]):
                run_len += 1
            out.append(128 + run_len)
            out.append(int(row[run_start]))
            i = run_start + run_len
    return bytes(out)


def read_hdr(path: str, flip_y: bool = True) -> np.ndarray:
    """Returns (H, W, 3) float32 linear radiance."""
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#?"):
            raise ValueError("not a Radiance file")
        while True:
            line = f.readline()
            if line in (b"\n", b""):
                break
        dims = f.readline().split()
        if dims[0] != b"-Y" or dims[2] != b"+X":
            raise ValueError(f"unsupported orientation {dims!r}")
        h, w = int(dims[1]), int(dims[3])
        data = f.read()

    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if (w < 8 or w > 0x7FFF or data[pos] != 2 or data[pos + 1] != 2
                or (data[pos + 2] & 0x80)):
            # flat / old-style scanline
            row, pos = _read_flat_scanline(data, pos, w)
            rgbe[y] = row
            continue
        assert ((data[pos + 2] << 8) | data[pos + 3]) == w
        pos += 4
        for c in range(4):
            x = 0
            while x < w:
                count = data[pos]
                pos += 1
                if count > 128:  # run
                    rgbe[y, x:x + count - 128, c] = data[pos]
                    pos += 1
                    x += count - 128
                else:  # literal
                    rgbe[y, x:x + count, c] = np.frombuffer(
                        data, np.uint8, count, pos)
                    pos += count
                    x += count
    img = _rgbe_to_float(rgbe)
    return img[::-1] if flip_y else img


def _read_flat_scanline(data: bytes, pos: int, w: int):
    """Uncompressed or old-style (consecutive-count) scanline."""
    row = np.zeros((w, 4), np.uint8)
    x = 0
    shift = 0
    while x < w:
        px = np.frombuffer(data, np.uint8, 4, pos)
        pos += 4
        if px[0] == 1 and px[1] == 1 and px[2] == 1:  # old-style run
            count = int(px[3]) << shift
            row[x:x + count] = row[x - 1]
            x += count
            shift += 8
        else:
            row[x] = px
            x += 1
            shift = 0
    return row, pos
