"""Image and volume I/O round trips."""

import numpy as np

from cuda_volpath_tpu.io import hdr, ppm, volume_io


def test_ppm_roundtrip(tmp_path, rng_np):
    img = rng_np.random((12, 17, 3)).astype(np.float32)
    p = str(tmp_path / "t.ppm")
    ppm.write_ppm(p, img)
    back = ppm.read_ppm(p)[::-1]
    np.testing.assert_allclose(back, img, atol=1.0 / 255.0)


def test_hdr_roundtrip(tmp_path, rng_np):
    img = (rng_np.random((33, 65, 3)).astype(np.float32) * 100.0) ** 2
    img[5, :, :] = 0.0           # zero runs exercise RLE
    img[:, 10, 1] = 7.25
    p = str(tmp_path / "t.hdr")
    hdr.write_hdr(p, img)
    back = hdr.read_hdr(p)
    # RGBE shares one exponent across channels: error is bounded by one
    # mantissa step of the brightest channel of each pixel.
    step = img.max(axis=-1, keepdims=True) / 256.0
    assert (np.abs(back - img) <= step + 1e-4).all()


def test_hdr_narrow_image_flat_path(tmp_path, rng_np):
    img = rng_np.random((4, 4, 3)).astype(np.float32)  # w<8 → flat scanlines
    p = str(tmp_path / "n.hdr")
    hdr.write_hdr(p, img)
    back = hdr.read_hdr(p)
    step = img.max(axis=-1, keepdims=True) / 256.0
    assert (np.abs(back - img) <= step + 1e-4).all()


def test_binary_volume_roundtrip(tmp_path, rng_np):
    vol = rng_np.random((5, 6, 7)).astype(np.float32)
    p = str(tmp_path / "v.bin")
    volume_io.write_binary(p, vol)
    back = volume_io.read_binary(p)
    np.testing.assert_array_equal(back, vol)


def test_png_writer_valid(tmp_path, rng_np):
    """Our from-scratch PNG decodes byte-exactly in an independent reader
    (PIL) when available; always checks the chunk structure."""
    from cuda_volpath_tpu.io.png import write_png
    img = (rng_np.random((13, 17, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    blob = open(p, "rb").read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in blob[:33]
    # trailing chunk: zero length + "IEND" + the CRC of the bare tag
    import struct
    import zlib
    assert blob[-12:-4] == struct.pack(">I", 0) + b"IEND"
    assert blob[-4:] == struct.pack(">I", zlib.crc32(b"IEND"))
    try:
        from PIL import Image
    except ImportError:
        return
    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, img)
