"""VDB round-trip tests: io.vdb writer ↔ native from-scratch reader.

The native reader (native/vdb_reader.cpp) replaces the reference's
OpenVDB-based loader (reference vdbloader/load_vdb.cpp); these tests
exercise the archive layout and every leaf codec the reader supports
(raw / zlib / blosc frame / half floats / active-mask compression) through
self-written files, plus the dense bake's active-bbox semantics
(load_vdb.cpp:72-117: densify *active* voxels over their bounding box).
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from cuda_volpath_tpu.io import vdb as vdbw
from cuda_volpath_tpu.volume import loaders

NATIVE = Path(loaders.__file__).parent.parent / "native"


@pytest.fixture(scope="module")
def libvdb():
    so = NATIVE / "libvdb.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(NATIVE), "libvdb.so"],
                           check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("no C++ toolchain to build libvdb.so")
    lib = loaders._load_native("libvdb.so")
    if lib is None:
        pytest.skip("libvdb.so unavailable")
    return lib


def blob(n=24, seed=0):
    """A wispy test volume with an interior bbox smaller than the array."""
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[:n, :n, :n].astype(np.float32)
    c = (n - 1) / 2.0
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    vol = np.maximum(0.0, 1.0 - r / (n * 0.4)).astype(np.float32)
    vol[vol < 0.15] = 0.0
    vol *= (rng.random(vol.shape) > 0.2)
    return vol


def roundtrip(tmp_path, vol, origin=(0, 0, 0), **kw):
    path = tmp_path / "t.vdb"
    vdbw.write_vdb(str(path), vol, origin=origin, **kw)
    return loaders.load_vdb(str(path), quantized=False)


def crop_to_active(vol):
    nz = np.nonzero(vol)
    lo = [int(a.min()) for a in nz]
    hi = [int(a.max()) for a in nz]
    return vol[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1, lo[2]:hi[2] + 1]


@pytest.mark.parametrize("compression", [
    vdbw.COMPRESS_NONE,
    vdbw.COMPRESS_ZIP,
    vdbw.COMPRESS_BLOSC,
    vdbw.COMPRESS_ZIP | vdbw.COMPRESS_ACTIVE_MASK,
    vdbw.COMPRESS_NONE | vdbw.COMPRESS_ACTIVE_MASK,
])
def test_roundtrip_codecs(tmp_path, libvdb, compression):
    vol = blob()
    got = roundtrip(tmp_path, vol, compression=compression)
    np.testing.assert_array_equal(got, crop_to_active(vol))


def test_roundtrip_half(tmp_path, libvdb):
    vol = blob()
    got = roundtrip(tmp_path, vol, compression=vdbw.COMPRESS_ZIP, half=True)
    want = crop_to_active(vol).astype(np.float16).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_roundtrip_offset_origin(tmp_path, libvdb):
    # unaligned negative origin exercises leaf/node alignment
    vol = blob(n=20, seed=3)
    got = roundtrip(tmp_path, vol, origin=(-13, 7, -2))
    np.testing.assert_array_equal(got, crop_to_active(vol))


def test_roundtrip_multi_node(tmp_path, libvdb):
    # spans multiple 16^3 mid nodes and crosses a 4096-aligned top boundary
    vol = np.zeros((40, 40, 40), np.float32)
    vol[2, 3, 4] = 1.0
    vol[35, 30, 25] = 2.0
    vol[20, 20, 20] = 3.0
    got = roundtrip(tmp_path, vol, origin=(4090, -20, 1))
    np.testing.assert_array_equal(got, crop_to_active(vol))


def test_active_mask_semantics(tmp_path, libvdb):
    # inactive (zero) voxels inside the bbox come back as zero even with
    # active-mask compression dropping them from the payload
    vol = np.zeros((10, 10, 10), np.float32)
    vol[1, 1, 1] = 1.0
    vol[8, 8, 8] = 2.0
    got = roundtrip(
        tmp_path, vol,
        compression=vdbw.COMPRESS_ZIP | vdbw.COMPRESS_ACTIVE_MASK)
    want = crop_to_active(vol)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_quantize_matches_reference_semantics(tmp_path, libvdb):
    vol = blob(seed=5) * 3.7
    path = tmp_path / "q.vdb"
    vdbw.write_vdb(str(path), vol)
    q = loaders.load_vdb(str(path), quantized=True)
    dense = crop_to_active(vol)
    want = (np.maximum(dense, 0) / dense.max() * 255).astype(np.uint8)
    np.testing.assert_array_equal(q, want)


def test_lz4_encoder_roundtrip_pure_python():
    """The writer's LZ4 block encoder against an independent decoder."""
    import numpy as np
    rng = np.random.default_rng(1)
    payloads = [
        b"\x01\x02\x03\x04" * 200,                       # repetitive
        bytes(rng.integers(0, 256, 300, dtype=np.uint8)),  # incompressible
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),   # low entropy
        b"abc",                                            # tiny
    ]

    def lz4_decode(src, n):
        sp, dp = 0, bytearray()
        while sp < len(src):
            token = src[sp]; sp += 1
            lit = token >> 4
            if lit == 15:
                while True:
                    b = src[sp]; sp += 1; lit += b
                    if b != 255:
                        break
            dp += src[sp:sp + lit]; sp += lit
            if sp >= len(src):
                break
            off = src[sp] | (src[sp + 1] << 8); sp += 2
            ml = token & 15
            if ml == 15:
                while True:
                    b = src[sp]; sp += 1; ml += b
                    if b != 255:
                        break
            ml += 4
            for _ in range(ml):
                dp.append(dp[-off])
        return bytes(dp)

    for p in payloads:
        comp = vdbw.lz4_compress_block(p)
        assert lz4_decode(comp, len(p)) == p


def test_roundtrip_blosc_lz4_native(tmp_path, libvdb):
    """Compressible volume → real LZ4 blosc frames (shuffle on) decoded by
    the native reader's hand-rolled LZ4/unshuffle path."""
    n = 24
    vol = np.zeros((n, n, n), np.float32)
    vol[4:20, 4:20, 4:20] = 0.5            # uniform block: compresses well
    vol[10, 10, 10] = 2.0
    got = roundtrip(tmp_path, vol, compression=vdbw.COMPRESS_BLOSC)
    np.testing.assert_array_equal(got, crop_to_active(vol))


def test_roundtrip_tiles(tmp_path, libvdb):
    """Pruned constant regions (active mid-level tiles, 128-voxel span) are
    rasterized by the reader — the failure mode is silent holes."""
    vol = np.zeros((8, 8, 8), np.float32)
    vol[2, 3, 4] = 1.5
    path = tmp_path / "t.vdb"
    vdbw.write_vdb(str(path), vol, origin=(0, 0, 0),
                   tiles=[((128, 0, 0), 0.75)])
    got = loaders.load_vdb(str(path), quantized=False)
    # bbox spans the voxel data and the tile: x in [4, 255]
    assert got.shape == (128, 128, 252)
    assert got[2, 3, 0] == 1.5
    tile = got[0:128, 0:128, 128 - 4:256 - 4]
    np.testing.assert_array_equal(tile, np.full_like(tile, 0.75))
    # in-bbox background stays zero
    assert got[50, 50, 50] == 0.0


def test_multi_grid_index(tmp_path, libvdb):
    """grid_index selects among float grids in a multi-grid archive."""
    a = np.zeros((6, 6, 6), np.float32); a[1, 1, 1] = 1.0
    b = np.zeros((5, 5, 5), np.float32); b[2, 2, 2] = 7.0
    path = tmp_path / "m.vdb"
    vdbw.write_vdb_multi(str(path), [
        {"name": "density", "dense": a},
        {"name": "temperature", "dense": b}])
    g0 = loaders.load_vdb(str(path), quantized=False, grid_index=0)
    g1 = loaders.load_vdb(str(path), quantized=False, grid_index=1)
    assert g0.shape == (1, 1, 1) and g0[0, 0, 0] == 1.0
    assert g1.shape == (1, 1, 1) and g1[0, 0, 0] == 7.0
