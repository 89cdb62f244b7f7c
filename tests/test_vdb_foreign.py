"""Foreign-layout validation of the from-scratch VDB stack.

The in-repo writer (io/vdb.py) and native reader (native/vdb_reader.cpp)
could share a misconception and still round-trip cleanly, so these tests
bring in outside ground truth:

* the REAL c-blosc library (libblosc.so.1, the codec OpenVDB links) as an
  oracle: frames produced by our writer must decompress with genuine
  blosc, and frames produced by genuine blosc (including its memcpy-flag
  and uncompressed-block fallbacks) must parse in our native reader;
* the reader's memcpy-flag branch is exercised end-to-end through a full
  archive (previously only reachable, never reached — ADVICE.md);
* hostile-input fuzzing: truncations and byte flips must surface as clean
  Python-level errors through the ctypes boundary (vdb_last_error), never
  crashes.
"""

import ctypes
import struct

import numpy as np
import pytest

from cuda_volpath_tpu.io import vdb
from cuda_volpath_tpu.volume import loaders


def _native_available():
    return loaders._load_native("libvdb.so") is not None


pytestmark = pytest.mark.skipif(not _native_available(),
                                reason="native libvdb.so not built")


@pytest.fixture(scope="module")
def blosc():
    """ctypes handle to the genuine c-blosc1 library."""
    try:
        lib = ctypes.CDLL("libblosc.so.1")
    except OSError:
        pytest.skip("libblosc not available")
    lib.blosc_init()
    lib.blosc_compress.restype = ctypes.c_int
    lib.blosc_compress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t]
    lib.blosc_decompress.restype = ctypes.c_int
    lib.blosc_decompress.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_size_t]
    lib.blosc_set_compressor.argtypes = [ctypes.c_char_p]
    lib.blosc_set_compressor(b"lz4")
    return lib


def _real_blosc_frame(lib, payload: bytes, typesize: int,
                      shuffle: bool) -> bytes:
    dest = ctypes.create_string_buffer(len(payload) + 16 + 32)
    n = lib.blosc_compress(5, 1 if shuffle else 0, typesize, len(payload),
                           payload, dest, len(dest))
    assert n > 0, "blosc_compress failed"
    return dest.raw[:n]


def _payloads(rng):
    """Leaf-buffer-shaped payloads: compressible, incompressible, tiny."""
    smooth = np.linspace(0, 1, 512, dtype="<f4").tobytes()   # full leaf
    rand = rng.random(512).astype("<f4").tobytes()           # incompressible
    const = np.full(512, 0.25, "<f4").tobytes()
    tiny = np.asarray([1.5, -2.5], "<f4").tobytes()
    return {"smooth": smooth, "random": rand, "const": const, "tiny": tiny}


def test_writer_frames_decode_with_real_blosc(blosc, rng_np):
    """Our hand-rolled blosc/LZ4 frames are genuine blosc frames."""
    for name, payload in _payloads(rng_np).items():
        frame = vdb._blosc_lz4_frame(payload, 4, shuffle=True)
        out = ctypes.create_string_buffer(len(payload))
        n = blosc.blosc_decompress(frame, out, len(payload))
        assert n == len(payload), f"{name}: real blosc rejected our frame"
        assert out.raw == payload, f"{name}: payload mismatch"
    # the memcpy-flag helper too
    payload = _payloads(rng_np)["random"]
    frame = vdb._blosc_memcpy_frame(payload)
    out = ctypes.create_string_buffer(len(payload))
    assert blosc.blosc_decompress(frame, out, len(payload)) == len(payload)
    assert out.raw == payload


def _roundtrip(tmp_path, dense, frame_fn, monkeypatch):
    monkeypatch.setattr(vdb, "_blosc_lz4_frame",
                        lambda payload, ts, shuffle: frame_fn(payload, ts,
                                                              shuffle))
    path = tmp_path / "t.vdb"
    vdb.write_vdb(str(path), dense, compression=vdb.COMPRESS_BLOSC)
    return loaders.load_vdb(str(path), quantized=False)


def test_vendored_real_blosc_fixture_parses():
    """Committed archives whose codec frames were produced by GENUINE
    libblosc (tools/make_foreign_fixture.py) parse in the native reader —
    runs unconditionally, no optional dependency (VERDICT r2 #6: the live
    cross-checks skip wherever libblosc is absent; these bytes don't).
    """
    import pathlib
    data = pathlib.Path(__file__).parent / "data"
    want = np.load(data / "foreign_blosc_expected.npz")["dense"]
    for name in ("foreign_blosc_shuffle.vdb", "foreign_blosc_noshuffle.vdb"):
        got = loaders.load_vdb(str(data / name), quantized=False)
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_real_blosc_frames_parse_in_native_reader(blosc, tmp_path,
                                                  monkeypatch, rng_np):
    """Archives whose codec frames come from genuine libblosc (shuffle+LZ4,
    with its own memcpy/uncompressed-block fallbacks) must parse."""
    dense = rng_np.random((9, 7, 11)).astype(np.float32)
    dense[dense < 0.3] = 0.0
    got = _roundtrip(tmp_path, dense,
                     lambda p, ts, sh: _real_blosc_frame(blosc, p, ts, sh),
                     monkeypatch)
    np.testing.assert_array_equal(got, dense)


def test_real_blosc_noshuffle_frames(blosc, tmp_path, monkeypatch):
    # fully active so the bbox crop is the identity
    dense = np.linspace(0.1, 1, 8 * 8 * 8, dtype=np.float32
                        ).reshape(8, 8, 8)
    got = _roundtrip(tmp_path, dense,
                     lambda p, ts, sh: _real_blosc_frame(blosc, p, ts,
                                                         shuffle=False),
                     monkeypatch)
    np.testing.assert_array_equal(got, dense)


def test_memcpy_flag_archive(tmp_path, monkeypatch, rng_np):
    """Full archive through the reader's memcpyed-frame branch
    (ADVICE.md: previously written but unreachable from the writer)."""
    dense = rng_np.random((6, 6, 6)).astype(np.float32)
    got = _roundtrip(tmp_path, dense,
                     lambda p, ts, sh: vdb._blosc_memcpy_frame(p),
                     monkeypatch)
    np.testing.assert_array_equal(got, dense)


def test_absurd_blosc_nbytes_rejected(tmp_path, monkeypatch):
    """A frame whose header demands a multi-GiB output must be rejected
    before allocation (DoS hardening, ADVICE.md)."""
    def evil_frame(payload, ts, shuffle):
        frame = bytearray(vdb._blosc_memcpy_frame(payload))
        struct.pack_into("<I", frame, 4, 1 << 30)   # nbytes = 1 GiB
        return bytes(frame)
    dense = np.ones((4, 4, 4), np.float32)
    with pytest.raises(Exception):
        _roundtrip(tmp_path, dense, evil_frame, monkeypatch)


def _write_sample(tmp_path, compression):
    dense = np.zeros((10, 12, 9), np.float32)
    dense[2:8, 3:9, 2:7] = np.arange(6 * 6 * 5, dtype=np.float32
                                     ).reshape(6, 6, 5) / 100.0
    path = tmp_path / "fuzz.vdb"
    vdb.write_vdb(str(path), dense, origin=(-5, 17, 3),
                  compression=compression)
    return path, dense


@pytest.mark.parametrize("compression",
                         [vdb.COMPRESS_ZIP,
                          vdb.COMPRESS_BLOSC | vdb.COMPRESS_ACTIVE_MASK])
def test_truncation_fuzz(tmp_path, compression):
    """Every truncation must either parse (impossible here) or raise a
    clean error through ctypes — no crash, no garbage success."""
    path, _ = _write_sample(tmp_path, compression)
    blob = path.read_bytes()
    tpath = tmp_path / "trunc.vdb"
    for cut in list(range(0, min(len(blob), 64))) + \
            list(range(64, len(blob), 41)):
        tpath.write_bytes(blob[:cut])
        with pytest.raises((ValueError, RuntimeError)):
            loaders.load_vdb(str(tpath))


@pytest.mark.parametrize("compression",
                         [vdb.COMPRESS_ZIP, vdb.COMPRESS_BLOSC])
def test_bitflip_fuzz(tmp_path, compression, monkeypatch):
    """Random byte corruption: parse cleanly or fail cleanly; if it parses,
    the result must be a sane ndarray.  A flipped node origin legitimately
    expands the active bbox, so the densification cap (VDB_MAX_DENSE_ELEMS)
    is lowered to bound allocations — which also exercises the override."""
    monkeypatch.setenv("VDB_MAX_DENSE_ELEMS", str(10_000_000))
    path, _ = _write_sample(tmp_path, compression)
    blob = bytearray(path.read_bytes())
    rng = np.random.default_rng(42)
    fpath = tmp_path / "flip.vdb"
    for _ in range(300):
        pos = int(rng.integers(0, len(blob)))
        old = blob[pos]
        blob[pos] = int(rng.integers(0, 256))
        fpath.write_bytes(bytes(blob))
        try:
            out = loaders.load_vdb(str(fpath), quantized=False)
            assert isinstance(out, np.ndarray) and out.size <= 10_000_000
        except (ValueError, RuntimeError):
            pass
        blob[pos] = old


def test_parse_error_message_surfaces(tmp_path):
    """The ctypes boundary returns null + vdb_last_error; Python raises the
    parser's message (VERDICT round 1, item 9)."""
    p = tmp_path / "bad.vdb"
    p.write_bytes(b"this is not a vdb file at all........")
    with pytest.raises(ValueError, match="magic|parse"):
        loaders.load_vdb(str(p))
