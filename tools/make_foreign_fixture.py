"""Generate tests/data/foreign_blosc*.vdb — archives whose blosc codec
frames were produced by GENUINE c-blosc (libblosc.so.1, the codec OpenVDB
links), committed as binary fixtures so the foreign-layout validation in
tests/test_vdb_foreign.py runs with zero optional dependencies (VERDICT r2
 #6: the live-library cross-checks skip where libblosc is absent).

Run where libblosc.so.1 is available:
    python tools/make_foreign_fixture.py
"""

import ctypes
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cuda_volpath_tpu.io import vdb

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "data")


def real_blosc():
    lib = ctypes.CDLL("libblosc.so.1")
    lib.blosc_init()
    lib.blosc_compress.restype = ctypes.c_int
    lib.blosc_compress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t]
    lib.blosc_set_compressor.argtypes = [ctypes.c_char_p]
    lib.blosc_set_compressor(b"lz4")
    return lib


def frame_fn(lib, use_shuffle):
    # accepts (and ignores) the writer's shuffle kwarg — the fixture's
    # shuffle mode is pinned per output file
    def fn(payload, typesize, shuffle=True):
        dest = ctypes.create_string_buffer(len(payload) + 16 + 32)
        n = lib.blosc_compress(5, 1 if use_shuffle else 0, typesize,
                               len(payload), payload, dest, len(dest))
        assert n > 0, "blosc_compress failed"
        return dest.raw[:n]
    return fn


def main():
    os.makedirs(OUT, exist_ok=True)
    lib = real_blosc()
    rng = np.random.default_rng(20260820)
    # mixed content: smooth (compressible), random (memcpy/uncompressed
    # fallback inside blosc), constant, sparse — across multiple leaves
    dense = np.zeros((19, 13, 17), np.float32)
    dense[2:17, 1:12, 3:15] = rng.random((15, 11, 12)).astype(np.float32)
    dense[dense < 0.25] = 0.0
    dense[4:8, 4:8, 4:8] = 0.5
    orig = vdb._blosc_lz4_frame
    try:
        for name, shuffle in [("shuffle", True), ("noshuffle", False)]:
            vdb._blosc_lz4_frame = frame_fn(lib, shuffle)
            path = os.path.join(OUT, f"foreign_blosc_{name}.vdb")
            vdb.write_vdb(path, dense, origin=(-3, 7, 2),
                          compression=vdb.COMPRESS_BLOSC)
            print(path, os.path.getsize(path), "bytes")
    finally:
        vdb._blosc_lz4_frame = orig
    # the loader densifies the ACTIVE bounding box (load_vdb.cpp:72-117
    # contract), so the expectation is the nonzero-cropped region
    nzi = np.nonzero(dense)
    sl = tuple(slice(int(a.min()), int(a.max()) + 1) for a in nzi)
    np.savez_compressed(os.path.join(OUT, "foreign_blosc_expected.npz"),
                        dense=dense[sl])
    print("expected dense:", dense[sl].shape, float(dense.max()))


if __name__ == "__main__":
    main()
