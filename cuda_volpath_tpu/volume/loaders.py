"""Volume loaders: raw / binary / VDB, with quantization.

Mirrors the reference ingestion entry points (src/volumeRender.cpp:895-1019:
``loadRawFile``, ``loadBinaryFile``, ``loadVdbFile``).  VDB loading prefers
the native minimal reader (native/vdb_reader.cpp, built via the Makefile),
then falls back to ``pyopenvdb`` if available.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..io import volume_io

_NATIVE_DIR = Path(__file__).parent.parent / "native"


def _load_native(name: str) -> Optional[ctypes.CDLL]:
    so = _NATIVE_DIR / name
    if not so.exists():
        return None
    try:
        return ctypes.CDLL(str(so))
    except OSError:
        return None


def quantize(vol: np.ndarray, max_value: Optional[float] = None) -> np.ndarray:
    """Normalize-by-max uint8 quantization (volumeRender.cpp:1003-1013)."""
    vol = np.asarray(vol, np.float32)
    if max_value is None:
        max_value = max(float(vol.max()), 1e-4)
    return (np.maximum(vol, 0.0) / max_value * 255.0).astype(np.uint8)


def load_raw(path: str, shape: Tuple[int, int, int]) -> np.ndarray:
    return volume_io.read_raw(path, shape)


def load_binary(path: str, quantized: bool = True) -> np.ndarray:
    vol = volume_io.read_binary(path)
    if quantized:
        # loadBinaryFile clamps to [0,1] before quantizing
        # (volumeRender.cpp:950-955), unlike the VDB normalize-by-max path.
        return (np.clip(vol, 0.0, 1.0) * 255.0).astype(np.uint8)
    return vol


def load_vdb(path: str, quantized: bool = True, grid_index: int = 0
             ) -> np.ndarray:
    """Dense (Nz, Ny, Nx) from the first float grid of a .vdb file."""
    vol = None
    native_err = None
    lib = _load_native("libvdb.so")
    if lib is not None:
        try:
            vol = _load_vdb_native(lib, path, grid_index)
        except ValueError as e:
            # keep the parser's message but let pyopenvdb (when installed)
            # try layouts the native reader doesn't implement (pre-219
            # legacy files)
            native_err = e
    if vol is None:
        try:
            import pyopenvdb  # type: ignore
            grid = pyopenvdb.readAll(path)[0][grid_index]
            bbox = grid.evalActiveVoxelBoundingBox()
            dims = [bbox[1][i] - bbox[0][i] + 1 for i in range(3)]
            arr = np.zeros(dims, np.float32)
            grid.copyToArray(arr, ijk=bbox[0])
            vol = np.transpose(arr, (2, 1, 0))  # (x,y,z) -> (z,y,x)
        except ImportError:
            pass
    if vol is None:
        if native_err is not None:
            raise native_err
        raise RuntimeError(
            f"cannot read {path}: build the native reader with "
            f"`make -C {_NATIVE_DIR}` or install pyopenvdb, or pre-bake the "
            f"volume to the binary format (io.volume_io.write_binary)")
    if quantized:
        return quantize(vol)
    return vol


def _load_vdb_native(lib: ctypes.CDLL, path: str, grid_index: int
                     ) -> Optional[np.ndarray]:
    lib.vdb_read_float_grid.restype = ctypes.c_void_p
    lib.vdb_read_float_grid.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long)]
    lib.vdb_free.argtypes = [ctypes.c_void_p]
    lib.vdb_last_error.restype = ctypes.c_char_p
    nx = ctypes.c_long()
    ny = ctypes.c_long()
    nz = ctypes.c_long()
    ptr = lib.vdb_read_float_grid(path.encode(), grid_index,
                                  ctypes.byref(nx), ctypes.byref(ny),
                                  ctypes.byref(nz))
    if not ptr:
        # surface the parser's message instead of silently falling through
        # to the (usually absent) pyopenvdb path
        err = lib.vdb_last_error()
        raise ValueError(
            f"cannot parse {path}: "
            f"{err.decode() if err else 'unknown VDB reader error'}")
    n = nx.value * ny.value * nz.value
    buf = np.ctypeslib.as_array(
        ctypes.cast(ptr, ctypes.POINTER(ctypes.c_float)), (n,))
    out = buf.reshape(nz.value, ny.value, nx.value).copy()
    lib.vdb_free(ptr)
    return out


def build_multiscale_bounds_native(vol: np.ndarray,
                                   search_radius: float = 0.05,
                                   stride: int = 2,
                                   scale_mults=(1.0, 5.0, 25.0),
                                   filter_support: int = 1
                                   ) -> Optional[np.ndarray]:
    """C++/OpenMP multiscale bound pyramid + leap channel; None if the
    native lib is not built.  Bit-identical to
    ops.boundgrid.build_multiscale_bounds (the oracle)."""
    lib = _load_native("libboundgrid.so")
    if lib is None:
        return None
    vol = np.ascontiguousarray(vol)
    nz, ny, nx = vol.shape
    cell = 2.0 / nx
    rcs = np.asarray(
        [-(-(int(np.ceil(search_radius * m / cell)) + filter_support)
           // stride) for m in scale_mults], np.int64)
    ncx, ncy, ncz = (-(-nx // stride), -(-ny // stride), -(-nz // stride))
    chans = 2 * len(scale_mults) + 1
    out = np.empty((ncz, ncy, ncx, chans), vol.dtype)
    L = ctypes.c_long
    LP = ctypes.POINTER(ctypes.c_long)
    if vol.dtype == np.uint8:
        fn = lib.build_multiscale_bounds_u8
        ptr_t = ctypes.POINTER(ctypes.c_uint8)
        cap = 255
    elif vol.dtype == np.float32:
        fn = lib.build_multiscale_bounds_f32
        ptr_t = ctypes.POINTER(ctypes.c_float)
        cap = int(max(ncx, ncy, ncz))
    else:
        return None
    fn.argtypes = [ptr_t, L, L, L, L, L, LP, L, ptr_t]
    fn(vol.ctypes.data_as(ptr_t), nx, ny, nz, stride, len(scale_mults),
       rcs.ctypes.data_as(LP), cap, out.ctypes.data_as(ptr_t))
    return out


def build_bound_grid_native(vol: np.ndarray, search_radius: float = 0.05
                            ) -> Optional[np.ndarray]:
    """C++/OpenMP bound grid; None if the native lib is not built."""
    from ..ops.boundgrid import radius_in_voxels
    lib = _load_native("libboundgrid.so")
    if lib is None:
        return None
    vol = np.ascontiguousarray(vol)
    nz, ny, nx = vol.shape
    r = radius_in_voxels(nx, search_radius)
    out = np.empty((nz, ny, nx, 2), vol.dtype)
    L = ctypes.c_long
    if vol.dtype == np.uint8:
        fn = lib.build_bound_grid_u8
        ptr_t = ctypes.POINTER(ctypes.c_uint8)
    elif vol.dtype == np.float32:
        fn = lib.build_bound_grid_f32
        ptr_t = ctypes.POINTER(ctypes.c_float)
    else:
        return None
    fn.argtypes = [ptr_t, L, L, L, L, ptr_t]
    fn(vol.ctypes.data_as(ptr_t), nx, ny, nz, r, out.ctypes.data_as(ptr_t))
    return out
