#!/usr/bin/env python3
"""Convert an OpenVDB file to this framework's dense binary volume format.

Run this on any machine with OpenVDB python bindings installed (pyopenvdb
or the openvdb wheel); the output `.bin` loads here via
``cuda_volpath_tpu.volume.loaders.load_binary`` / the CLI's ``--volume``.

Format (reference ``loadBinaryFile``, src/volumeRender.cpp:915-965):
    int32 w, int32 h, int32 d, then w*h*d float32 (x fastest).

Usage:
    python tools/vdb_to_binary.py wdas_cloud_eighth.vdb cloud.bin
"""

import struct
import sys


def convert(src: str, dst: str, grid_index: int = 0) -> None:
    import numpy as np
    try:
        import pyopenvdb as vdb
    except ImportError:
        import openvdb as vdb  # the 'openvdb' wheel spells it this way
    grids = vdb.readAll(src)[0]
    grid = grids[grid_index]
    bbox = grid.evalActiveVoxelBoundingBox()
    dims = [bbox[1][i] - bbox[0][i] + 1 for i in range(3)]
    print(f"grid '{grid.name}' active bbox {bbox} -> dense {dims}")
    arr = np.zeros(dims, np.float32)        # (x, y, z) indexing
    grid.copyToArray(arr, ijk=bbox[0])
    vol = np.transpose(arr, (2, 1, 0))      # -> (z, y, x), x fastest
    nz, ny, nx = vol.shape
    with open(dst, "wb") as f:
        f.write(struct.pack("<iii", nx, ny, nz))
        f.write(np.ascontiguousarray(vol, "<f4").tobytes())
    print(f"wrote {dst}: {nx}x{ny}x{nz}, "
          f"max {vol.max():.4f}, {vol.nbytes / 1e6:.1f} MB")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    convert(sys.argv[1], sys.argv[2],
            int(sys.argv[3]) if len(sys.argv) > 3 else 0)
