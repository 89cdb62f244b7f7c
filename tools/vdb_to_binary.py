#!/usr/bin/env python3
"""Convert an OpenVDB file to this framework's dense binary volume format.

Uses the in-repo from-scratch native reader (native/vdb_reader.cpp, built
with `make -C cuda_volpath_tpu/native libvdb.so`), falling back to
pyopenvdb when installed; the output `.bin` loads here via
``cuda_volpath_tpu.volume.loaders.load_binary`` / the CLI's ``--volume``.
(Note: `.vdb` files also load directly via ``--volume file.vdb``; this tool
exists for pre-baking to skip parse cost.)

Format (reference ``loadBinaryFile``, src/volumeRender.cpp:915-965):
    int32 w, int32 h, int32 d, then w*h*d float32 (x fastest).

Usage:
    python tools/vdb_to_binary.py wdas_cloud_eighth.vdb cloud.bin
"""

import struct
import sys


def convert(src: str, dst: str, grid_index: int = 0) -> None:
    import numpy as np
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from cuda_volpath_tpu.volume import loaders
    # the in-repo native reader first (no OpenVDB install needed),
    # pyopenvdb as fallback — loaders.load_vdb tries both
    vol = loaders.load_vdb(src, quantized=False, grid_index=grid_index)
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
