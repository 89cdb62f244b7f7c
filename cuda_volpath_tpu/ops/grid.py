"""Dense 3D grid storage and sampling (the TPU replacement for CUDA 3D
textures).

The reference keeps the density / bound / opacity volumes in CUDA arrays
behind texture objects with clamp addressing, normalized coordinates, and
either point or trilinear filtering (reference src/volumeRender_kernel.cu:
148-451, namespace TextureVolume).  TPUs have no texture units, so a grid is
an ordinary HBM array and a fetch is an explicit gather:

* nearest  — 1 gather per sample,
* trilinear — 8 corner gathers + lerp weights, fused by XLA into one pass.

Layout is ``(Nz, Ny, Nx)`` C-order so the flat index is
``x + Nx * (y + Ny * z)`` — identical to the reference host layout
(src/vdbloader/load_vdb.cpp:49), which keeps x the fastest-varying axis.

Quantized volumes are stored uint8 and dequantized ``v / 255`` on fetch,
matching ``cudaReadModeNormalizedFloat`` (kernel.cu:247).  World↔local
mapping matches ``CudaTexture::to_local/to_world`` (kernel.cu:169-171):
local coordinates are normalized to [0,1] over the bounding box, voxel
centers sit at ``(i + 0.5) / N``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Grid3D:
    """A box-mapped dense grid.

    ``data`` is ``(Nz, Ny, Nx)`` or ``(Nz, Ny, Nx, C)`` (multi-channel, e.g.
    the (max, min) bound grid).  ``box_min``/``box_max`` are world-space
    corners, shape ``(3,)`` in (x, y, z) order.
    """

    data: jnp.ndarray
    box_min: jnp.ndarray
    box_max: jnp.ndarray

    @property
    def dims(self) -> Tuple[int, int, int]:
        """(Nx, Ny, Nz)."""
        nz, ny, nx = self.data.shape[:3]
        return nx, ny, nz


def make_grid(data, box_min=None, box_max=None) -> Grid3D:
    """Build a Grid3D; default box follows the reference aspect convention
    ``±(1, Ny/Nx, Nz/Nx)`` (kernel.cu:305-312)."""
    data = jnp.asarray(data)
    nz, ny, nx = data.shape[:3]
    if box_min is None:
        box_min = (-1.0, -float(ny) / nx, -float(nz) / nx)
    if box_max is None:
        box_max = (1.0, float(ny) / nx, float(nz) / nx)
    return Grid3D(data=data,
                  box_min=jnp.asarray(box_min, jnp.float32),
                  box_max=jnp.asarray(box_max, jnp.float32))


def to_local(grid: Grid3D, pos: jnp.ndarray) -> jnp.ndarray:
    """World position → normalized [0,1]³ local coords (kernel.cu:169)."""
    return (pos - grid.box_min) / (grid.box_max - grid.box_min)


def to_world(grid: Grid3D, posn: jnp.ndarray) -> jnp.ndarray:
    """Normalized local coords → world (kernel.cu:171)."""
    return posn * (grid.box_max - grid.box_min) + grid.box_min


def _dequant(v: jnp.ndarray) -> jnp.ndarray:
    if v.dtype == jnp.uint8:
        return v.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    return v.astype(jnp.float32)


def _flat_gather(data: jnp.ndarray, ix, iy, iz) -> jnp.ndarray:
    """Gather voxels at integer coords (already clamped). Works for both
    single- and multi-channel grids.

    Single-channel grids are fetched through XLA-TPU's multi-channel
    row-gather path: a gather of (V/4, 4) rows costs ~half a scalar
    (V,) gather (measured ~4.2 vs 8.2 ns/element on v5e), and the in-row
    select is cheap VPU work.  Pure layout reinterpretation — bit-identical
    results."""
    nz, ny, nx = data.shape[:3]
    flat_idx = ix + nx * (iy + ny * iz)
    if data.ndim == 3:
        n = nx * ny * nz
        if n % 4 == 0:
            rows = jnp.take(data.reshape(-1, 4), flat_idx // 4, axis=0)
            # Barrier: the profiler showed XLA fusing this gather into each
            # consumer fusion and re-executing it per consumer (4× for the
            # density fetch, 3× for the bound fetch).  The barrier pins one
            # materialization; measured throughput-neutral on the current
            # step structure (the duplicates overlapped other work) but it
            # bounds gather work as the step gains consumers.
            rows = jax.lax.optimization_barrier(rows)
            sub = flat_idx % 4
            return jnp.where(
                sub == 0, rows[..., 0],
                jnp.where(sub == 1, rows[..., 1],
                          jnp.where(sub == 2, rows[..., 2], rows[..., 3])))
        flat = data.reshape(-1)
        return jax.lax.optimization_barrier(
            jnp.take(flat, flat_idx, axis=0))
    flat = data.reshape(-1, data.shape[-1])
    return jax.lax.optimization_barrier(
        jnp.take(flat, flat_idx, axis=0))


def sample_nearest(grid: Grid3D, pos_local: jnp.ndarray) -> jnp.ndarray:
    """Point-filtered fetch at normalized local coords with clamp addressing.

    Matches ``tex3D`` with cudaFilterModePoint + cudaAddressModeClamp:
    voxel index is floor(p * N), clamped to [0, N-1].
    """
    nz, ny, nx = grid.data.shape[:3]
    dims = jnp.asarray([nx, ny, nz], jnp.float32)
    idx = jnp.floor(pos_local * dims).astype(jnp.int32)
    idx = jnp.clip(idx, 0, jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32))
    return _dequant(_flat_gather(grid.data, idx[..., 0], idx[..., 1], idx[..., 2]))


def flat_index(grid: Grid3D, pos: jnp.ndarray) -> jnp.ndarray:
    """Point-filtered voxel *flat index* at world positions — the index
    math of ``sample_nearest``/``fetch_rows_raw`` (tex3D point + clamp
    semantics, kernel.cu:164-196) without the gather, so callers can fetch
    from a shared/concatenated row table (see integrator ``fused_fetch``).
    """
    p = to_local(grid, pos)
    nz, ny, nx = grid.data.shape[:3]
    dims = jnp.asarray([nx, ny, nz], jnp.float32)
    idx = jnp.floor(p * dims).astype(jnp.int32)
    idx = jnp.clip(idx, 0, jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32))
    return idx[..., 0] + nx * (idx[..., 1] + ny * idx[..., 2])


def fetch_rows_raw(grid: Grid3D, pos: jnp.ndarray) -> jnp.ndarray:
    """Point-filtered *raw* multi-channel row fetch at world positions.

    Returns the (..., C) channel rows as float32 **without** dequantization
    (uint8 values come back as 0..255 floats) so packed fixed-point
    channels can be recombined by the caller — see
    ``render.scene.pack_density_opacity``.  Index math is identical to
    ``sample_nearest`` (tex3D point + clamp semantics, kernel.cu:164-196).
    """
    flat_idx = flat_index(grid, pos)
    flat = grid.data.reshape(-1, grid.data.shape[-1])
    rows = jax.lax.optimization_barrier(jnp.take(flat, flat_idx, axis=0))
    return rows.astype(jnp.float32)


def sample_trilinear(grid: Grid3D, pos_local: jnp.ndarray) -> jnp.ndarray:
    """Trilinear fetch matching CUDA's linear texture filtering:
    ``xB = p*N - 0.5``, corners floor(xB) and +1, clamped, lerped by frac.
    """
    nz, ny, nx = grid.data.shape[:3]
    dims = jnp.asarray([nx, ny, nz], jnp.float32)
    hi = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32)

    xb = pos_local * dims - 0.5
    i0f = jnp.floor(xb)
    f = xb - i0f
    i0 = jnp.clip(i0f.astype(jnp.int32), 0, hi)
    i1 = jnp.clip(i0f.astype(jnp.int32) + 1, 0, hi)

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    if grid.data.ndim == 4:
        fx, fy, fz = fx[..., None], fy[..., None], fz[..., None]

    c000 = _dequant(_flat_gather(grid.data, x0, y0, z0))
    c100 = _dequant(_flat_gather(grid.data, x1, y0, z0))
    c010 = _dequant(_flat_gather(grid.data, x0, y1, z0))
    c110 = _dequant(_flat_gather(grid.data, x1, y1, z0))
    c001 = _dequant(_flat_gather(grid.data, x0, y0, z1))
    c101 = _dequant(_flat_gather(grid.data, x1, y0, z1))
    c011 = _dequant(_flat_gather(grid.data, x0, y1, z1))
    c111 = _dequant(_flat_gather(grid.data, x1, y1, z1))

    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def sample_world(grid: Grid3D, pos: jnp.ndarray, linear: bool = True) -> jnp.ndarray:
    """World-space fetch, ``CudaTexture::sample_w`` (kernel.cu:173-178)."""
    p = to_local(grid, pos)
    return sample_trilinear(grid, p) if linear else sample_nearest(grid, p)


def voxel_center_world(grid: Grid3D, i, j, k) -> jnp.ndarray:
    """World position of voxel center (i,j,k) — ``normalized_coord`` then
    ``to_world`` (kernel.cu:164-171, used by the opacity bake :501-502)."""
    nx, ny, nz = grid.dims
    pn = jnp.stack([(jnp.asarray(i, jnp.float32) + 0.5) / nx,
                    (jnp.asarray(j, jnp.float32) + 0.5) / ny,
                    (jnp.asarray(k, jnp.float32) + 0.5) / nz], axis=-1)
    return to_world(grid, pn)


def quantize_u8(vol: jnp.ndarray, max_value=None) -> jnp.ndarray:
    """Normalize-by-max uint8 quantization (reference
    src/volumeRender.cpp:1003-1013): ``u8(max(v,0)/max_value * 255)``."""
    import numpy as np
    vol = np.asarray(vol, np.float32)
    if max_value is None:
        max_value = max(float(vol.max()), 1e-4)
    q = np.maximum(vol, 0.0) / max_value * 255.0
    return jnp.asarray(q.astype(np.uint8))
