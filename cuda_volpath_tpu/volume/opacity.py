"""Sun-opacity (optical depth) precompute.

Bakes ∫ density dt from each voxel center toward the sun into a 3D grid —
the NEE shortcut cache used once accumulation has warmed up (reference
``_precompute_opacity`` kernel, src/volumeRender_kernel.cu:483-553: dt =
0.001 fixed-step march; used at :2181-2196 when spp>10 && scatters>20).

On TPU this is a single jitted whole-grid op: every voxel marches in
lockstep with a bounded ``fori_loop`` of masked trilinear fetches.  The bake
re-runs whenever the sun moves (volumeRender.cpp:335-344).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import aabb
from ..ops import grid as gridmod

DT = 0.001  # kernel.cu:499


def bake(density: gridmod.Grid3D, light_dir, dt: float = DT,
         z_chunk: int = 16) -> jnp.ndarray:
    """Returns opacity grid data (Nz, Ny, Nx) float32.

    For each voxel center: intersect the volume box toward the sun, then
    accumulate density at t = t_near, t_near+dt, ... while t < t_far and
    multiply by dt (kernel.cu:511-521).
    """
    nx, ny, nz = density.dims
    light_dir = jnp.asarray(light_dir, jnp.float32)

    # conservative static trip count: the longest possible chord
    diag = float(np.linalg.norm(np.asarray(density.box_max, np.float64)
                                - np.asarray(density.box_min, np.float64)))
    max_steps = int(np.ceil(diag / dt)) + 1

    @jax.jit
    def slab(k0):
        k = k0 + jnp.arange(z_chunk)
        j = jnp.arange(ny)
        i = jnp.arange(nx)
        kk, jj, ii = jnp.meshgrid(k, j, i, indexing="ij")
        start = gridmod.voxel_center_world(density, ii, jj, kk)
        d = jnp.broadcast_to(light_dir, start.shape)
        hit, tn, tf = aabb.intersect_box(start, d, density.box_min,
                                         density.box_max)

        def body(step, acc):
            t = tn + step * jnp.float32(dt)
            live = hit & (t < tf)
            pos = start + d * t[..., None]
            val = gridmod.sample_world(density, pos, linear=True)
            return acc + jnp.where(live, val, 0.0)

        acc = jax.lax.fori_loop(0, max_steps, body,
                                jnp.zeros(start.shape[:-1], jnp.float32))
        return acc * jnp.float32(dt)

    out = np.zeros((nz + (-nz) % z_chunk, ny, nx), np.float32)
    for k0 in range(0, nz, z_chunk):
        out[k0:k0 + z_chunk] = np.asarray(slab(jnp.int32(k0)))
    return jnp.asarray(out[:nz])
