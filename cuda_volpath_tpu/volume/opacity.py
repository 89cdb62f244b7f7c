"""Sun-opacity (optical depth) precompute.

Bakes ∫ density dt from each voxel center toward the sun into a 3D grid —
the NEE shortcut cache used once accumulation has warmed up (reference
``_precompute_opacity`` kernel, src/volumeRender_kernel.cu:483-553: dt =
0.001 fixed-step march; used at :2181-2196 when spp>10 && scatters>20).

TPU-native structure: the march is Python-unrolled in fixed-size t-chunks
over the *whole* grid per jitted call (gathers inside ``lax.fori_loop``
bodies lower to a serialized path that is orders of magnitude slower than
top-level gathers — same rule as the integrator's micro-steps).  Point
sampling matches the reference default (the bake samples through
``density_tex.sample_w`` under the global ``linear_interp = false``,
kernel.cu:351, 518).  The bake re-runs whenever the sun moves
(volumeRender.cpp:335-344).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import aabb
from ..ops import grid as gridmod

DT = 0.001  # kernel.cu:499


def bake(density: gridmod.Grid3D, light_dir, dt: float = DT,
         steps_per_call: int = 8, linear: bool = False) -> jnp.ndarray:
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
    def setup():
        k = jnp.arange(nz)
        j = jnp.arange(ny)
        i = jnp.arange(nx)
        kk, jj, ii = jnp.meshgrid(k, j, i, indexing="ij")
        start = gridmod.voxel_center_world(
            density, ii.reshape(-1), jj.reshape(-1), kk.reshape(-1))
        d = jnp.broadcast_to(light_dir, start.shape)
        hit, tn, tf = aabb.intersect_box(start, d, density.box_min,
                                         density.box_max)
        return start, jnp.where(hit, tn, 0.0), jnp.where(hit, tf, -1.0)

    start, tn, tf = setup()

    # start/tn/tf are arguments, not closures: closed-over arrays embed as
    # HLO constants and the 200MB program blows past upload limits.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk(acc, s0, start, tn, tf, data):
        g = density.replace(data=data)
        for u in range(steps_per_call):
            t = tn + (s0 + jnp.float32(u)) * jnp.float32(dt)
            live = t < tf
            pos = start + light_dir[None, :] * t[:, None]
            val = gridmod.sample_world(g, pos, linear=linear)
            acc = acc + jnp.where(live, val, 0.0)
        return acc

    acc = jnp.zeros((nx * ny * nz,), jnp.float32)
    for s0 in range(0, max_steps, steps_per_call):
        acc = chunk(acc, jnp.float32(s0), start, tn, tf, density.data)
        if s0 % (steps_per_call * 32) == 0:
            acc.block_until_ready()
    acc.block_until_ready()
    return (acc * jnp.float32(dt)).reshape(nz, ny, nx)
