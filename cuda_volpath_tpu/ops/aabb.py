"""Ray/AABB slab intersection and supervoxel segment setup.

Re-implements the reference's intersection helpers as whole-wavefront ops:

* ``intersect_box`` — the classic slab test (reference
  src/volumeRender_kernel.cu:654-680 ``intersectBox``).
* ``intersect_supervolume`` — the tracking-restart segment clamp used by the
  bounded/decomposition kernels: the segment never exceeds ``search_radius``
  along the ray, and the local density bounds are fetched at the entry point
  (reference src/volumeRender_kernel.cu:1626-1661 ``intersectSuperVolume``).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import vecmath as vm


def intersect_box(o: jnp.ndarray, d: jnp.ndarray, box_min, box_max,
                  clamp_near: bool = True):
    """Slab test for rays ``(o, d)`` of shape ``(..., 3)``.

    Returns ``(hit, t_near, t_far)``.  ``t_near`` is clamped to 0 when
    ``clamp_near`` (both reference variants clamp; ``intersect_box`` at
    kernel.cu:478 clamps in place, ``intersectBox`` leaves it to callers at
    kernel.cu:730/773 — every call site clamps, so we default to True).
    ``hit`` is ``t_far > t_near_raw and t_far >= 1e-3`` exactly as
    kernel.cu:679.
    """
    inv_d = 1.0 / d
    tbot = inv_d * (jnp.asarray(box_min, jnp.float32) - o)
    ttop = inv_d * (jnp.asarray(box_max, jnp.float32) - o)
    tmin = jnp.minimum(ttop, tbot)
    tmax = jnp.maximum(ttop, tbot)
    largest_tmin = vm.max_of(tmin)
    smallest_tmax = vm.min_of(tmax)
    hit = (smallest_tmax > largest_tmin) & (smallest_tmax >= 1e-3)
    t_near = jnp.maximum(largest_tmin, 0.0) if clamp_near else largest_tmin
    return hit, t_near, smallest_tmax


def intersect_supervolume(o: jnp.ndarray, d: jnp.ndarray, box_min, box_max,
                          search_radius: float):
    """Segment setup for tracking restart (kernel.cu:1626-1661).

    Returns ``(hit, t_near, t_far)`` where ``t_near = max(largest_tmin, 0)``
    and ``t_far = min(smallest_tmax, search_radius)`` — the caller advances
    the ray origin by ``t_far`` on a restart, so distances are relative to
    the current origin and each segment covers at most ``search_radius``.

    The local (d_min, d_max) bound fetch at the entry point is done by the
    caller (it needs the bound grid); this function only does ray math.
    """
    inv_d = 1.0 / d
    tbot = inv_d * (jnp.asarray(box_min, jnp.float32) - o)
    ttop = inv_d * (jnp.asarray(box_max, jnp.float32) - o)
    tmin = jnp.minimum(ttop, tbot)
    tmax = jnp.maximum(ttop, tbot)
    largest_tmin = vm.max_of(tmin)
    smallest_tmax = vm.min_of(tmax)
    hit = (smallest_tmax > largest_tmin) & (smallest_tmax >= 1e-3)
    t_near = jnp.maximum(largest_tmin, 0.0)
    t_far = jnp.minimum(smallest_tmax, jnp.float32(search_radius))
    return hit, t_near, t_far
