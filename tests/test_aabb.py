"""Ray/AABB slab test and supervoxel segment semantics."""

import numpy as np
import jax.numpy as jnp

from cuda_volpath_tpu.ops import aabb


BMIN = (-1.0, -0.5, -0.5)
BMAX = (1.0, 0.5, 0.5)


def _one(o, d, clamp=True):
    hit, tn, tf = aabb.intersect_box(jnp.asarray([o], jnp.float32),
                                     jnp.asarray([d], jnp.float32),
                                     BMIN, BMAX, clamp_near=clamp)
    return bool(hit[0]), float(tn[0]), float(tf[0])


def test_hit_from_outside():
    hit, tn, tf = _one([-3, 0, 0], [1, 0, 0])
    assert hit and np.isclose(tn, 2.0) and np.isclose(tf, 4.0)


def test_miss():
    hit, _, _ = _one([-3, 2, 0], [1, 0, 0])
    assert not hit


def test_origin_inside_clamps_near():
    hit, tn, tf = _one([0, 0, 0], [0, 0, 1])
    assert hit and tn == 0.0 and np.isclose(tf, 0.5)


def test_behind_box_rejected():
    # Box entirely behind the ray: t_far < 1e-3 → miss (kernel.cu:679).
    hit, _, _ = _one([3, 0, 0], [1, 0, 0])
    assert not hit


def test_supervolume_clamps_to_search_radius():
    o = jnp.asarray([[-3.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    hit, tn, tf = aabb.intersect_supervolume(o, d, BMIN, BMAX, 0.05)
    # t_near = 2 but t_far = min(4, 0.05) = 0.05 < t_near: segment is empty,
    # yet hit remains true (the reference marches dist from t_near and
    # immediately exceeds t_far → tracking restart advances by t_far).
    assert bool(hit[0])
    assert np.isclose(float(tn[0]), 2.0)
    assert np.isclose(float(tf[0]), 0.05)


def test_supervolume_inside():
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    hit, tn, tf = aabb.intersect_supervolume(o, d, BMIN, BMAX, 0.05)
    assert bool(hit[0]) and float(tn[0]) == 0.0 and np.isclose(float(tf[0]), 0.05)


def test_axis_parallel_ray_infinities():
    # Direction with zero components must not produce NaNs in the result.
    hit, tn, tf = _one([-3, 0.2, 0.1], [1, 0, 0])
    assert hit and np.isfinite(tn) and np.isfinite(tf)
