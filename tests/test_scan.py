"""Scan-rolled launch (config.use_scan) equivalence.

The scan launch must reproduce the unrolled launch bit-for-bit: same op
sequence per micro-step, flush cadence moved into a ``lax.cond`` on the
block counter.  This is the graph used where the unrolled launch is
uncompilable (shard_map × long unrolls on XLA-CPU — BENCH.md) and is the
vehicle for the production-shaped multi-chip dryrun.
"""

import numpy as np

from cuda_volpath_tpu.config import Param, RenderSettings
from cuda_volpath_tpu.render import camera as cammod
from cuda_volpath_tpu.render import integrator
from cuda_volpath_tpu.render.scene import make_scene, materials_from_param
from cuda_volpath_tpu.lighting import envmap as envmod

import pytest


def _scene():
    n = 16
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    r2 = ((xx - c) ** 2 + (yy - c) ** 2 + (zz - c) ** 2) / (n / 3) ** 2
    vol = np.exp(-r2).astype(np.float32)
    mat = materials_from_param(Param(density=15.0, albedo=(0.9, 0.85, 0.8),
                                     sigma_t=(1.0, 0.8, 0.6), g=0.3))
    return make_scene(vol, mat, envmap=envmod.constant((0.6, 0.5, 0.4)),
                      sun_dir=(0.3, 0.9, 0.3), sun_power=(2.0, 2.0, 2.0),
                      sun_power_original=(30.0, 30.0, 30.0))


def test_scan_launch_matches_unrolled():
    """Same film from the scanned and unrolled launch graphs.

    Draw sequences and op order are identical; the scanned block is a
    different compiled artifact, so XLA's fusion/fma choices may round
    differently by ~1 ulp (measured: 2/520 film entries off by 1.19e-7).
    """
    scene = _scene()
    cam = cammod.make_camera()
    base = RenderSettings(precompute_opacity=False, steps_per_launch=8,
                          spawn_every=4, rearm_every=2, flush_every=2,
                          samples_per_item=2)
    f_unroll = integrator.render(scene, cam, base.replace(use_scan=False),
                                 8, 8, 8, pool=512)
    f_scan = integrator.render(scene, cam, base.replace(use_scan=True),
                               8, 8, 8, pool=512)
    np.testing.assert_allclose(np.asarray(f_unroll.data),
                               np.asarray(f_scan.data),
                               rtol=1e-6, atol=1e-6)


def test_scan_remainder_matches_unrolled():
    """steps_per_launch not a multiple of spawn_every: the scan launch
    unrolls the remainder sub-block with the identical cadence."""
    scene = _scene()
    cam = cammod.make_camera()
    base = RenderSettings(precompute_opacity=False, steps_per_launch=10,
                          spawn_every=4, rearm_every=2, flush_every=2,
                          samples_per_item=2)
    f_unroll = integrator.render(scene, cam, base.replace(use_scan=False),
                                 8, 8, 8, pool=512)
    f_scan = integrator.render(scene, cam, base, 8, 8, 8, pool=512)
    np.testing.assert_allclose(np.asarray(f_unroll.data),
                               np.asarray(f_scan.data),
                               rtol=1e-6, atol=1e-6)


def test_scan_nondivisible_rearm_matches_unrolled():
    """rearm_every=3 does not divide spawn_every=4: the scanned launch's
    fold passes fire on block-local indices, so its fold *schedule*
    diverges from the unrolled launch's global-index schedule — the
    rendered film must not (cadence only changes when a finished lane is
    re-armed; draws are (pixel, sample)-keyed)."""
    scene = _scene()
    cam = cammod.make_camera()
    base = RenderSettings(precompute_opacity=False, steps_per_launch=10,
                          spawn_every=4, rearm_every=3, flush_every=2,
                          samples_per_item=2)
    f_unroll = integrator.render(scene, cam, base.replace(use_scan=False),
                                 8, 8, 8, pool=512)
    f_scan = integrator.render(scene, cam, base, 8, 8, 8, pool=512)
    np.testing.assert_allclose(np.asarray(f_unroll.data),
                               np.asarray(f_scan.data),
                               rtol=1e-6, atol=1e-6)


def test_short_launch_uses_unrolled_graph():
    """steps_per_launch < spawn_every delegates to the unrolled body —
    tiny test graphs keep their pre-scan jaxprs (and compile caches)."""
    a = RenderSettings(steps_per_launch=4)           # use_scan default True
    b = RenderSettings(steps_per_launch=4, use_scan=False)
    sa, la = integrator.make_step_fn(a, 8, 8)
    import jax
    import jax.numpy as jnp
    from cuda_volpath_tpu.render import film as filmmod
    from cuda_volpath_tpu.render.scene import make_scene, \
        materials_from_param
    from cuda_volpath_tpu.config import Param
    scene = make_scene(np.ones((8, 8, 8), np.float32),
                       materials_from_param(Param(density=5.0)))
    st = integrator.init_state(64)
    film = filmmod.make_film(8, 8)
    sb, lb = integrator.make_step_fn(b, 8, 8)
    ja = la.lower(scene, cammod.make_camera(), st, film).as_text()
    jb = lb.lower(scene, cammod.make_camera(), st, film).as_text()
    assert ja == jb
