"""Eager fold/re-arm (config.eager_rearm) equivalence.

A lane whose sample completes re-arms the item's next sample inside the
micro-step, banking an escaped sample's background-dependent film row into
the pending registers (PathState.pend_*) for the next batched fold pass to
resolve.  This is pure scheduling: draws are (pixel, sample)-keyed and
each lane's film rows still accumulate in exact sample order, so the
drained film must match the batched-fold path to scatter-add-ordering fp
jitter, and stay bit-deterministic run-to-run.
"""

import numpy as np

from cuda_volpath_tpu.config import Param, RenderSettings
from cuda_volpath_tpu.render import camera as cammod
from cuda_volpath_tpu.render import film as filmmod
from cuda_volpath_tpu.render import integrator
from cuda_volpath_tpu.render.scene import make_scene, materials_from_param
from cuda_volpath_tpu.lighting import envmap as envmod

BG = (0.7, 0.5, 0.3)


def _scene(density=15.0, n=16):
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    r2 = ((xx - c) ** 2 + (yy - c) ** 2 + (zz - c) ** 2) / (n / 3) ** 2
    vol = np.exp(-r2).astype(np.float32)
    mat = materials_from_param(Param(density=density,
                                     albedo=(0.9, 0.85, 0.8),
                                     sigma_t=(1.0, 0.8, 0.6), g=0.3))
    return make_scene(vol, mat, envmap=envmod.constant(BG),
                      sun_dir=(0.3, 0.9, 0.3), sun_power=(2.0, 2.0, 2.0),
                      sun_power_original=(30.0, 30.0, 30.0))


def _films(settings, density=15.0, w=8, h=8, spp=8, pool=512):
    scene = _scene(density)
    cam = cammod.make_camera()
    out = []
    for eager in (False, True):
        f = integrator.render(scene, cam, settings.replace(
            eager_rearm=eager), w, h, spp, pool=pool)
        out.append(np.asarray(f.data))
    return out


def test_eager_matches_batched_fold():
    """Flagship-style config: eager and batched folds drain to the same
    film (same sample values; only film scatter-add order can differ)."""
    base = RenderSettings(precompute_opacity=False, steps_per_launch=8,
                          spawn_every=4, rearm_every=2, flush_every=2,
                          samples_per_item=2)
    a, b = _films(base)
    np.testing.assert_array_equal(a[:, 4], b[:, 4])  # exact sample counts
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_eager_thin_scene_slot_contention():
    """A thin medium escapes almost every sample within a couple of
    micro-steps, so pending slots churn at the maximum rate (and lanes
    with an occupied slot must wait for the fold pass) — the film must
    still match the batched path."""
    base = RenderSettings(precompute_opacity=False, steps_per_launch=8,
                          spawn_every=4, rearm_every=4, flush_every=1,
                          samples_per_item=4)
    a, b = _films(base, density=2.0, spp=8)
    np.testing.assert_array_equal(a[:, 4], b[:, 4])
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_eager_nondivisible_cadence():
    """rearm_every that does not divide spawn_every, plus a scan launch
    with a remainder sub-block — cadence edge cases around the fold
    passes that resolve pending escapes."""
    base = RenderSettings(precompute_opacity=False, steps_per_launch=10,
                          spawn_every=4, rearm_every=3, flush_every=2,
                          samples_per_item=2)
    a, b = _films(base)
    np.testing.assert_array_equal(a[:, 4], b[:, 4])
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_eager_deterministic_and_pool_invariant():
    """Bit-identical run-to-run; pool-size change alters only scatter-add
    ordering (the eager path keeps each lane's rows in sample order)."""
    scene = _scene()
    cam = cammod.make_camera()
    settings = RenderSettings(precompute_opacity=False, steps_per_launch=4,
                              eager_rearm=True)
    f1 = integrator.render(scene, cam, settings, 8, 8, 8, pool=512)
    f2 = integrator.render(scene, cam, settings, 8, 8, 8, pool=512)
    f3 = integrator.render(scene, cam, settings, 8, 8, 8, pool=2048)
    a, b, c = (np.asarray(f.data) for f in (f1, f2, f3))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)
