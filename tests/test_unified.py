"""Unified march/setup pass (config.unified_march).

The unified structure serves segment setup and marching from ONE pool-wide
gather per pass (a fused row table built in-graph) instead of the legacy
structure's separate bound + density gathers.  Per-lane draw sequences and
arithmetic are bit-identical by construction — only fetch *timing* moves —
so a drained render must match the legacy structure exactly, bit for bit.
That is the assertion here, across trackers and with the baked-opacity
NEE shortcut in play.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_volpath_tpu.config import Param, RenderSettings, Tracker
from cuda_volpath_tpu.render import camera as cammod
from cuda_volpath_tpu.render import integrator
from cuda_volpath_tpu.render.scene import make_scene, materials_from_param
from cuda_volpath_tpu.lighting import envmap as envmod


def _blob(n=20):
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    r2 = ((xx - c) ** 2 + (yy - 0.8 * c) ** 2 + (zz - c) ** 2) / (n / 3) ** 2
    return np.exp(-r2).astype(np.float32)


def _scene(with_od=True, quantize=True):
    vol = _blob()
    mat = materials_from_param(Param(density=20.0, albedo=(0.95, 0.9, 0.85),
                                     sigma_t=(1.0, 0.8, 0.6), g=0.3))
    # a synthetic (smooth, positive) sun optical-depth cache so the
    # deep-scatter NEE shortcut path is live in both structures
    od = 0.02 * (vol[::-1] + 0.5) if with_od else None
    return make_scene(vol, mat, envmap=envmod.constant((0.5, 0.4, 0.3)),
                      sun_dir=(0.3, 0.9, 0.2), sun_power=(3.0, 3.0, 3.0),
                      sun_power_original=(40.0, 40.0, 40.0),
                      quantize=quantize, opacity=od)


def _render(scene, settings, w=10, h=10, spp=24, pool=2048):
    cam = cammod.make_camera()
    # tail_taper off: the bit-identity rate below is calibrated for the
    # plain one-phase schedule (the taper's extra 1-sample flush batches
    # add more fp accumulation-order noise between the two structures,
    # which is not what this test measures — taper equivalence is covered
    # in tests/test_integrator.py)
    fm = integrator.render(scene, cam, settings, w, h, spp, pool=pool,
                           tail_taper=False)
    return np.asarray(fm.data)


@pytest.mark.parametrize("tracker", [Tracker.DECOMP, Tracker.DELTA])
def test_unified_matches_legacy(tracker):
    """Same draws, same arithmetic — but XLA is free to fuse the two
    graphs differently (e.g. FMA contraction), so isolated values can
    land 1 ulp apart (measured: 1/808 elements, 1e-7 relative, on
    XLA-CPU).  Assert sample counts match exactly, nearly every film row
    is bit-identical, and everything is within fp-fusion tolerance — a
    logic/draw-order divergence corrupts whole samples and fails all
    three."""
    scene = _scene()
    base = dict(tracker=tracker, sun_light=True, precompute_opacity=True,
                steps_per_launch=4)
    legacy = _render(scene, RenderSettings(unified_march=False, **base))
    unified = _render(scene, RenderSettings(unified_march=True, **base))
    np.testing.assert_array_equal(legacy[:, 4], unified[:, 4])  # counts
    same = np.all(legacy == unified, axis=1).mean()
    assert same >= 0.9, f"only {same:.1%} of film rows bit-identical"
    # a 1-ulp fusion difference can at worst flip an event comparison and
    # re-draw isolated samples (caught above if widespread); a wrong
    # weight anywhere shifts every row and fails here
    np.testing.assert_allclose(legacy.mean(axis=0), unified.mean(axis=0),
                               rtol=0.05, atol=1e-6)


def test_unified_requires_fused_scene():
    scene = _scene(with_od=False, quantize=False)
    settings = RenderSettings(unified_march=True, steps_per_launch=4,
                              precompute_opacity=False)
    with pytest.raises(ValueError, match="unified_march"):
        _render(scene, settings, spp=1, pool=256)
