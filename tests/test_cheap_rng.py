"""Production RNG (config.cheap_rng — ops.rng.cheap_next).

The cheap generator replaces the reference-parity hash+xoroshiro stream
with a keyed SplitMix32 counter.  It must (a) be a sound uniform
generator, (b) keep the (pixel, sample)-keyed stream properties the
framework's determinism/invariance guarantees rest on, and (c) estimate
the same transport (identical expectation) as the parity generator.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_volpath_tpu.config import Param, RenderSettings, Tracker
from cuda_volpath_tpu.ops import rng as rngmod
from cuda_volpath_tpu.ops import aabb
from cuda_volpath_tpu.render import camera as cammod
from cuda_volpath_tpu.render import film as filmmod
from cuda_volpath_tpu.render import integrator
from cuda_volpath_tpu.render.scene import make_scene, materials_from_param
from cuda_volpath_tpu.lighting import envmap as envmod

BG = (0.7, 0.5, 0.3)


def test_cheap_next_uniformity():
    """Mean/variance/serial correlation of the keyed-SplitMix32 stream."""
    st = rngmod.cheap_init(jnp.arange(4096) % 64, jnp.arange(4096) // 64, 3)
    us = []
    for _ in range(64):
        st, raw = rngmod.cheap_next(st)
        us.append(np.asarray(rngmod.bits_to_float(raw)))
    u = np.stack(us)
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(u.var() - 1.0 / 12.0) < 2e-3
    assert (u >= 0.0).all() and (u < 1.0).all()
    lag1 = np.corrcoef(u[:-1].ravel(), u[1:].ravel())[0, 1]
    lane = np.corrcoef(u[:, :-1].ravel(), u[:, 1:].ravel())[0, 1]
    assert abs(lag1) < 0.01 and abs(lane) < 0.01


def test_cheap_streams_disjoint_across_samples():
    """Different sample indices of one pixel give unrelated draws."""
    a = rngmod.cheap_init(jnp.full((256,), 5), jnp.full((256,), 9),
                          jnp.arange(256))
    _, ra = rngmod.cheap_next(a)
    assert len(np.unique(np.asarray(ra))) == 256


def test_cheap_rng_rejects_reference_march():
    with pytest.raises(ValueError, match="parity"):
        integrator.make_step_fn(
            RenderSettings(cheap_rng=True, reference_march=True), 8, 8)


def _slab_scene():
    vol = np.ones((16, 16, 16), np.float32)
    mat = materials_from_param(Param(density=4.0, albedo=(0, 0, 0),
                                     sigma_t=(1.0, 0.6, 0.25)))
    return make_scene(vol, mat, envmap=envmod.constant(BG), quantize=False)


def test_cheap_slab_transmittance():
    """Constant slab, zero albedo: the cheap generator's estimate must hit
    the analytic transmittance — the unbiasedness gate."""
    scene = _slab_scene()
    settings = RenderSettings(tracker=Tracker.BOUNDED, sun_light=False,
                              precompute_opacity=False, steps_per_launch=4,
                              cheap_rng=True)
    w = h = 8
    spp = 96
    cam = cammod.make_camera()
    fm = integrator.render(scene, cam, settings, w, h, spp, pool=4096)
    img = np.asarray(filmmod.image(fm))

    py, px = np.mgrid[0:h, 0:w]
    o, d = cammod.generate_rays(cam, w, h, jnp.asarray(px), jnp.asarray(py))
    hit, tn, tf = aabb.intersect_box(o, d, scene.density.box_min,
                                     scene.density.box_max)
    chord = np.where(np.asarray(hit), np.asarray(tf - tn), 0.0)
    want = np.asarray(BG) * np.exp(-np.asarray((1.0, 0.6, 0.25)) * 4.0
                                   * chord[..., None])
    np.testing.assert_allclose(img, want,
                               atol=4.0 * want.max() / np.sqrt(spp), rtol=0)
    np.testing.assert_allclose(img.mean(axis=(0, 1)),
                               want.mean(axis=(0, 1)), rtol=0.05)


def _blob_scene():
    n = 24
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    r2 = ((xx - c) ** 2 + (yy - c) ** 2 + (zz - c) ** 2) / (n / 3) ** 2
    vol = np.exp(-r2).astype(np.float32)
    mat = materials_from_param(Param(density=20.0, albedo=(0.95, 0.9, 0.85),
                                     sigma_t=(1.0, 0.8, 0.6), g=0.3))
    return make_scene(vol, mat, envmap=envmod.constant(BG),
                      sun_dir=(0.3, 0.9, 0.3), sun_power=(2.0, 2.0, 2.0),
                      sun_power_original=(50.0, 50.0, 50.0))


def test_cheap_matches_parity_mean():
    """Flagship-style config (DECOMP + sun NEE): cheap and parity draws
    estimate the same image mean."""
    scene = _blob_scene()
    cam = cammod.make_camera()
    means = {}
    for cheap in (False, True):
        settings = RenderSettings(sun_light=True, precompute_opacity=False,
                                  steps_per_launch=4, cheap_rng=cheap)
        fm = integrator.render(scene, cam, settings, 10, 10, 48, pool=2048)
        means[cheap] = np.asarray(filmmod.image(fm)).mean()
    np.testing.assert_allclose(means[True], means[False], rtol=0.06)


def test_cheap_deterministic_and_pool_invariant():
    """(pixel, sample)-keyed streams hold for the cheap generator too:
    films are bit-identical across runs and pool sizes."""
    scene = _slab_scene()
    cam = cammod.make_camera()
    settings = RenderSettings(tracker=Tracker.BOUNDED, sun_light=False,
                              precompute_opacity=False, steps_per_launch=4,
                              cheap_rng=True)
    films = [integrator.render(scene, cam, settings, 8, 8, 8, pool=p)
             for p in (512, 512, 2048)]
    a = np.asarray(films[0].data)
    for f in films[1:]:
        np.testing.assert_array_equal(a, np.asarray(f.data))
