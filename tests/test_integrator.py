"""Integrator correctness: analytic transmittance, tracker equivalence,
determinism, and pool-size invariance.

Mirrors the validation the reference only does implicitly (its three
kernels are kept side-by-side so unbiased variants can be compared by eye,
SURVEY.md §4) — here they are statistical assertions.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_volpath_tpu.config import (Param, RenderSettings, Tracker,
                                     EnvmapMode, SpectralMode, ShadowMode)
from cuda_volpath_tpu.render import camera as cammod
from cuda_volpath_tpu.render import film as filmmod
from cuda_volpath_tpu.render import integrator
from cuda_volpath_tpu.render.scene import make_scene, materials_from_param
from cuda_volpath_tpu.lighting import envmap as envmod
from cuda_volpath_tpu.ops import aabb


BG = (0.7, 0.5, 0.3)


def _blob_volume(n=24):
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    r2 = ((xx - c) ** 2 + (yy - c) ** 2 + (zz - c) ** 2) / (n / 3) ** 2
    return np.exp(-r2).astype(np.float32)


def _render(scene, settings, w=12, h=12, spp=32, pool=2048):
    cam = cammod.make_camera()
    return integrator.render(scene, cam, settings, w, h, spp, pool=pool)


@pytest.mark.parametrize("tracker", [Tracker.DELTA, Tracker.BOUNDED])
def test_constant_slab_transmittance(tracker):
    """Constant density, zero albedo: pixel mean must equal
    bg * exp(-sigma_t_c * density * chord_length) per channel.

    DECOMP is excluded by design: analog decomposition tracking treats
    control collisions as unit-weight scatters (kernel.cu:2047-2059), with
    signed residual weights correcting the difference — at albedo 0 the
    control/residual cancellation makes the variance explode, so the
    estimator only converges usefully in the high-albedo regime the
    reference runs it in (see test_trackers_agree for that regime).
    """
    density = 4.0
    sigma_t = (1.0, 0.6, 0.25)
    vol = np.ones((16, 16, 16), np.float32)
    mat = materials_from_param(Param(density=density, albedo=(0, 0, 0),
                                     sigma_t=sigma_t, g=0.0))
    scene = make_scene(vol, mat, envmap=envmod.constant(BG), quantize=False)
    settings = RenderSettings(tracker=tracker, sun_light=False,
                              precompute_opacity=False, steps_per_launch=4)
    w = h = 8
    spp = 96
    fm = _render(scene, settings, w, h, spp, pool=4096)
    img = np.asarray(filmmod.image(fm))

    cam = cammod.make_camera()
    py, px = np.mgrid[0:h, 0:w]
    o, d = cammod.generate_rays(cam, w, h, jnp.asarray(px), jnp.asarray(py))
    hit, tn, tf = aabb.intersect_box(o, d, scene.density.box_min,
                                     scene.density.box_max)
    chord = np.where(np.asarray(hit), np.asarray(tf - tn), 0.0)
    want = np.asarray(BG) * np.exp(-np.asarray(sigma_t) * density
                                   * chord[..., None])
    # Monte-Carlo tolerance: binomial-ish; pool 96 spp
    np.testing.assert_allclose(img, want, atol=4.0 * want.max()
                               / np.sqrt(spp), rtol=0)
    # tighter mean-level check
    np.testing.assert_allclose(img.mean(axis=(0, 1)), want.mean(axis=(0, 1)),
                               rtol=0.05)


@pytest.mark.parametrize("quantize", [False, True])
def test_trackers_agree(quantize):
    """DELTA / BOUNDED / DECOMP are unbiased estimators of the same
    transport — image means must agree (kernel.cu keeps all three for this
    cross-check, :2364-2370)."""
    vol = _blob_volume()
    mat = materials_from_param(Param(density=20.0, albedo=(0.95, 0.9, 0.85),
                                     sigma_t=(1.0, 0.8, 0.6), g=0.3))
    settings = dict(sun_light=True, precompute_opacity=False,
                    steps_per_launch=4)
    means = {}
    for tr in [Tracker.DELTA, Tracker.BOUNDED, Tracker.DECOMP]:
        scene = make_scene(vol, mat, envmap=envmod.constant(BG),
                           sun_dir=(0.3, 0.9, 0.3), sun_power=(2.0, 2.0, 2.0),
                           sun_power_original=(50.0, 50.0, 50.0),
                           quantize=quantize)
        fm = _render(scene, RenderSettings(tracker=tr, **settings),
                     w=10, h=10, spp=48, pool=2048)
        means[tr] = np.asarray(filmmod.image(fm)).mean()
    vals = list(means.values())
    for v in vals[1:]:
        np.testing.assert_allclose(v, vals[0], rtol=0.06)


def test_shadow_modes_agree():
    """BINARY (the reference's Tr_spectral, kernel.cu:754-808) and RATIO
    (its expected-value refinement) are unbiased estimators of the same
    shadow transmittance — sun-lit image means must agree."""
    vol = _blob_volume()
    mat = materials_from_param(Param(density=25.0, albedo=(0.95, 0.9, 0.85),
                                     sigma_t=(1.0, 0.8, 0.6), g=0.3))
    scene = make_scene(vol, mat, envmap=envmod.constant((0.0, 0.0, 0.0)),
                       sun_dir=(0.3, 0.9, 0.3), sun_power=(4.0, 4.0, 4.0),
                       sun_power_original=(50.0, 50.0, 50.0))
    means = {}
    for mode in [ShadowMode.RATIO, ShadowMode.BINARY]:
        settings = RenderSettings(shadow_mode=mode, sun_light=True,
                                  precompute_opacity=False,
                                  steps_per_launch=4)
        fm = _render(scene, settings, w=10, h=10, spp=64, pool=2048)
        means[mode] = np.asarray(filmmod.image(fm)).mean()
    np.testing.assert_allclose(means[ShadowMode.BINARY],
                               means[ShadowMode.RATIO], rtol=0.08)


def test_deterministic_and_pool_invariant():
    """Same film bit-for-bit across runs AND across pool sizes — the
    consequence of (pixel, sample)-keyed RNG streams."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=10.0, g=0.5))
    scene = make_scene(vol, mat, envmap=envmod.constant(BG),
                       sun_dir=(0.0, 1.0, 0.0), sun_power=(1.0, 1.0, 1.0),
                       sun_power_original=(10.0, 10.0, 10.0))
    settings = RenderSettings(precompute_opacity=False, steps_per_launch=4)
    f1 = _render(scene, settings, w=8, h=8, spp=4, pool=256)
    f2 = _render(scene, settings, w=8, h=8, spp=4, pool=256)
    f3 = _render(scene, settings, w=8, h=8, spp=4, pool=1024)
    a, b, c = (np.asarray(filmmod.image(f)) for f in (f1, f2, f3))
    np.testing.assert_array_equal(a, b)
    # pool-size change alters only scatter-add ordering => tiny fp jitter
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)


def test_pixel_order_invariant():
    """A permuted work queue (integrator.heat_order's mechanism) is pure
    scheduling: RNG streams are (pixel, sample)-keyed, so the same sample
    set is rendered in a different order — per-pixel counts/heat match
    exactly and radiance sums to fp-addition-order jitter."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=10.0, g=0.5))
    scene = make_scene(vol, mat, envmap=envmod.constant(BG),
                       sun_dir=(0.0, 1.0, 0.0), sun_power=(1.0, 1.0, 1.0),
                       sun_power_original=(10.0, 10.0, 10.0))
    settings = RenderSettings(precompute_opacity=False, steps_per_launch=4)
    w = h = 8
    rng = np.random.default_rng(7)
    perm = rng.permutation(w * h).astype(np.int32)
    f_id = _render(scene, settings, w=w, h=h, spp=16, pool=256)
    cam = cammod.make_camera()
    f_pm = integrator.render(scene, cam, settings, w, h, 16, pool=256,
                             pixel_order=perm)
    np.testing.assert_array_equal(np.asarray(f_id.data[:, 4]),
                                  np.asarray(f_pm.data[:, 4]))
    np.testing.assert_allclose(np.asarray(f_id.data), np.asarray(f_pm.data),
                               rtol=1e-5, atol=1e-6)
    # heat_order on a finished film is a valid permutation
    order = integrator.heat_order(f_id)
    assert sorted(order.tolist()) == list(range(w * h))
    # the drain-free two-phase mode (phase-2 queue installed under the
    # phase-1 stragglers) renders the same sample set too
    f_ho = integrator.render(scene, cam, settings, w, h, 16, pool=256,
                             heat_ordered=True)
    np.testing.assert_array_equal(np.asarray(f_id.data[:, 4]),
                                  np.asarray(f_ho.data[:, 4]))
    np.testing.assert_allclose(np.asarray(f_id.data), np.asarray(f_ho.data),
                               rtol=1e-5, atol=1e-6)
    # tile-granular ordering: a valid permutation, raster order preserved
    # within each tile (spawn-order gather locality), same rendered film
    ot = np.asarray(integrator.heat_order(f_id, tile=4))
    assert sorted(ot.tolist()) == list(range(w * h))
    tid = (ot // w // 4) * 2 + (ot % w) // 4
    for t in np.unique(tid):
        ps = ot[tid == t]
        assert (np.diff(ps) > 0).all()  # raster order within the tile
    f_ht = integrator.render(scene, cam, settings, w, h, 16, pool=256,
                             heat_ordered=True, heat_tile=4)
    np.testing.assert_array_equal(np.asarray(f_id.data[:, 4]),
                                  np.asarray(f_ht.data[:, 4]))
    np.testing.assert_allclose(np.asarray(f_id.data), np.asarray(f_ht.data),
                               rtol=1e-5, atol=1e-6)
    # heat_tile only shapes the heat permutation — passing it without
    # heat_ordered would silently render un-ordered, so it raises instead
    with pytest.raises(ValueError, match="heat_tile"):
        integrator.render(scene, cam, settings, w, h, 16, pool=256,
                          heat_tile=4)


def test_multi_sample_items_equivalent():
    """``samples_per_item`` K>1 folds K consecutive samples of one pixel
    into per-lane accumulator registers before the film scatter-add — the
    per-lane RNG streams are (pixel, sample)-keyed, so the result must be
    draw-for-draw identical to one-sample items (up to scatter-add
    ordering), including when spp does not divide K and across pools."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=20.0, albedo=(0.9, 0.8, 0.7),
                                     g=0.3))
    scene = make_scene(vol, mat, sun_dir=(0.3, 0.9, 0.3),
                       sun_power=(2.0, 2.0, 2.0),
                       sun_power_original=(50.0, 50.0, 50.0))
    base = dict(precompute_opacity=False, steps_per_launch=4)
    f1 = _render(scene, RenderSettings(**base), w=8, h=8, spp=12, pool=256)
    f2 = _render(scene, RenderSettings(samples_per_item=4, flush_every=2,
                                       **base), w=8, h=8, spp=12, pool=256)
    f3 = _render(scene, RenderSettings(samples_per_item=4, flush_every=2,
                                       **base), w=8, h=8, spp=12, pool=64)
    # K=5 does not divide spp=12: the last item is clipped by spp_limit
    f4 = _render(scene, RenderSettings(samples_per_item=5, **base),
                 w=8, h=8, spp=12, pool=256)
    for f in (f1, f2, f3, f4):
        assert (np.asarray(filmmod.spp(f)) == 12).all()
    a, b, c, d = (np.asarray(filmmod.image(f)) for f in (f1, f2, f3, f4))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(c, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d, a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(filmmod.variance(f2)),
                               np.asarray(filmmod.variance(f1)),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(filmmod.heat(f2)),
                                  np.asarray(filmmod.heat(f1)))


def test_tail_taper_equivalent_and_shares_graph():
    """``render(tail_taper=True)`` re-issues the last item generation as
    1-sample items (the drain tail shrinks ~K×); the sample set and every
    (pixel, sample)-keyed draw are unchanged, so films match a no-taper
    render up to scatter-add ordering and heat matches exactly.  Item
    size is a traced register (``PathState.k_queue``), so every
    samples_per_item shares ONE jit wrapper — K sweeps and the taper cost
    zero recompiles."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=20.0, albedo=(0.9, 0.8, 0.7),
                                     g=0.3))
    scene = make_scene(vol, mat, sun_dir=(0.3, 0.9, 0.3),
                       sun_power=(2.0, 2.0, 2.0),
                       sun_power_original=(50.0, 50.0, 50.0))
    base = dict(precompute_opacity=False, steps_per_launch=4)
    s4 = RenderSettings(samples_per_item=4, **base)
    cam = cammod.make_camera()
    f_no = integrator.render(scene, cam, s4, 8, 8, 10, pool=256,
                             tail_taper=False)
    f_tp = integrator.render(scene, cam, s4, 8, 8, 10, pool=256,
                             tail_taper=True)
    # heat-ordered two-phase + taper compose (phase list)
    f_ht = integrator.render(scene, cam, s4, 8, 8, 10, pool=256,
                             heat_ordered=True, tail_taper=True)
    for f in (f_tp, f_ht):
        assert (np.asarray(filmmod.spp(f)) == 10).all()
        np.testing.assert_array_equal(np.asarray(filmmod.heat(f)),
                                      np.asarray(filmmod.heat(f_no)))
        np.testing.assert_allclose(np.asarray(filmmod.image(f)),
                                   np.asarray(filmmod.image(f_no)),
                                   rtol=1e-5, atol=1e-6)
    # one shared compiled graph across item sizes
    s1 = RenderSettings(samples_per_item=1, **base)
    assert integrator.make_step_fn(s1, 8, 8)[1] \
        is integrator.make_step_fn(s4, 8, 8)[1]


def test_sample_offset_partition_merges_exactly():
    """Disjoint absolute sample ranges (integrator.render's sample_offset)
    drawn by independent renders are the same sample set one render draws —
    the zero-communication multi-host workflow.  Merged film == single
    film up to accumulation order; heat sums exactly."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=20.0, albedo=(0.9, 0.8, 0.7),
                                     g=0.3))
    scene = make_scene(vol, mat, sun_dir=(0.3, 0.9, 0.3),
                       sun_power=(2.0, 2.0, 2.0),
                       sun_power_original=(50.0, 50.0, 50.0))
    s = RenderSettings(precompute_opacity=False, steps_per_launch=4,
                       samples_per_item=4)
    w = h = 8
    f_all = _render(scene, s, w=w, h=h, spp=8, pool=256)
    fa = integrator.render(scene, cammod.make_camera(), s, w, h, 4,
                           pool=256, sample_offset=0)
    fb = integrator.render(scene, cammod.make_camera(), s, w, h, 4,
                           pool=256, sample_offset=4)
    merged = filmmod.merge([fa, fb])
    assert (np.asarray(filmmod.spp(merged)) == 8).all()
    np.testing.assert_array_equal(np.asarray(filmmod.heat(merged)),
                                  np.asarray(filmmod.heat(f_all)))
    np.testing.assert_allclose(np.asarray(filmmod.image(merged)),
                               np.asarray(filmmod.image(f_all)),
                               rtol=1e-5, atol=1e-6)
    # misaligned offsets are rejected (items are K-sample blocks)
    with pytest.raises(ValueError):
        integrator.render(scene, cammod.make_camera(), s, w, h, 4,
                          pool=256, sample_offset=2)


def test_instrumented_launch_counts():
    """config.instrument adds a (steps, 7) occupancy output whose rows
    partition the pool, without changing the render."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=20.0, g=0.3))
    scene = make_scene(vol, mat, sun_dir=(0.3, 0.9, 0.3),
                       sun_power=(2.0, 2.0, 2.0),
                       sun_power_original=(50.0, 50.0, 50.0))
    pool, w, h = 128, 8, 8
    base = dict(precompute_opacity=False, steps_per_launch=8)
    import jax.numpy as jnp
    from cuda_volpath_tpu.render.integrator import init_state, make_step_fn

    cam = cammod.make_camera()

    def run(settings):
        _, launch = make_step_fn(settings, w, h)
        st = init_state(pool)
        st = st.replace(total_items=jnp.full((1,), w * h, jnp.int32))
        film = filmmod.make_film(w, h)
        return launch(scene, cam, st, film)

    st, film, stats = run(RenderSettings(instrument=True, **base))
    assert stats.shape == (8, 7)
    assert (np.asarray(stats).sum(axis=1) == pool).all()
    st2, film2 = run(RenderSettings(**base))
    np.testing.assert_array_equal(np.asarray(film.sum),
                                  np.asarray(film2.sum))
    with pytest.raises(ValueError):
        integrator.render(scene, cammod.make_camera(),
                          RenderSettings(instrument=True, **base),
                          w, h, 1, pool=pool)


def test_rearm_cadence_equivalent():
    """The light fold/re-arm pass (config.rearm_every < spawn_every) only
    changes *when* a finished sample re-arms, never any (pixel,
    sample)-keyed draw — films must match bit-for-bit up to scatter-add
    ordering, heat exactly."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=20.0, albedo=(0.9, 0.8, 0.7),
                                     g=0.3))
    scene = make_scene(vol, mat, sun_dir=(0.3, 0.9, 0.3),
                       sun_power=(2.0, 2.0, 2.0),
                       sun_power_original=(50.0, 50.0, 50.0))
    base = dict(precompute_opacity=False, steps_per_launch=8,
                spawn_every=4, samples_per_item=4, flush_every=2)
    f1 = _render(scene, RenderSettings(**base), w=8, h=8, spp=8, pool=256)
    f2 = _render(scene, RenderSettings(rearm_every=1, **base),
                 w=8, h=8, spp=8, pool=256)
    assert (np.asarray(filmmod.spp(f2)) == 8).all()
    np.testing.assert_array_equal(np.asarray(filmmod.heat(f2)),
                                  np.asarray(filmmod.heat(f1)))
    np.testing.assert_allclose(np.asarray(filmmod.image(f2)),
                               np.asarray(filmmod.image(f1)),
                               rtol=1e-5, atol=1e-6)


def test_packed_opacity_fetch_equivalent():
    """The fused [density, od₂₄] row table (scene.packed) must reproduce
    the separate-fetch path: identical draws (heat/count bit-equal) and
    radiance equal up to the 24-bit optical-depth quantization — exercised
    through the deep-scatter NEE shortcut (sample>10 & scatters>20,
    kernel.cu:2181-2196), which needs a dense, high-albedo medium and
    spp > 10."""
    from cuda_volpath_tpu.volume import opacity as opacitymod
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=300.0, albedo=(1.0, 1.0, 1.0),
                                     g=0.3, sigma_t=(1.0, 0.8, 0.6)))
    sun_dir = (0.3, 0.9, 0.3)
    scene = make_scene(vol, mat, envmap=envmod.constant(BG),
                       sun_dir=sun_dir, sun_power=(2.0, 2.0, 2.0),
                       sun_power_original=(50.0, 50.0, 50.0))
    od = np.asarray(opacitymod.bake(scene.density, sun_dir, dt=0.01))
    from cuda_volpath_tpu.render.scene import pack_density_opacity
    from cuda_volpath_tpu.ops import grid as gridmod
    scene = pack_density_opacity(scene, od)
    assert scene.packed is not None and float(scene.od_scale) > 0
    settings = RenderSettings(steps_per_launch=4, max_depth=64)
    f_packed = _render(scene, settings, w=8, h=8, spp=16, pool=256)
    # separate-fetch baseline: no packed table, full-res f32 opacity grid
    bare = scene.replace(packed=None, od_scale=None,
                         opacity=gridmod.Grid3D(
                             data=jnp.asarray(od),
                             box_min=scene.density.box_min,
                             box_max=scene.density.box_max))
    f_bare = _render(bare, settings, w=8, h=8, spp=16, pool=256)
    # draws are unaffected by the od value — scatter counts bit-equal
    np.testing.assert_array_equal(np.asarray(filmmod.heat(f_packed)),
                                  np.asarray(filmmod.heat(f_bare)))
    np.testing.assert_array_equal(np.asarray(filmmod.spp(f_packed)),
                                  np.asarray(filmmod.spp(f_bare)))
    a = np.asarray(filmmod.image(f_packed))
    b = np.asarray(filmmod.image(f_bare))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    # the shortcut must actually have fired for the test to mean anything
    assert np.asarray(filmmod.heat(f_packed)).max() > 20


def test_opacity_shortcut_requires_real_cache():
    """With precompute_opacity=True but NO baked cache, the deep-scatter
    NEE shortcut must not fire (it would add the full unshadowed sun term
    while skipping the real shadow march).  Gated correctly, the render is
    bit-identical to precompute_opacity=False."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=300.0, albedo=(1.0, 1.0, 1.0),
                                     g=0.3))
    scene = make_scene(vol, mat, envmod.constant(BG),
                       sun_dir=(0.3, 0.9, 0.3), sun_power=(2.0, 2.0, 2.0),
                       sun_power_original=(50.0, 50.0, 50.0))
    assert scene.packed is not None and float(scene.od_scale) == 0.0
    base = dict(steps_per_launch=4, max_depth=64)
    f_on = _render(scene, RenderSettings(precompute_opacity=True, **base),
                   w=8, h=8, spp=16, pool=256)
    f_off = _render(scene, RenderSettings(precompute_opacity=False, **base),
                    w=8, h=8, spp=16, pool=256)
    assert np.asarray(filmmod.heat(f_on)).max() > 20  # deep lanes exist
    np.testing.assert_array_equal(np.asarray(filmmod.heat(f_on)),
                                  np.asarray(filmmod.heat(f_off)))
    np.testing.assert_allclose(np.asarray(filmmod.image(f_on)),
                               np.asarray(filmmod.image(f_off)),
                               rtol=1e-6, atol=1e-7)


def test_state_bf16_close_to_f32():
    """bf16 radiometric-state storage (config.state_bf16) rounds only the
    between-step stores (~0.4% relative per event update) — a short render
    must stay within a few percent of the f32 pipeline, not just finite."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=15.0, albedo=(0.9, 0.8, 0.7),
                                     g=0.3))
    scene = make_scene(vol, mat, envmap=envmod.constant(BG),
                       sun_dir=(0.3, 0.9, 0.3), sun_power=(2.0, 2.0, 2.0),
                       sun_power_original=(50.0, 50.0, 50.0))
    base = dict(precompute_opacity=False, steps_per_launch=4)
    f32 = _render(scene, RenderSettings(**base), w=8, h=8, spp=16, pool=256)
    b16 = _render(scene, RenderSettings(state_bf16=True, **base),
                  w=8, h=8, spp=16, pool=256)
    a = np.asarray(filmmod.image(f32))
    b = np.asarray(filmmod.image(b16))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b.mean(axis=(0, 1)), a.mean(axis=(0, 1)),
                               rtol=0.05)


def _mean_and_sem(film):
    """Per-channel grand mean and its standard error from the film's
    variance lanes: Var(mean) = Σ_i var_i / (npix² · spp)."""
    img = np.asarray(filmmod.image(film))
    var = np.asarray(filmmod.variance(film))
    spp = np.asarray(filmmod.spp(film))[..., None]
    npix = img.shape[0] * img.shape[1]
    sem = np.sqrt((var / np.maximum(spp, 1)).sum(axis=(0, 1))) / npix
    return img.mean(axis=(0, 1)), sem


def _assert_means_agree(fa, fb, k=4.0, max_rel_sem=0.05):
    """|Δmean| must be within k·σ of the combined Monte-Carlo error, and
    the error itself must be small enough for the test to have power —
    this fails on a ~2-3% estimator bias where a loose rtol would not."""
    a, sa = _mean_and_sem(fa)
    b, sb = _mean_and_sem(fb)
    tol = k * np.sqrt(sa * sa + sb * sb)
    assert (tol < max_rel_sem * np.abs(a) + 1e-7).all(), (
        f"test underpowered: sem {tol} vs means {a} — raise spp")
    assert (np.abs(a - b) <= tol).all(), (
        f"means differ beyond {k}σ: {a} vs {b}, tol {tol}")


def test_multi_channel_matches_spectral_mean():
    """One-wavelength-per-sample mode (MULTI_CHANNEL, kernel.cu:1319-1321,
    1583-1586) is an unbiased single-channel estimator of the same
    transport — per-channel means must match the spectral tracker within
    Monte-Carlo error (variance-scaled, not a loose rtol)."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=15.0, albedo=(0.9, 0.8, 0.7),
                                     sigma_t=(1.0, 0.7, 0.4), g=0.3))
    scene = make_scene(vol, mat, envmap=envmod.constant(BG),
                       sun_dir=(0.3, 0.9, 0.3), sun_power=(2.0, 2.0, 2.0),
                       sun_power_original=(50.0, 50.0, 50.0))
    base = dict(precompute_opacity=False, steps_per_launch=4)
    # spp is queue length, not graph shape — raising it costs runtime only
    f_sp = _render(scene, RenderSettings(**base), w=8, h=8, spp=768,
                   pool=2048)
    f_mc = _render(scene, RenderSettings(
        spectral=SpectralMode.MULTI_CHANNEL, **base),
        w=8, h=8, spp=2304, pool=2048)
    _assert_means_agree(f_sp, f_mc, max_rel_sem=0.12)


def test_mono_is_achromatic_spectral():
    """MONO ignores Param.sigma_t (kernel.cu:1328) — it must equal SPECTRAL
    run with sigma_t = 1 (same draws, same weights; tolerance covers
    rounding differences between the two compiled graphs)."""
    vol = _blob_volume(16)
    base = dict(precompute_opacity=False, steps_per_launch=4,
                sun_light=False)
    mat_chroma = materials_from_param(Param(density=10.0, g=0.2,
                                            sigma_t=(1.0, 0.5, 0.25)))
    scene = make_scene(vol, mat_chroma, envmap=envmod.constant(BG))
    f_mono = _render(scene, RenderSettings(
        spectral=SpectralMode.MONO, **base), w=8, h=8, spp=8, pool=512)
    mat_achroma = materials_from_param(Param(density=10.0, g=0.2,
                                             sigma_t=(1.0, 1.0, 1.0)))
    scene2 = make_scene(vol, mat_achroma, envmod.constant(BG))
    f_sp = _render(scene2, RenderSettings(**base), w=8, h=8, spp=8, pool=512)
    np.testing.assert_allclose(np.asarray(filmmod.image(f_mono)),
                               np.asarray(filmmod.image(f_sp)),
                               rtol=1e-5, atol=1e-6)


def test_mis_matches_passive_mean():
    """The one-sample-MIS envmap branch (kernel.cu:2220-2297) and the
    passive estimator target the same integral — means agree on an
    envmap-lit scene."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=12.0, albedo=(0.9, 0.85, 0.8),
                                     g=0.4))
    # gradient envmap so CDF sampling is non-trivial
    h, w = 16, 32
    img = np.linspace(0.05, 1.5, h)[:, None, None] * \
        np.array([1.0, 0.8, 0.6])[None, None, :]
    env = envmod.build(np.broadcast_to(img, (h, w, 3)))
    scene = make_scene(vol, mat, envmap=env)
    base = dict(sun_light=False, precompute_opacity=False,
                steps_per_launch=4)
    f_p = _render(scene, RenderSettings(**base), w=8, h=8, spp=768,
                  pool=2048)
    f_m = _render(scene, RenderSettings(
        envmap_mode=EnvmapMode.MIS, **base), w=8, h=8, spp=768, pool=2048)
    # variance-scaled: would fail on a single-percent estimator bias
    _assert_means_agree(f_p, f_m)


def test_heat_channel_and_counts():
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=10.0))
    scene = make_scene(vol, mat, envmap=envmod.constant(BG))
    settings = RenderSettings(sun_light=False, precompute_opacity=False,
                              steps_per_launch=4)
    fm = _render(scene, settings, w=8, h=8, spp=3, pool=512)
    assert np.asarray(filmmod.spp(fm)).min() == 3
    ht = np.asarray(filmmod.heat(fm))
    assert ht.min() >= 0 and np.isfinite(ht).all()


def test_work_queue_overflow_guard():
    """npix*spp beyond int32 must raise, not silently spawn nothing."""
    vol = _blob_volume(8)
    mat = materials_from_param(Param(density=5.0))
    scene = make_scene(vol, mat, envmap=envmod.constant(BG))
    settings = RenderSettings(precompute_opacity=False, steps_per_launch=4)
    with pytest.raises(ValueError, match="overflows int32"):
        integrator.render(scene, cammod.make_camera(), settings,
                          8192, 8192, 100000, pool=256)


def test_scatter_inline_equivalent():
    """Inline scatter consumes the same per-lane draw sequence as batched
    scatter — images agree to fp-reassociation level."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=25.0, albedo=(0.95, 0.9, 0.85),
                                     sigma_t=(1.0, 0.8, 0.6), g=0.3))
    scene = make_scene(vol, mat, envmap=envmod.constant(BG),
                       sun_dir=(0.3, 0.9, 0.3), sun_power=(2.0, 2.0, 2.0),
                       sun_power_original=(9.0, 9.0, 9.0))
    imgs = []
    for si in (False, True):
        settings = RenderSettings(precompute_opacity=False,
                                  steps_per_launch=4, scatter_inline=si)
        fm = _render(scene, settings, w=10, h=10, spp=24, pool=1024)
        imgs.append(np.asarray(filmmod.image(fm)))
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=1e-5, atol=1e-6)


def test_drain_ladder_invariant():
    """Multi-step drain compaction (pool ladder) must not change the film:
    lane repacking is exact because RNG streams live in lane registers."""
    vol = _blob_volume(16)
    mat = materials_from_param(Param(density=10.0, g=0.5))
    scene = make_scene(vol, mat, envmap=envmod.constant(BG),
                       sun_dir=(0.0, 1.0, 0.0), sun_power=(1.0, 1.0, 1.0),
                       sun_power_original=(10.0, 10.0, 10.0))
    settings = RenderSettings(precompute_opacity=False, steps_per_launch=4)
    cam = cammod.make_camera()
    f_ref = integrator.render(scene, cam, settings, 8, 8, 4, pool=256)
    f_lad = integrator.render(scene, cam, settings, 8, 8, 4, pool=256,
                              tail_pool=32)
    np.testing.assert_allclose(np.asarray(filmmod.image(f_ref)),
                               np.asarray(filmmod.image(f_lad)),
                               rtol=1e-5, atol=1e-6)
