"""Estimator-level parity: the wavefront integrator in ``reference_march``
mode against the scalar numpy oracle of the reference's active kernel
(tests/reference_oracle.py ≙ src/volumeRender_kernel.cu:1958-2318+754-808).

Same (pixel, sample) RNG streams, same draw order, same f32 math — each
sample's radiance and scatter count must match draw-for-draw.  XLA and
libm transcendentals differ by ~1 ulp which occasionally flips a boundary
comparison and diverges one sample's draw sequence, so the assertion is:
nearly all samples match tightly, and a single wrong weight anywhere
(which would corrupt *every* sample) fails loudly.
"""

import numpy as np
import jax.numpy as jnp

from cuda_volpath_tpu.config import Param, RenderSettings, Tracker
from cuda_volpath_tpu.render import film as filmmod
from cuda_volpath_tpu.render import integrator
from cuda_volpath_tpu import scenes

import reference_oracle as oracle

W = H = 16
SPP = 6


def _make_parity_scene():
    param = Param(density=40.0, g=0.5, sigma_t=(1.0, 0.65, 0.35),
                  albedo=(0.95, 0.88, 0.8))
    scene, cam, _ = scenes.gaussian_blob(16, param, reference_bounds=True)
    return scene, cam


def _render_sample(scene, cam, launch, s):
    """Render exactly sample index ``s`` for every pixel (work-queue window
    [s*npix, (s+1)*npix)); returns (rgb[(H,W,3)], heat[(H,W)])."""
    npix = W * H
    st = integrator.init_state(512)
    st = st.replace(next_item=jnp.full((1,), s * npix, jnp.int32),
                    total_items=jnp.full((1,), (s + 1) * npix, jnp.int32))
    film = filmmod.make_film(W, H)
    while True:
        st, film = launch(scene, cam, st, film)
        if int(jnp.sum((st.status != integrator.DONE)
                       .astype(jnp.int32))) == 0 and \
                int(jnp.max(st.pixel)) < 0:
            break
    assert int(np.asarray(filmmod.spp(film)).min()) == 1
    rgb = np.asarray(film.sum[:-1, :3]).reshape(H, W, 3)
    heat = np.asarray(film.sum[:-1, 3]).reshape(H, W)
    return rgb, heat


def _compare(tracker: Tracker, unified: bool = False):
    scene, cam = _make_parity_scene()
    # samples_per_item=1: _render_sample's work-queue window arithmetic
    # (item == sample*npix + pixel) addresses individual samples — with
    # multi-sample items an item is K samples and the window would render
    # samples [K*s, K*(s+1)) instead of sample s
    settings = RenderSettings(tracker=tracker, reference_march=True,
                              precompute_opacity=False,
                              samples_per_item=1,
                              steps_per_launch=8,
                              unified_march=unified)
    _, launch = integrator.make_step_fn(settings, W, H)

    sc = oracle.OracleScene(scene, cam, W, H,
                            search_radius=settings.search_radius,
                            max_depth=settings.max_depth)
    o_rgb, o_heat = oracle.render_oracle(
        sc, SPP, decomp=(tracker == Tracker.DECOMP))

    w_rgb = np.zeros_like(o_rgb)
    w_heat = np.zeros_like(o_heat, np.float32)
    for s in range(SPP):
        w_rgb[s], w_heat[s] = _render_sample(scene, cam, launch, s)

    heat_ok = w_heat == o_heat
    rgb_ok = np.all(np.abs(w_rgb - o_rgb) <= 2e-3 + 2e-3 * np.abs(o_rgb),
                    axis=-1)
    matched = heat_ok & rgb_ok
    frac = matched.mean()
    # a wrong weight / draw-order bug corrupts every sample; ulp-flip
    # divergence corrupts isolated ones
    assert frac >= 0.97, (
        f"only {frac:.1%} of {matched.size} samples match the reference "
        f"oracle (heat mismatches: {(~heat_ok).sum()}, "
        f"rgb mismatches: {(~rgb_ok).sum()})")
    # aggregate means must agree tightly as well
    np.testing.assert_allclose(w_rgb.mean(axis=(0, 1, 2)),
                               o_rgb.mean(axis=(0, 1, 2)),
                               rtol=5e-3, atol=1e-4)


def test_opacity_shortcut_matches_reference_oracle():
    """PRECOMPUTE_OPACITY=1 parity (kernel.cu:2181-2196): with a baked
    sun-opacity cache, samples past the spp>10 gate take the
    ``exp(-σt·ρ'·od)`` NEE shortcut at scatter depth >20 instead of the
    ``Tr_spectral`` march — draw-for-draw against the scalar oracle,
    including the packed-table 24-bit od values the wavefront fetches.

    (VERDICT r2: the packed path was previously only self-checked against
    the in-repo unpacked path; this pins it to the reference semantics.)
    """
    from cuda_volpath_tpu.volume import opacity as opacitymod
    from cuda_volpath_tpu.render.scene import pack_density_opacity

    param = Param(density=60.0, g=0.6, sigma_t=(1.0, 0.75, 0.5),
                  albedo=(0.98, 0.96, 0.94))
    scene, cam, _ = scenes.gaussian_blob(16, param, reference_bounds=True)
    od = np.asarray(opacitymod.bake(scene.density,
                                    np.asarray(scene.sun_dir), dt=0.01))
    scene = pack_density_opacity(scene, od)
    assert scene.packed is not None and float(scene.od_scale) > 0.0

    max_depth = 64  # deep enough for the scatters>20 gate, fast oracle
    settings = RenderSettings(tracker=Tracker.DECOMP, reference_march=True,
                              precompute_opacity=True, samples_per_item=1,
                              steps_per_launch=8, max_depth=max_depth)
    _, launch = integrator.make_step_fn(settings, W, H)

    sc = oracle.OracleScene(scene, cam, W, H,
                            search_radius=settings.search_radius,
                            max_depth=max_depth)
    assert sc.opacity is not None

    # samples 11.. arm the reference's spp>10 gate (kernel.cu:2181)
    samples = [11, 12, 13]
    o_rgb = np.zeros((len(samples), H, W, 3), np.float32)
    o_heat = np.zeros((len(samples), H, W), np.int32)
    for i, s in enumerate(samples):
        for y in range(H):
            for x in range(W):
                o_rgb[i, y, x], o_heat[i, y, x] = oracle.trace_sample(
                    sc, x, y, s, decomp=True)

    # the gate must actually fire: disabling the cache changes the result
    sc_nc = oracle.OracleScene(scene, cam, W, H,
                               search_radius=settings.search_radius,
                               max_depth=max_depth)
    sc_nc.opacity = None
    diff = 0
    for y in range(H):
        for x in range(W):
            r, _ = oracle.trace_sample(sc_nc, x, y, samples[0], decomp=True)
            diff += int(not np.allclose(r, o_rgb[0, y, x]))
    assert diff > 0, "no sample took the opacity shortcut — gate untested"

    w_rgb = np.zeros_like(o_rgb)
    w_heat = np.zeros_like(o_heat, np.float32)
    for i, s in enumerate(samples):
        w_rgb[i], w_heat[i] = _render_sample(scene, cam, launch, s)

    heat_ok = w_heat == o_heat
    rgb_ok = np.all(np.abs(w_rgb - o_rgb) <= 2e-3 + 2e-3 * np.abs(o_rgb),
                    axis=-1)
    matched = heat_ok & rgb_ok
    frac = matched.mean()
    assert frac >= 0.97, (
        f"only {frac:.1%} of {matched.size} samples match the reference "
        f"oracle with the opacity shortcut (heat mismatches: "
        f"{(~heat_ok).sum()}, rgb mismatches: {(~rgb_ok).sum()})")
    np.testing.assert_allclose(w_rgb.mean(axis=(0, 1, 2)),
                               o_rgb.mean(axis=(0, 1, 2)),
                               rtol=5e-3, atol=1e-4)


def test_decomp_matches_reference_oracle():
    """DECOMP: the benchmarked reference kernel (kernel.cu:2364-2370)."""
    _compare(Tracker.DECOMP)


def test_bounded_matches_reference_oracle():
    """BOUNDED ≙ the decomp kernel with the control medium inactive
    (use_decomposition=false, kernel.cu:2023): no control-distance draw."""
    _compare(Tracker.BOUNDED)


def test_decomp_unified_matches_reference_oracle():
    """DECOMP through the unified march/setup pass (config.unified_march):
    the fused-table fetch path is draw-for-draw identical too."""
    _compare(Tracker.DECOMP, unified=True)
