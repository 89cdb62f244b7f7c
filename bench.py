"""Benchmark: flagship volumetric path tracing throughput.

Measures camera-samples/second on the flagship scene (baked Julia cloud,
decomposition tracking, Hosek sunsky + sun NEE) at the reference's default
960×512 resolution, and compares against the reference baseline of
~16.4 M camera samples/s (GTX 1080, derived from README.md's "~30 s to
1000 spp" at 960×512 — see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time


BASELINE_SAMPLES_S = 16.4e6  # GTX 1080 derived (BASELINE.md)


def main():
    import jax
    from cuda_volpath_tpu.runtime import configure_jax
    configure_jax()  # JAX_PLATFORMS pin + persistent compile cache
    import jax.numpy as jnp
    from cuda_volpath_tpu.config import RenderSettings
    from cuda_volpath_tpu.render import film as filmmod
    from cuda_volpath_tpu.render import integrator
    from cuda_volpath_tpu import scenes

    width, height = (int(v) for v in
                     os.environ.get("BENCH_SIZE", "960x512").split("x"))
    # 120 s default: with multi-sample work items the flush herd cycles
    # every ~600 micro-steps, and a 30 s window (~2 cycles) carries ±8%
    # phase noise; ~9 cycles brings it under ±2% (see BENCH.md).
    seconds = float(os.environ.get("BENCH_SECONDS", "120"))
    pool = int(os.environ.get("BENCH_POOL", str(1 << 20)))
    # 120 = 10 scan blocks at the default spawn_every=12 (config.use_scan):
    # the launch graph is one block long, compiles in ~90 s cold, and
    # measured 667k vs the unrolled 128-step graph's 657k samples/s
    # (BENCH.md "Scan launch A/B").  Big launches keep tunnel pulls rare.
    steps = int(os.environ.get("BENCH_STEPS", "120"))
    # BENCH_SCENE=cloud benches the dense-cloud scene (WDAS content class)
    scene_name = os.environ.get("BENCH_SCENE", "flagship")

    t0 = time.time()
    # BENCH_OPACITY=0 disables the baked sun-opacity cache (reference
    # parity is PRECOMPUTE_OPACITY=1, kernel.cu:30 — the default here).
    # Round 1 kept it off because the separate pool-wide opacity fetch per
    # micro-step cost more than its scatters>20 NEE shortcut saved; the
    # packed [density, od₂₄] row table (render.scene.pack_density_opacity)
    # folds that fetch into the march's existing density gather, and the
    # on-chip A/B (idle host, 120 s windows) measured parity as neutral:
    # 609.6k on vs 608.1k off (+7% ms/launch repaid in steps/sample).
    opacity_on = os.environ.get("BENCH_OPACITY", "1") == "1"
    scene_fn = scenes.cloud if scene_name == "cloud" else scenes.flagship
    scene, cam, param = scene_fn(n=256, bake_opacity=opacity_on)
    if os.environ.get("BENCH_NO_PACK", "0") == "1":
        # ablation: separate density + opacity gathers (the pre-pack path).
        # With opacity on, the pre-pack path gathered a full-resolution f32
        # grid — reconstruct it from the packed table so the ablation
        # measures (and computes) what round 1 actually did, not a 1-voxel
        # placeholder fetch.
        import numpy as np
        if opacity_on and scene.packed is not None:
            from cuda_volpath_tpu.ops import grid as gridmod
            pk = np.asarray(scene.packed.data).astype(np.float32)
            od = (pk[..., 1] * 65536.0 + pk[..., 2] * 256.0
                  + pk[..., 3]) * float(scene.od_scale)
            scene = scene.replace(opacity=gridmod.Grid3D(
                data=jnp.asarray(od, jnp.float32),
                box_min=scene.density.box_min,
                box_max=scene.density.box_max))
        scene = scene.replace(packed=None, od_scale=None)
    metric_scene = "cloud_decomp" if scene_name == "cloud" else "julia_decomp"
    settings = RenderSettings(steps_per_launch=steps,
                              precompute_opacity=opacity_on)
    # BENCH_SETTINGS='{"rearm_every": 4, ...}' — ad-hoc RenderSettings
    # overrides for tuning sweeps (field values must be JSON scalars)
    if os.environ.get("BENCH_SETTINGS"):
        settings = settings.replace(**json.loads(os.environ["BENCH_SETTINGS"]))
    print(f"# scene ready in {time.time() - t0:.1f}s", file=sys.stderr)

    npix = width * height
    # Multi-chip: shard the work queue + lane pool over all devices (or
    # BENCH_MESH=N for a subset).  Zero collectives in the hot loop; the
    # per-device films are summed at readout (parallel/shard.py).  On the
    # driver's single chip this path is never taken.
    n_dev = int(os.environ.get("BENCH_MESH", str(len(jax.devices()))))
    if n_dev > 1:
        from cuda_volpath_tpu.parallel import shard
        if "BENCH_STEPS" not in os.environ:
            # XLA's compile of shard_map x long unrolls is strongly
            # superlinear in steps (see BENCH.md) — default multi-chip
            # launches shorter; the extra host pulls cost a few % at most
            settings = settings.replace(steps_per_launch=32)
        mesh = shard.make_mesh(n_dev)
        launch = shard.make_sharded_launch(settings, cam, width, height,
                                           mesh)
        st = shard.init_sharded_state(
            pool // n_dev, n_dev, 2**31 - 1,
            samples_per_item=settings.samples_per_item)
        fdata = jnp.zeros((n_dev, npix + 1, 8), jnp.float32)

        def count(fd):
            return float(jnp.sum(fd[:, :-1, 4]))

        t0 = time.time()
        st, fdata = launch(scene, cam, st, fdata)
        count(fdata)
        print(f"# first sharded launch ({n_dev} devices, compile+run) "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
        # phase-mixing warmup (see the single-device comment below)
        warm_target = 3.0 * pool * settings.samples_per_item
        t0 = time.time()
        nwarm = 1
        while (nwarm < 6 or count(fdata) < warm_target) \
                and time.time() - t0 < 300:
            st, fdata = launch(scene, cam, st, fdata)
            nwarm += 1
        retired0 = count(fdata)
        t0 = time.time()
        n = 0
        while time.time() - t0 < seconds:
            st, fdata = launch(scene, cam, st, fdata)
            count(fdata)
            n += 1
        elapsed = time.time() - t0
        samples_s = (count(fdata) - retired0) / elapsed
        # device count in the metric name + per-device rate so aggregate
        # multi-chip numbers are never conflated with single-chip history
        print(json.dumps({
            "metric": (f"camera_samples_per_second_{width}x{height}"
                       f"_{metric_scene}_{n_dev}dev"),
            "value": round(samples_s),
            "unit": "samples/s",
            "devices": n_dev,
            "per_device": round(samples_s / n_dev),
            "vs_baseline": round(samples_s / BASELINE_SAMPLES_S, 4),
        }))
        return

    _, launch = integrator.make_step_fn(settings, width, height)
    st = integrator.init_state(pool, settings.samples_per_item)
    # effectively-infinite work queue, clamped to int32 range (npix * spp
    # can overflow and wrap negative, which silently spawns nothing)
    st = st.replace(total_items=jnp.full(
        (1,), min(npix * 100000, 2**31 - 1), jnp.int32))
    film = filmmod.make_film(width, height)

    # compile + pipeline warmup (fill the pool and reach steady state).
    # NB: a host pull per launch — on lazy/async backends (the axon TPU
    # tunnel) block_until_ready does not force execution.
    t0 = time.time()
    st, film = launch(scene, cam, st, film)
    float(jnp.sum(film.count[:-1]))
    print(f"# first launch (compile+run) {time.time() - t0:.1f}s",
          file=sys.stderr)
    # warm until every lane has retired ~3 full work items: with
    # multi-sample items (settings.samples_per_item) the pool starts
    # phase-synchronized and a short warmup would time the first item
    # completion herd, not steady state
    warm_target = 3.0 * pool * settings.samples_per_item
    t0 = time.time()
    nwarm = 1
    while (nwarm < 6 or float(jnp.sum(film.count[:-1])) < warm_target) \
            and time.time() - t0 < 300:
        st, film = launch(scene, cam, st, film)
        nwarm += 1
    print(f"# warmed {nwarm} launches in {time.time() - t0:.1f}s",
          file=sys.stderr)

    # measure steady state, forcing with a host pull per launch
    retired0 = float(jnp.sum(film.count[:-1]))
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        st, film = launch(scene, cam, st, film)
        float(jnp.sum(film.count[:-1]))
        n += 1
    elapsed = time.time() - t0
    retired = float(jnp.sum(film.count[:-1])) - retired0
    samples_s = retired / elapsed

    print(f"# {n} launches, {elapsed / n * 1e3:.0f} ms/launch, "
          f"{pool * steps * n / elapsed / 1e6:.0f}M lane-steps/s",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"camera_samples_per_second_{width}x{height}_{metric_scene}",
        "value": round(samples_s),
        "unit": "samples/s",
        "vs_baseline": round(samples_s / BASELINE_SAMPLES_S, 4),
    }))


if __name__ == "__main__":
    main()
