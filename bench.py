"""Benchmark: flagship volumetric path tracing throughput.

Measures camera-samples/second on the flagship scene (baked Julia cloud,
decomposition tracking, Hosek sunsky + sun NEE) at the reference's default
960×512 resolution, and compares against the reference baseline of
~16.4 M camera samples/s (GTX 1080, derived from README.md's "~30 s to 1000
spp" at 960×512 — see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

BASELINE_MSAMPLES_S = 16.4  # GTX 1080 derived (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp
    from cuda_volpath_tpu.config import RenderSettings
    from cuda_volpath_tpu.render import film as filmmod
    from cuda_volpath_tpu.render import integrator
    from cuda_volpath_tpu import scenes

    width, height = 960, 512
    spp_measure = int(os.environ.get("BENCH_SPP", "32"))
    pool = int(os.environ.get("BENCH_POOL", str(1 << 19)))
    steps = int(os.environ.get("BENCH_STEPS", "512"))

    t0 = time.time()
    scene, cam, param = scenes.flagship(n=256)
    settings = RenderSettings(steps_per_launch=steps)
    print(f"# scene ready in {time.time() - t0:.1f}s", file=sys.stderr)

    npix = width * height
    _, launch = integrator.make_step_fn(settings, cam, width, height)
    st = integrator.init_state(pool)
    st = st.replace(total_items=jnp.full((1,), npix * (spp_measure + 4),
                                         jnp.int32))
    film = filmmod.make_film(width, height)

    # warmup: compile + fill the pool's pipeline
    t0 = time.time()
    st, film = launch(scene, st, film)
    jax.block_until_ready(film.sum)
    print(f"# first launch (compile+run) {time.time() - t0:.1f}s",
          file=sys.stderr)

    # measure steady-state: run until spp_measure samples/pixel retired
    done_before = float(jnp.sum(film.count[:-1]))
    t0 = time.time()
    target = npix * spp_measure
    while True:
        st, film = launch(scene, st, film)
        retired = float(jnp.sum(film.count[:-1])) - done_before
        if retired >= target:
            break
        if time.time() - t0 > 600:
            break
    elapsed = time.time() - t0
    msamples = retired / elapsed / 1e6

    print(json.dumps({
        "metric": "camera_samples_per_second_960x512_julia_decomp",
        "value": round(msamples * 1e6),
        "unit": "samples/s",
        "vs_baseline": round(msamples / BASELINE_MSAMPLES_S, 3),
    }))


if __name__ == "__main__":
    main()
