#!/usr/bin/env python3
"""Measure several RenderSettings configs in ONE process.

The axon tunnel moves scene arrays at ~150 KB/s, so per-process scene
upload (~4-6 min for the flagship) dominates short sweeps; this tool
uploads the scene once and benches each config sequentially with the same
honest methodology as bench.py (phase-mixed warmup, long window, a host
pull per launch).

Usage:
  python tools/sweep.py --seconds 60 \
      '{}' '{"rearm_every": 4}' '{"rearm_every": 2, "spawn_every": 8}'

Each positional arg is a JSON dict of RenderSettings field overrides
(applied on top of steps_per_launch=128 defaults).  Special keys:
  "_opacity": 1   — bake + use the sun-opacity cache (scene-level)
  "_pool": N      — lane-pool size for this config
Prints one JSON line per config.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="+",
                    help="JSON RenderSettings overrides per config")
    ap.add_argument("--scene", default="flagship",
                    choices=["flagship", "cloud"])
    ap.add_argument("--size", default="960x512")
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--pool", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=128)
    args = ap.parse_args()

    from cuda_volpath_tpu.runtime import configure_jax
    configure_jax()  # JAX_PLATFORMS pin + persistent compile cache
    import jax.numpy as jnp
    from cuda_volpath_tpu.config import RenderSettings
    from cuda_volpath_tpu.render import film as filmmod, integrator
    from cuda_volpath_tpu import scenes

    w, h = (int(v) for v in args.size.split("x"))
    cfgs = [json.loads(c) for c in args.configs]
    any_opacity = any(c.get("_opacity") for c in cfgs)

    t0 = time.time()
    scene_fn = scenes.flagship if args.scene == "flagship" else scenes.cloud
    scene, cam, _ = scene_fn(n=256, bake_opacity=any_opacity)
    # force the upload now so the first config's compile time is clean
    float(jnp.sum(scene.density.data.astype(jnp.float32)))
    print(f"# scene ready in {time.time() - t0:.0f}s", file=sys.stderr)

    npix = w * h
    for raw in cfgs:
        over = dict(raw)
        opacity = bool(over.pop("_opacity", 0))
        pool = int(over.pop("_pool", args.pool))
        settings = RenderSettings(**{"steps_per_launch": args.steps,
                                     "precompute_opacity": opacity,
                                     **over})
        # precompute_opacity=False never reads the od channels, so the
        # opacity-baked scene serves both kinds of config unchanged
        sc = scene
        _, launch = integrator.make_step_fn(settings, w, h)
        st = integrator.init_state(pool, settings.samples_per_item)
        st = st.replace(total_items=jnp.full(
            (1,), min(npix * 100000, 2**31 - 1), jnp.int32))
        film = filmmod.make_film(w, h)

        t0 = time.time()
        st, film = launch(sc, cam, st, film)
        float(jnp.sum(film.count[:-1]))
        print(f"# {json.dumps(raw)}: first launch {time.time() - t0:.0f}s",
              file=sys.stderr)
        warm_target = 3.0 * pool * settings.samples_per_item
        t0 = time.time()
        nwarm = 1
        while (nwarm < 6 or float(jnp.sum(film.count[:-1])) < warm_target) \
                and time.time() - t0 < 300:
            st, film = launch(sc, cam, st, film)
            nwarm += 1

        retired0 = float(jnp.sum(film.count[:-1]))
        t0 = time.time()
        n = 0
        while time.time() - t0 < args.seconds:
            st, film = launch(sc, cam, st, film)
            float(jnp.sum(film.count[:-1]))
            n += 1
        elapsed = time.time() - t0
        rate = (float(jnp.sum(film.count[:-1])) - retired0) / elapsed
        print(json.dumps({
            "config": raw, "scene": args.scene, "pool": pool,
            "samples_s": round(rate),
            "ms_per_launch": round(elapsed / n * 1e3),
            "launches": n,
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
