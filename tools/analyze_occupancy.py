#!/usr/bin/env python3
"""Lane-phase occupancy analysis of the wavefront launch.

Runs the real launch graph with ``config.instrument`` on and reports where
pool-slot-steps go at steady state: marching (path/shadow), segment setup,
scatter wait, fold wait (sample finished, awaiting the fold/re-arm pass),
parked (item folded, awaiting the film flush), and empty (awaiting queue
spawn).  This decomposes the gap between lane-steps spent and camera
samples retired — the number BENCH.md's "steps per sample" lever targets —
from measurement instead of cadence models.

Usage:  python tools/analyze_occupancy.py [--scene flagship|cloud|blob]
            [--pool 2^N] [--launches 8] [--size WxH] [--rearm-every N]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

PHASES = ["march_path", "march_shadow", "new_segment", "scatter_wait",
          "fold_wait", "parked", "empty"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="flagship",
                    choices=["flagship", "cloud", "blob"])
    ap.add_argument("--size", default="960x512")
    ap.add_argument("--pool", type=int, default=1 << 20)
    ap.add_argument("--launches", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=None,
                    help="warm launches before measuring (default: until "
                    "3 pool*K samples retired, like bench.py)")
    ap.add_argument("--rearm-every", type=int, default=None)
    ap.add_argument("--opacity", type=int, default=0, choices=(0, 1))
    ap.add_argument("--steps", type=int, default=128,
                    help="steps_per_launch (XLA-CPU compile time grows "
                    "superlinearly with the instrumented unroll — use "
                    "24-32 there; the TPU remote compiler handles 128)")
    args = ap.parse_args()

    from cuda_volpath_tpu.runtime import configure_jax
    configure_jax()  # JAX_PLATFORMS pin + persistent compile cache
    import numpy as np
    import jax.numpy as jnp
    from cuda_volpath_tpu.config import RenderSettings, Param
    from cuda_volpath_tpu.render import film as filmmod, integrator
    from cuda_volpath_tpu import scenes

    w, h = (int(v) for v in args.size.split("x"))
    if args.scene == "blob":
        scene, cam, _ = scenes.gaussian_blob(32, Param(density=50.0))
    else:
        fn = scenes.flagship if args.scene == "flagship" else scenes.cloud
        scene, cam, _ = fn(n=256, bake_opacity=bool(args.opacity))
    over = {"rearm_every": args.rearm_every} if args.rearm_every else {}
    settings = RenderSettings(steps_per_launch=args.steps, instrument=True,
                              precompute_opacity=bool(args.opacity), **over)

    _, launch = integrator.make_step_fn(settings, w, h)
    st = integrator.init_state(args.pool,
                               settings.samples_per_item)
    st = st.replace(total_items=jnp.full((1,), 2**31 - 1, jnp.int32))
    film = filmmod.make_film(w, h)

    t0 = time.time()
    st, film, _ = launch(scene, cam, st, film)
    float(jnp.sum(film.count[:-1]))
    print(f"# compile+first {time.time() - t0:.0f}s", file=sys.stderr)
    target = 3.0 * args.pool * settings.samples_per_item
    t0 = time.time()
    n = 1
    while float(jnp.sum(film.count[:-1])) < target \
            and (args.warmup is None or n < args.warmup) \
            and time.time() - t0 < 600:
        st, film, _ = launch(scene, cam, st, film)
        n += 1
    print(f"# warmed {n} launches", file=sys.stderr)

    agg = np.zeros((len(PHASES),), np.float64)
    retired0 = float(jnp.sum(film.count[:-1]))
    steps = 0
    for _ in range(args.launches):
        st, film, stats = launch(scene, cam, st, film)
        s = np.asarray(stats, np.float64)
        agg += s.sum(axis=0)
        steps += s.shape[0]
    retired = float(jnp.sum(film.count[:-1])) - retired0

    total_slots = agg.sum()
    out = {
        "scene": args.scene, "pool": args.pool,
        "slot_steps_per_sample": round(total_slots / max(retired, 1), 2),
        "samples_retired": int(retired),
    }
    for name, v in zip(PHASES, agg):
        out[name + "_pct"] = round(100.0 * v / total_slots, 2)
        out[name + "_steps_per_sample"] = round(v / max(retired, 1), 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
