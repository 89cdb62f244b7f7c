#!/usr/bin/env python3
"""Finite-render (time-to-N-spp) sweep of RenderSettings configs in ONE
process.

The open-window meter carries renewal/length bias with multi-sample work
items (BENCH.md "the phase trap"): items slower than the window are
systematically undercounted, and the bias grows with samples_per_item.  A
finite render counts every sample exactly once, so configs that trade
item granularity against pool idle (samples_per_item, flush_every,
rearm_every) must be judged on this metric.  One scene upload (the axon
tunnel moves arrays at ~60-150 KB/s) serves every config; each config
pre-warms its own launch + drain-ladder graphs outside the timed region
(mirroring the reference, which also excludes CUDA compilation —
reference README.md:7 measures converged wall time only).

Usage:
  python tools/sweep_convergence.py --spp 200 \
      '{}' '{"samples_per_item": 4}' '{"samples_per_item": 1, "flush_every": 1}'

Each positional arg is a JSON dict of RenderSettings overrides (applied
on top of steps_per_launch=128 + precompute_opacity defaults).  Prints
one JSON line per config with the render seconds and queue/drain split.
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
    ap.add_argument("--spp", type=int, default=200)
    ap.add_argument("--pool", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--opacity", type=int, default=1, choices=(0, 1))
    ap.add_argument("--heat-order", type=int, default=0, choices=(0, 1))
    args = ap.parse_args()

    from cuda_volpath_tpu.runtime import configure_jax
    configure_jax()  # JAX_PLATFORMS pin + persistent compile cache
    import numpy as np
    import jax.numpy as jnp
    from cuda_volpath_tpu.config import RenderSettings
    from cuda_volpath_tpu.render import film as filmmod, integrator
    from cuda_volpath_tpu import scenes

    w, h = (int(v) for v in args.size.split("x"))
    cfgs = [json.loads(c) for c in args.configs]
    for c in cfgs:
        # fail fast, before the (minutes-long) scene upload: _heat_tile
        # only shapes the heat permutation, so a config carrying it
        # without the heat-ordered queue would be a no-op mislabeled as a
        # measured tile variant
        if c.get("_heat_tile") is not None \
                and not (c.get("_heat_order", args.heat_order)):
            ap.error(f"config {c}: _heat_tile requires _heat_order=1 "
                     "(tile granularity only shapes the heat permutation)")

    t0 = time.time()
    scene_fn = scenes.flagship if args.scene == "flagship" else scenes.cloud
    scene, cam, _ = scene_fn(n=256, bake_opacity=bool(args.opacity))
    float(jnp.sum(scene.density.data.astype(jnp.float32)))  # force upload
    print(f"# scene ready in {time.time() - t0:.0f}s", file=sys.stderr)

    for raw in cfgs:
        raw = dict(raw)
        # "_heat_order": 1 turns on the heat-ordered work queue for this
        # config only (a tool knob, not a RenderSettings field — underscore
        # prefix like sweep.py's "_opacity")
        heat = bool(raw.pop("_heat_order", args.heat_order))
        # "_heat_tile": N orders at N×N-tile granularity (locality-
        # preserving; see integrator.heat_order); combination with
        # _heat_order already validated at parse time above
        heat_tile = raw.pop("_heat_tile", None)
        # "_tail_taper": 0 disables the 1-sample-item drain taper
        taper = bool(raw.pop("_tail_taper", 1))
        settings = RenderSettings(steps_per_launch=args.steps,
                                  precompute_opacity=bool(args.opacity),
                                  **raw)
        t0 = time.time()
        integrator.prewarm_drain(scene, cam, settings, w, h, args.pool,
                                 pixel_order=heat)
        print(f"# {json.dumps(raw)}: prewarmed in {time.time() - t0:.0f}s",
              file=sys.stderr)

        t0 = time.time()
        stats = {}
        film = integrator.render(scene, cam, settings, w, h, args.spp,
                                 pool=args.pool, stats=stats,
                                 heat_ordered=heat, heat_tile=heat_tile,
                                 tail_taper=taper)
        dt = time.time() - t0
        spp = float(np.mean(np.asarray(filmmod.spp(film))))
        stats.pop("drain_log", None)
        if heat:
            raw["_heat_order"] = 1
        if heat_tile is not None:
            raw["_heat_tile"] = heat_tile
        if not taper:
            raw["_tail_taper"] = 0
        print(json.dumps({
            "config": raw, "scene": args.scene, "pool": args.pool,
            "spp": round(spp, 1), "seconds": round(dt, 1),
            "samples_s": round(w * h * args.spp / dt),
            **stats,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
