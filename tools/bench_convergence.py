#!/usr/bin/env python3
"""Time-to-N-spp at full frame — the reference README's headline metric
("takes about 30 seconds to converge to 1000 spp" on a GTX 1080,
reference README.md:7).

Renders the flagship scene at 960×512 to ``--spp`` (default 1000) through
the normal progressive path (including the straggler drain) and reports
wall seconds.  Compile time is excluded via a warm-up launch, mirroring
the reference which also excludes CUDA compilation.

Usage:  python tools/bench_convergence.py [--spp 1000] [--scene flagship]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=1000)
    ap.add_argument("--scene", default="flagship",
                    choices=["flagship", "cloud"])
    ap.add_argument("--size", default="960x512")
    ap.add_argument("--pool", type=int, default=1 << 20)
    ap.add_argument("--settings", default=None,
                    help="JSON RenderSettings overrides, e.g. "
                    "'{\"samples_per_item\": 1, \"unified_march\": true}'")
    ap.add_argument("--heat-order", type=int, default=0, choices=(0, 1),
                    help="heat-ordered work queue (render(heat_ordered=True)):"
                    " one work item per pixel in identity order first, then"
                    " all remaining sample blocks hardest-pixel-first — LPT"
                    " makespan scheduling that collapses the straggler"
                    " drain; the rendered result is unchanged")
    ap.add_argument("--opacity", type=int, default=0, choices=(0, 1),
                    help="bake + use the sun-opacity cache (reference "
                    "parity PRECOMPUTE_OPACITY=1; the packed row table "
                    "makes its per-march cost zero — deep-scatter "
                    "stragglers take the NEE shortcut, which mainly "
                    "shortens the drain tail)")
    args = ap.parse_args()

    from cuda_volpath_tpu.runtime import configure_jax
    configure_jax()  # JAX_PLATFORMS pin + persistent compile cache
    import numpy as np
    from cuda_volpath_tpu.config import RenderSettings
    from cuda_volpath_tpu.render import film as filmmod, integrator
    from cuda_volpath_tpu import scenes

    w, h = (int(v) for v in args.size.split("x"))
    scene, cam, _ = (scenes.flagship if args.scene == "flagship"
                     else scenes.cloud)(n=256,
                                        bake_opacity=bool(args.opacity))
    settings = RenderSettings(steps_per_launch=128,
                              precompute_opacity=bool(args.opacity))
    if args.settings:
        settings = settings.replace(**json.loads(args.settings))

    # warm every graph (main pool + the whole drain ladder) outside the
    # timed region, mirroring the reference which also excludes compilation
    t0 = time.time()
    # heat-ordered renders run the queue phases through one permuted-queue
    # graph (identity order in phase 1 — same traced signature) and drop
    # the order for the drain, so the ladder is warmed order-free
    integrator.prewarm_drain(scene, cam, settings, w, h, args.pool,
                             pixel_order=bool(args.heat_order))
    print(f"# warmed main + drain-ladder graphs in {time.time() - t0:.0f}s",
          file=sys.stderr)

    t0 = time.time()
    stats = {}
    film = integrator.render(scene, cam, settings, w, h, args.spp,
                             pool=args.pool, stats=stats,
                             heat_ordered=bool(args.heat_order))
    dt = time.time() - t0
    spp = float(np.mean(np.asarray(filmmod.spp(film))))
    for row in stats.pop("drain_log", None) or []:
        # [pool, launch_s, live, check_s, compact_s...] per drain launch
        print(f"# drain {row}", file=sys.stderr)
    tag = "_opacity" if args.opacity else ""
    tag += "_heatorder" if args.heat_order else ""
    print(json.dumps({"metric": f"time_to_{args.spp}spp_{w}x{h}_"
                                f"{args.scene}{tag}",
                      "seconds": round(dt, 1), "mean_spp": round(spp, 1),
                      **stats}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
