#!/usr/bin/env python3
"""Inspect which PathState leaves the compiled launch actually carries.

Settles the "slim dead registers out of PathState" question without a
refactor: lowers a small scan launch (CPU backend, any machine), compiles
it, and counts the state leaves inside the optimized HLO while-loop carry.
XLA's while-loop simplifier removes carry elements that no enabled feature
writes — with eager_rearm off and PASSIVE envmap the (N,3) leaves drop
from the dataclass's 10 to 6 (o, d, throughput, radiance, nee_coeff,
sh_tr): ``shadow_dir`` and the ``pend_*`` bank are already dead in the
executable, so deleting them from the dataclass cannot change performance
(BENCH.md round 5).

Usage: python tools/probe_state_carry.py [--mis] [--eager]
"""

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mis", action="store_true",
                    help="envmap MIS mode (shadow_dir/env_stage live)")
    ap.add_argument("--eager", action="store_true",
                    help="eager re-arm (pend_* bank live)")
    ap.add_argument("--pool", type=int, default=256)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from cuda_volpath_tpu.config import RenderSettings, EnvmapMode
    from cuda_volpath_tpu.render import integrator, film as filmmod
    from cuda_volpath_tpu import scenes

    scene, cam, _ = scenes.gaussian_blob(16)
    settings = RenderSettings(
        steps_per_launch=8, spawn_every=4, rearm_every=4,
        precompute_opacity=False,
        eager_rearm=args.eager,
        envmap_mode=EnvmapMode.MIS if args.mis else EnvmapMode.PASSIVE)
    _, launch = integrator.make_step_fn(settings, 8, 8)
    st = integrator.init_state(args.pool)
    film = filmmod.make_film(8, 8)
    txt = launch.lower(scene, cam, st, film, None).compile().as_text()

    n = args.pool
    tuples = re.findall(rf'\(([^()]*f32\[{n},3\][^()]*)\) while\(', txt)
    if not tuples:
        print("no while-loop carry found (launch too short to scan?)")
        return 1
    for t in tuples:
        print(f"while carry: f32[{n},3] x {t.count(f'f32[{n},3]')}  "
              f"f32[{n}] x {t.count(f'f32[{n}]')}  "
              f"pred[{n}] x {t.count(f'pred[{n}]')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
