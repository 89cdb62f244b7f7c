"""Golden full-frame renders: fixed-seed frames of the flagship and cloud
scenes with committed per-tile statistics (VERDICT r2 #4 — the end-to-end
guard above the 16³ draw-for-draw oracle).

Writes, for a (scene, WxH, spp) config:
  * ``<out>.npz``  — per-tile channel means, per-tile SEM (from the film's
    E[x²] lanes), global mean, heat mean, and the config;
  * ``<out>.png``  — gamma-2.2 frame (from-scratch PNG writer).

The CI render uses an 8-step launch, a small pool, and no baked-opacity
shortcut (see the notes in ``render_golden`` — big pools/steps hit the
single-core host's 30-min XLA-CPU compiles; the od shortcut is locked by
the reference oracle instead); results are cadence/pool-invariant by
construction, so these stats lock the *estimator*, not the execution
schedule.

Usage:
  python tools/golden_frame.py --scene flagship --size 240x128 --spp 16 \
      --out tests/data/golden_flagship_240x128
  BENCH-class frames for docs: --size 960x512 --spp 64 on the TPU.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


TILE = 16


def tile_stats(film, width, height):
    """Per-TILE×TILE-tile channel means and SEMs from the film."""
    from cuda_volpath_tpu.render import film as filmmod
    img = np.asarray(filmmod.image(film))           # (H, W, 3)
    var = np.asarray(filmmod.variance(film))        # (H, W, 3) per-sample var
    cnt = np.asarray(filmmod.spp(film)).reshape(height, width)
    ty, tx = height // TILE, width // TILE
    img_t = img[:ty * TILE, :tx * TILE].reshape(ty, TILE, tx, TILE, 3)
    var_t = var[:ty * TILE, :tx * TILE].reshape(ty, TILE, tx, TILE, 3)
    cnt_t = cnt[:ty * TILE, :tx * TILE].reshape(ty, TILE, tx, TILE)
    means = img_t.mean(axis=(1, 3))
    # Var of the tile mean: Σ var_i/spp_i over pixels / npix²
    sem = np.sqrt((var_t / np.maximum(cnt_t, 1)[..., None]).sum(axis=(1, 3))
                  ) / (TILE * TILE)
    return means.astype(np.float32), sem.astype(np.float32)


def render_golden(scene_name: str, width: int, height: int, spp: int,
                  steps: int = 8, opacity: bool = False, n: int = 64,
                  pool: int = 8192):
    from cuda_volpath_tpu.config import RenderSettings
    from cuda_volpath_tpu.render import integrator
    from cuda_volpath_tpu import scenes

    import sys as _sys
    import time as _time
    scene_fn = scenes.cloud if scene_name == "cloud" else scenes.flagship
    t0 = _time.time()
    # CI defaults avoid two measured XLA-CPU cliffs: the 256-cubed scene
    # graphs compile pathologically (~35-40 min, >30 GB RSS — n=64 takes
    # ~2 min), and a fresh checkout would pay an hours-long CPU opacity
    # bake (the baked-od shortcut is locked draw-for-draw by the oracle,
    # tests/test_oracle.py, so the goldens run precompute_opacity=False).
    scene, cam, _ = scene_fn(n=n, bake_opacity=opacity)
    print(f"# scene ready {_time.time() - t0:.1f}s", file=_sys.stderr,
          flush=True)
    settings = RenderSettings(steps_per_launch=steps,
                              precompute_opacity=opacity)
    t0 = _time.time()
    n = [0]

    def _cb(_f):
        n[0] += 1
        if n[0] % 20 == 1:
            print(f"# launch {n[0]} t={_time.time() - t0:.1f}s",
                  file=_sys.stderr, flush=True)
    # pool 8192 + tail_pool=pool: ONE compiled graph.  XLA-CPU compile
    # time on the single-core host scales hard with pool x steps (a
    # pool-30720 48-step graph measured >30 min; the suite's steps<=8
    # small-pool graphs compile in ~1-3 min) — goldens must stay on the
    # fast side; results are pool/cadence-invariant by construction.
    film = integrator.render(scene, cam, settings, width, height, spp,
                             pool=pool, tail_pool=pool, progress_cb=_cb)
    print(f"# rendered in {_time.time() - t0:.1f}s ({n[0]} launches)",
          file=_sys.stderr, flush=True)
    return film, settings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="flagship",
                    choices=["flagship", "cloud"])
    ap.add_argument("--size", default="240x128")
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--pool", type=int, default=8192)
    ap.add_argument("--n", type=int, default=64,
                    help="volume resolution; 64 is the CI default — the "
                    "256-cubed scenes trigger a pathological XLA-CPU "
                    "compile (~35-40 min, >30 GB; measured) and are "
                    "rendered on the TPU instead (docs/COMPARISON.md)")
    ap.add_argument("--opacity", type=int, default=0, choices=(0, 1),
                    help="bake + use the sun-opacity cache (reference "
                    "parity; default off — the CI goldens avoid the "
                    "pathological XLA-CPU compile, see render_golden)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from cuda_volpath_tpu.runtime import configure_jax
    configure_jax()
    from cuda_volpath_tpu.render import film as filmmod
    from cuda_volpath_tpu.render import postprocess
    from cuda_volpath_tpu.io.png import write_png

    width, height = (int(v) for v in args.size.split("x"))
    import time
    t0 = time.time()
    film, _ = render_golden(args.scene, width, height, args.spp,
                            args.steps, opacity=bool(args.opacity),
                            n=args.n, pool=args.pool)
    means, sem = tile_stats(film, width, height)
    # film row 0 is the bottom scanline (+y up): flip for display like
    # the reference's dump (src/image.cpp dump_ppm flipped-Y) and io/ppm.py
    img = np.asarray(postprocess.gamma_correct(
        np.asarray(filmmod.image(film))))[::-1]
    heat = float(np.asarray(filmmod.heat(film)).mean())
    np.savez_compressed(
        args.out + ".npz", tile_means=means, tile_sem=sem,
        mean=means.mean(axis=(0, 1)), heat=np.float32(heat),
        scene=args.scene, size=args.size, spp=args.spp, tile=TILE)
    write_png(args.out + ".png", img)
    print(f"{args.scene} {args.size} spp={args.spp}: mean="
          f"{means.mean(axis=(0, 1))} heat={heat:.3f} "
          f"({time.time() - t0:.1f}s) -> {args.out}.npz/.png")


if __name__ == "__main__":
    main()
