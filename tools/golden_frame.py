"""Golden full-frame renders: fixed-seed frames of the flagship and cloud
scenes with committed per-tile statistics (VERDICT r2 #4 — the end-to-end
guard above the 16³ draw-for-draw oracle).

Writes, for a (scene, WxH, spp) config:
  * ``<out>.npz``  — per-tile channel means, per-tile SEM (from the film's
    E[x²] lanes), global mean, heat mean, and the config;
  * ``<out>.png``  — gamma-2.2 frame (from-scratch PNG writer).

The render uses the scan-rolled launch (bit-identical to the unrolled
default — tests/test_scan.py) so the graph compiles quickly everywhere;
results are cadence/pool-invariant by construction, so these stats lock
the *estimator*, not the execution schedule.

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
                  steps: int = 48):
    from cuda_volpath_tpu.config import RenderSettings
    from cuda_volpath_tpu.render import integrator
    from cuda_volpath_tpu import scenes

    scene_fn = scenes.cloud if scene_name == "cloud" else scenes.flagship
    scene, cam, _ = scene_fn(n=256)
    settings = RenderSettings(use_scan=True, steps_per_launch=steps)
    film = integrator.render(scene, cam, settings, width, height, spp)
    return film, settings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="flagship",
                    choices=["flagship", "cloud"])
    ap.add_argument("--size", default="240x128")
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--steps", type=int, default=48)
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
    film, _ = render_golden(args.scene, width, height, args.spp, args.steps)
    means, sem = tile_stats(film, width, height)
    img = np.asarray(postprocess.gamma_correct(
        np.asarray(filmmod.image(film))))
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
