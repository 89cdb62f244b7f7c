"""Run the five BASELINE.json benchmark configurations end-to-end.

BASELINE.json names five configs derived from the reference's feature
matrix (SURVEY.md §6).  Each run here prewarms every graph (main pool +
drain ladder) off the clock — the reference's per-frame meter equally
excludes compilation — then times the progressive render to the target
spp and prints one JSON line.  Frames for docs go to docs/img/.

  1  procedural Julia-set volume, monochrome delta tracking + HG phase
     (512² @ 64 spp)                    [kernel.cu __d_render, mono path]
  2  chromatic volume via spectral tracking + sunsky environment light
     (512² @ 256 spp)                   [kernel.cu __d_render, SPECTRAL]
  3  WDAS-class cloud → dense grid, decomposition tracking with local
     density bounds (960×512 @ 256 spp) [__d_render_bounded_decomp]
  4  high-albedo cloud with reduced scattering coefficients + HDR envmap
     (960×512 @ 256 spp)                [hyperion schedule + EnvMapLoader]
  5  full wavefront pipeline: 1080p @ 1000 spp progressive accumulation
     + denoiser post-pass               [the north-star-scale end-to-end]

Usage:
  python tools/baseline_configs.py 1 2       # run configs 1 and 2
  python tools/baseline_configs.py all
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS_IMG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "img")


def _hdr_envmap_from_sunsky(tmpdir: str):
    """Round-trip the baked sunsky through the Radiance .hdr codec and
    rebuild the light from the file — the reference's EnvMapLoader path
    (volumeRender.cpp:223-236) driven by our own writer (io/hdr.py)."""
    import numpy as np
    from cuda_volpath_tpu import scenes
    from cuda_volpath_tpu.io import hdr as hdrio
    from cuda_volpath_tpu.lighting import envmap as envmod
    env, _, _, _ = scenes._cached_sunsky(0.5, 0.2)
    path = os.path.join(tmpdir, "sunsky_envmap.hdr")
    hdrio.write_hdr(path, np.asarray(env.image), flip_y=False)
    img = hdrio.read_hdr(path, flip_y=False)
    return envmod.build(img)


def run_config(n: int, spp_override=None):
    import numpy as np
    from cuda_volpath_tpu import scenes
    from cuda_volpath_tpu.config import (RenderSettings, Tracker,
                                         SpectralMode)
    from cuda_volpath_tpu.render import film as filmmod, integrator
    from cuda_volpath_tpu.render import postprocess
    from cuda_volpath_tpu.io.png import write_png

    if n in (1, 2):
        w, h, pool = 512, 512, 1 << 19
        spp = 64 if n == 1 else 256
        scene, cam, _ = scenes.flagship(bake_opacity=False)
        settings = RenderSettings(
            tracker=Tracker.DELTA,
            spectral=SpectralMode.MONO if n == 1 else SpectralMode.SPECTRAL,
            precompute_opacity=False, steps_per_launch=120)
        desc = ("julia_mono_delta_512" if n == 1
                else "julia_spectral_delta_512")
    elif n in (3, 4):
        w, h, pool, spp = 960, 512, 1 << 20, 256
        scene, cam, _ = scenes.cloud(bake_opacity=True)
        settings = RenderSettings(steps_per_launch=120)
        desc = "cloud_decomp_960x512"
        if n == 4:
            scene = scene.replace(envmap=_hdr_envmap_from_sunsky("/tmp"))
            desc = "cloud_high_albedo_hdr_envmap_960x512"
    elif n == 5:
        w, h, pool, spp = 1920, 1080, 1 << 20, 1000
        scene, cam, _ = scenes.cloud(bake_opacity=True)
        settings = RenderSettings(steps_per_launch=120)
        desc = "cloud_1080p_denoised"
    else:
        raise SystemExit(f"unknown config {n}")
    if spp_override:
        spp = spp_override

    t0 = time.time()
    integrator.prewarm_drain(scene, cam, settings, w, h, pool)
    print(f"# config {n}: warmed graphs in {time.time() - t0:.0f}s",
          file=sys.stderr)

    t0 = time.time()
    stats = {}
    film = integrator.render(scene, cam, settings, w, h, spp,
                             pool=pool, stats=stats)
    dt = time.time() - t0
    mean_spp = float(np.mean(np.asarray(filmmod.spp(film))))

    img = filmmod.image(film)
    denoise_s = 0.0
    if n == 5:
        t1 = time.time()
        img = postprocess.denoise(
            img, filmmod.heat(film), spp=mean_spp,
            variance=filmmod.variance(film) / max(mean_spp, 1.0))
        float(img.sum())  # force execution (lazy tunnel)
        denoise_s = time.time() - t1

    os.makedirs(DOCS_IMG, exist_ok=True)
    out = os.path.join(DOCS_IMG, f"baseline_cfg{n}_{desc}.png")
    write_png(out, np.asarray(postprocess.tonemap_display(img)))

    rec = {"config": n, "desc": desc, "size": f"{w}x{h}", "spp": spp,
           "seconds": round(dt, 1), "mean_spp": round(mean_spp, 1),
           "samples_per_s": round(w * h * mean_spp / dt),
           **{k: v for k, v in stats.items() if k != "drain_log"}}
    if n == 5:
        rec["denoise_s"] = round(denoise_s, 1)
    print(json.dumps(rec))
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="+",
                    help="config numbers 1-5, or 'all'")
    ap.add_argument("--spp", type=int, default=None,
                    help="override the config's spp (smoke runs)")
    args = ap.parse_args()
    from cuda_volpath_tpu.runtime import configure_jax
    configure_jax()  # JAX_PLATFORMS pin + persistent compile cache
    todo = (range(1, 6) if "all" in args.configs
            else [int(c) for c in args.configs])
    for n in todo:
        run_config(n, spp_override=args.spp)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
