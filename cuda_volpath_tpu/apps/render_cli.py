"""Headless render-job runner — the TPU-native equivalent of the
reference's interactive shell (src/volumeRender.cpp:1284-1403 ``main`` +
the display/frame loop :613-672).

Where the reference drives one kernel launch per frame inside a GLUT loop
and mutates parameters from hot-keys, this runs a progressive render to a
target spp with periodic throughput reporting (the "M samples / s" meter,
volumeRender.cpp:634-638), capture-style outputs (PPM + HDR, ``capture``
volumeRender.cpp:585-610), a heat AOV, and checkpoint/resume of the film
(SURVEY.md §5 — the reference can only reset, never persist).

Usage examples:

    python -m cuda_volpath_tpu.apps.render_cli --scene flagship --spp 64
    python -m cuda_volpath_tpu.apps.render_cli --scene blob --size 320x180 \
        --tracker delta --preset 3 -o blob.ppm
    python -m cuda_volpath_tpu.apps.render_cli --volume cloud.vdb --spp 256 \
        --sun 0.5 0.2 --checkpoint run.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cuda-volpath-tpu",
        description="TPU-native volumetric path tracer (render job runner)")
    p.add_argument("--scene", default="flagship",
                   choices=["flagship", "cloud", "blob"],
                   help="built-in scene (ignored if --volume is given)")
    p.add_argument("--volume", default=None,
                   help="volume file: .vdb, .bin (w/h/d header), or .npz")
    p.add_argument("--size", default="960x512",
                   help="WxH (reference default 960x512)")
    p.add_argument("--spp", type=int, default=32)
    p.add_argument("--sample-offset", type=int, default=0,
                   help="render the absolute per-pixel sample range "
                   "[offset, offset+spp): disjoint ranges on independent "
                   "hosts reproduce exactly the samples one render would "
                   "(RNG is (pixel, sample)-keyed) and their checkpoints "
                   "merge losslessly with tools/merge_films.py — "
                   "zero-communication multi-host scale-out.  Must be a "
                   "multiple of the work-item size (8 by default)")
    p.add_argument("--tracker", default="decomp",
                   choices=["delta", "bounded", "decomp"])
    p.add_argument("--filter", default="nearest",
                   choices=["nearest", "linear"],
                   help="density filtering ('f' toggle in the reference)")
    p.add_argument("--shadow", default="binary",
                   choices=["ratio", "binary"],
                   help="shadow transmittance estimator: 'binary' is the "
                   "reference's Tr_spectral (kernel.cu:754) with early "
                   "termination, 'ratio' its lower-variance refinement")
    p.add_argument("--spectral", default="spectral",
                   choices=["spectral", "multi_channel", "mono"],
                   help="chromatic strategy (kernel.cu:23-27): 'spectral' "
                   "joint-RGB tracking (reference default), "
                   "'multi_channel' one wavelength per sample "
                   "(MULTI_CHANNEL=1), 'mono' achromatic")
    p.add_argument("--envmap", default=None, metavar="FILE.hdr",
                   help="use a Radiance .hdr image as the environment "
                   "light instead of the baked sunsky (the reference's "
                   "EnvMapLoader, volumeRender.cpp:223-236)")
    p.add_argument("--envmap-brightness", type=float, default=1.0,
                   metavar="K", help="scale applied to --envmap radiance "
                   "(EnvMapLoader's k_brightness)")
    p.add_argument("--envmap-mode", default="passive",
                   choices=["passive", "mis"],
                   help="'passive': envmap contributes only when a path "
                   "escapes (PASSIVE_ENVMAP=1, reference default); 'mis': "
                   "one-sample MIS with the luminance CDF at every "
                   "scatter (kernel.cu:1494-1569)")
    p.add_argument("--ev-budget", type=float, default=1.0,
                   help="segment scale-selection event budget")
    p.add_argument("--preset", type=int, default=None,
                   help="material preset index 0-12 (space key cycle)")
    p.add_argument("--density", type=float, default=800.0)
    p.add_argument("--brightness", type=float, default=1.0)
    p.add_argument("--albedo", type=float, nargs=3, default=(1.0, 1.0, 1.0))
    p.add_argument("--g", type=float, default=0.877)
    p.add_argument("--sigma-t", type=float, nargs=3, default=(1.0, 1.0, 1.0))
    p.add_argument("--sun", type=float, nargs=2, default=(0.5, 0.2),
                   metavar=("X", "Y"), help="sun direction (x, y) as in "
                   "setup_sunsky(0.5, 0.2)")
    p.add_argument("--no-sun", action="store_true",
                   help="disable explicit sun NEE (SUN_LIGHT=0)")
    p.add_argument("--no-opacity-cache", action="store_true",
                   help="disable the baked-opacity NEE shortcut")
    p.add_argument("--max-depth", type=int, default=800)
    p.add_argument("--pool", type=int, default=None,
                   help="wavefront pool size (default min(npix, 2^19))")
    p.add_argument("--steps-per-launch", type=int, default=None,
                   help="micro-steps per launch (default: config)")
    p.add_argument("--samples-per-item", type=int, default=None,
                   help="consecutive samples per work item (default: "
                   "config; 8 is the long-render optimum, 4 measured "
                   "better for spp <~ 300 — BENCH.md round 5)")
    p.add_argument("--flush-every", type=int, default=None,
                   help="film-flush cadence in housekeeping periods "
                   "(default: config)")
    p.add_argument("--heat-order", action="store_true",
                   help="two-phase render: one work item per pixel first, "
                   "then the rest with the work queue permuted "
                   "hardest-pixel-first (LPT makespan scheduling — "
                   "shrinks the straggler drain; the rendered result is "
                   "unchanged because RNG streams are "
                   "(pixel, sample)-keyed)")
    p.add_argument("--orbit", type=float, nargs=2, default=None,
                   metavar=("DX", "DY"), help="orbit the default camera")
    p.add_argument("--zoom", type=float, default=None)
    p.add_argument("-o", "--output", default="output0.ppm",
                   help=".ppm (gamma) output path; .hdr is written alongside")
    p.add_argument("--heat", default=None,
                   help="write the scatter-count heat AOV as .ppm")
    p.add_argument("--denoise", action="store_true",
                   help="apply the edge-aware denoiser post-pass")
    p.add_argument("--firefly-clamp", type=float, default=None,
                   metavar="NSIGMA", nargs="?", const=8.0,
                   help="variance-aware firefly suppression before "
                   "display output (opt-in; biased — see "
                   "postprocess.firefly_clamp)")
    p.add_argument("--checkpoint", default=None,
                   help="film checkpoint path (.npz); resumes if it exists")
    p.add_argument("--checkpoint-every", type=float, default=0.0,
                   metavar="SECONDS",
                   help="periodically snapshot the film to --checkpoint "
                   "while rendering (atomic tmp+rename), so an interrupt "
                   "or a backend/tunnel failure loses at most this much "
                   "work.  Each snapshot pulls the full film to the host "
                   "(~16 MB at 960x512) — use minutes, not seconds, on "
                   "remote-TPU tunnels.  0 = final checkpoint only")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the render into "
                   "DIR (the TPU-native analog of the reference's "
                   "per-launch Msamples/s timer + SdkTimer, "
                   "volumeRender.cpp:634,78-94; open with TensorBoard or "
                   "Perfetto)")
    p.add_argument("--report-every", type=float, default=2.0,
                   help="seconds between throughput reports")
    return p


def _load_scene(args, param):
    from .. import scenes
    from ..render.scene import (make_scene, materials_from_param,
                                make_material, MATERIAL_PRESETS)
    from ..lighting import sunsky as sunskymod

    if args.preset is not None:
        mat = make_material(*MATERIAL_PRESETS[args.preset % 13])
        mat = mat.replace(density=np.float32(param.density),
                          brightness=np.float32(param.brightness))
    else:
        mat = materials_from_param(param)

    if args.volume is not None:
        from ..volume import loaders
        path = args.volume
        if path.endswith(".npz"):
            vol = np.load(path)["vol"]
        elif path.endswith(".vdb"):
            vol = loaders.load_vdb(path, quantized=False)
        else:
            vol = loaders.load_binary(path, quantized=False)
        env, sun_dir, sun_directional, sun_disk = \
            sunskymod.make_envmap_and_sun(*args.sun)
        scene = make_scene(vol, mat, envmap=env, sun_dir=sun_dir,
                           sun_power=sun_directional,
                           sun_power_original=sun_disk)
        from ..render import camera as cammod
        cam = cammod.make_camera()
    elif args.scene == "flagship":
        scene, cam, _ = scenes.flagship(
            sun_x=args.sun[0], sun_y=args.sun[1],
            bake_opacity=not args.no_opacity_cache)
        scene = scene.replace(mat=mat)
    elif args.scene == "cloud":
        scene, cam, _ = scenes.cloud(
            sun_x=args.sun[0], sun_y=args.sun[1],
            bake_opacity=not args.no_opacity_cache)
        scene = scene.replace(mat=mat)
    else:
        scene, cam, _ = scenes.gaussian_blob(32)
        scene = scene.replace(mat=mat)
    return scene, cam


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    from ..runtime import configure_jax
    configure_jax()  # JAX_PLATFORMS pin + persistent compile cache
    import jax.numpy as jnp
    from ..config import (Param, RenderSettings, Tracker, FilterMode,
                          ShadowMode, SpectralMode, EnvmapMode)
    from ..render import camera as cammod
    from ..render import film as filmmod
    from ..render import integrator
    from ..render import postprocess
    from ..io import ppm as ppmio
    from ..io import hdr as hdrio

    try:
        width, height = (int(v) for v in args.size.lower().split("x"))
    except ValueError:
        print(f"error: --size must be WxH (e.g. 960x512), got {args.size!r}",
              file=sys.stderr)
        return 2
    param = Param(width=width, height=height, density=args.density,
                  brightness=args.brightness, albedo=tuple(args.albedo),
                  g=args.g, sigma_t=tuple(args.sigma_t))
    settings = RenderSettings(
        tracker=Tracker(args.tracker),
        spectral=SpectralMode(args.spectral),
        envmap_mode=EnvmapMode(args.envmap_mode),
        filter_mode=FilterMode(args.filter),
        shadow_mode=ShadowMode(args.shadow),
        ev_budget=args.ev_budget,
        sun_light=not args.no_sun,
        precompute_opacity=not args.no_opacity_cache,
        max_depth=args.max_depth,
        **({"steps_per_launch": args.steps_per_launch}
           if args.steps_per_launch else {}),
        **({"samples_per_item": args.samples_per_item}
           if args.samples_per_item else {}),
        **({"flush_every": args.flush_every}
           if args.flush_every else {}))

    t0 = time.time()
    scene, cam = _load_scene(args, param)
    if args.envmap:
        from ..lighting import envmap as envmod
        img = hdrio.read_hdr(args.envmap) * np.float32(
            args.envmap_brightness)
        scene = scene.replace(envmap=envmod.build(img))
    if args.orbit:
        cam = cammod.orbit(cam, *args.orbit)
    if args.zoom:
        cam = cammod.zoom(cam, args.zoom)
    print(f"# scene ready in {time.time() - t0:.1f}s", file=sys.stderr)

    npix = width * height
    pool = args.pool or min(npix, 1 << 19)

    film = None
    sample_offset = args.sample_offset
    prior_counts = 0.0  # per-pixel counts of the loaded film (0 if fresh)
    if args.checkpoint and os.path.exists(args.checkpoint):
        ck = {k: v for k, v in np.load(args.checkpoint).items()}
        # Resume must not re-draw sample indices the film already holds —
        # RNG streams are (pixel, sample)-keyed, so re-rendering the same
        # range adds exact duplicates (inflated spp, zero extra quality).
        # Checkpoints written here record ``next_sample``, the first index
        # no pixel has accumulated; continue there, rounded up to the
        # work-item size (sub-item indices the rounding skips are dropped
        # for every pixel alike — unbiased, each pixel's mean uses its own
        # count).  Pre-field checkpoints fall back to the highest
        # accumulated count, which equals next_sample whenever coverage is
        # a contiguous prefix (it always was before rounding could skip).
        nxt = int(ck.pop("next_sample", -1))
        film = filmmod.from_numpy_state(ck)
        prior_counts = np.asarray(film.count[:-1]).copy()
        if nxt < 0:
            nxt = int(prior_counts.max())
        k = settings.samples_per_item
        resume_off = -(-nxt // k) * k
        sample_offset = max(sample_offset, resume_off)
        print(f"# resumed from {args.checkpoint} "
              f"(mean spp {float(np.mean(np.asarray(filmmod.spp(film)))):.1f}"
              f"; continuing at sample {sample_offset})",
              file=sys.stderr)

    t0 = time.time()
    meter = {"t": t0, "count": 0.0, "ck_t": t0}

    def save_checkpoint(state: dict) -> None:
        """Atomic film snapshot: write-to-tmp + rename, so a crash during
        the save never corrupts the last good checkpoint.  Also records
        ``next_sample`` — the first sample index no pixel has flushed yet:
        within one run every pixel accumulates the contiguous prefix
        [sample_offset, sample_offset + gain), so the largest per-pixel
        gain over the loaded film bounds the flushed range exactly
        (duplicate-free resume; see the load path above)."""
        gain = int((state["count"][:-1] - prior_counts).max())
        state["next_sample"] = sample_offset + max(0, gain)
        tmp = args.checkpoint + ".tmp.npz"
        np.savez_compressed(tmp, **state)
        os.replace(tmp, args.checkpoint)

    def progress(fm):
        now = time.time()
        if args.checkpoint and args.checkpoint_every \
                and now - meter["ck_t"] >= args.checkpoint_every:
            # pull the film to the host and persist it; the host copy also
            # makes interrupt/failure recovery below device-independent
            save_checkpoint(filmmod.to_numpy_state(fm))
            meter["ck_t"] = time.time()
            print(f"# checkpoint -> {args.checkpoint} "
                  f"({time.time() - now:.1f}s)", file=sys.stderr)
        if now - meter["t"] < args.report_every:
            return
        done = float(jnp.sum(fm.count[:-1]))
        rate = (done - meter["count"]) / (now - meter["t"])
        print(f"# {rate / 1e6:.3f} M samples / s, {width} x {height}, "
              f"{done / npix:.1f}/{args.spp} spp", file=sys.stderr)
        meter["t"], meter["count"] = now, done

    import contextlib
    trace_cm = contextlib.nullcontext()
    if args.profile:
        import jax
        trace_cm = jax.profiler.trace(args.profile)
    try:
        with trace_cm:
            order, two_phase = None, False
            if args.heat_order:
                if film is not None and \
                        float(np.max(np.asarray(film.count[:-1]))) > 0:
                    # resumed film: its heat is already a measurement
                    order = integrator.heat_order(film)
                else:
                    two_phase = True
            film = integrator.render(scene, cam, settings, width, height,
                                     args.spp, pool=pool, film=film,
                                     progress_cb=progress,
                                     sample_offset=sample_offset,
                                     pixel_order=order,
                                     heat_ordered=two_phase)
    except KeyboardInterrupt:
        # the device is still alive: snapshot cannot run here (in-flight
        # launches own donated buffers), but periodic checkpoints already
        # persisted the last pulled film
        print("\n# interrupted", file=sys.stderr)
        if args.checkpoint and os.path.exists(args.checkpoint):
            print(f"# last checkpoint kept at {args.checkpoint} — rerun "
                  "the same command to resume", file=sys.stderr)
        return 130
    except Exception as e:  # backend/tunnel failures (device state lost)
        print(f"\n# render failed: {type(e).__name__}: {str(e)[:300]}",
              file=sys.stderr)
        if args.checkpoint and os.path.exists(args.checkpoint):
            print(f"# last checkpoint kept at {args.checkpoint} — rerun "
                  "the same command to resume from it", file=sys.stderr)
        else:
            print("# no checkpoint was configured; progress is lost "
                  "(use --checkpoint PATH --checkpoint-every SECONDS)",
                  file=sys.stderr)
        return 1
    if args.profile:
        print(f"# profiler trace -> {args.profile}", file=sys.stderr)
    total = time.time() - t0
    print(f"# rendered {args.spp} spp in {total:.1f}s "
          f"({npix * args.spp / total / 1e6:.3f} M samples/s)",
          file=sys.stderr)

    if args.checkpoint:
        save_checkpoint(filmmod.to_numpy_state(film))
        print(f"# checkpoint -> {args.checkpoint}", file=sys.stderr)

    img = filmmod.image(film)
    if args.firefly_clamp is not None:
        mean_spp = float(np.mean(np.asarray(filmmod.spp(film))))
        img = postprocess.firefly_clamp(
            img, filmmod.variance(film) / max(mean_spp, 1.0),
            nsigma=args.firefly_clamp)
    if args.denoise:
        mean_spp = float(np.mean(np.asarray(filmmod.spp(film))))
        img = postprocess.denoise(
            img, filmmod.heat(film), spp=mean_spp,
            variance=filmmod.variance(film) / max(mean_spp, 1.0))
    out = args.output
    ppmio.write_ppm(out, np.asarray(postprocess.tonemap_display(
        img, settings.gamma)))
    hdrio.write_hdr(os.path.splitext(out)[0] + ".hdr", np.asarray(img))
    print(f"# wrote {out} and "
          f"{os.path.splitext(out)[0] + '.hdr'}", file=sys.stderr)
    if args.heat:
        ht = np.asarray(filmmod.heat(film))
        ppmio.write_ppm(args.heat, np.repeat(
            (ht / max(ht.max(), 1e-6))[..., None], 3, axis=-1))
        print(f"# wrote {args.heat}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
