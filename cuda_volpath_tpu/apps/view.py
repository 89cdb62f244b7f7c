"""Interactive terminal viewer — the TPU-native equivalent of the
reference's GLUT window (src/volumeRender.cpp:1284-1403, callbacks
:655-874).

Progressive accumulation renders into an ANSI-truecolor half-block canvas
(two pixels per character cell); the accumulation resets whenever the
camera or material changes, exactly like ``fb->reset()`` on input
(volumeRender.cpp:769, 835-841).  Because the camera and all material
parameters are *traced arguments* of the compiled launch, interaction
never recompiles — the TPU analog of the reference's per-frame
``c_invViewMatrix`` upload.

Keys (reference keyboard/motion handlers, volumeRender.cpp:674-874):

  h/j/k/l or arrows  orbit            +/-   density
  H/J/K/L            pan (right-drag, volumeRender.cpp:799-804)
  i/o                zoom             [/]   brightness
  space              cycle material   x/z   albedo up/down
  r                  random material  a/s   HG anisotropy g
  n                  denoise toggle   c     capture output{N}.ppm/.hdr
  f                  filter toggle (point/linear; both graphs pre-warmed
                     at startup — pass --no-prewarm to compile lazily)
  q                  quit

Run: python -m cuda_volpath_tpu.apps.view --scene blob --size 192x104
"""

from __future__ import annotations

import argparse
import os
import select
import sys
import termios
import time
import tty

import numpy as np


def _half_block_frame(img: np.ndarray) -> str:
    """(H, W, 3) floats in [0,1] → ANSI truecolor half-block text."""
    data = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    h, w = data.shape[:2]
    if h % 2:
        data = np.concatenate([data, np.zeros((1, w, 3), np.uint8)])
        h += 1
    out = []
    for y in range(0, h, 2):
        row = []
        for x in range(w):
            t, b = data[y, x], data[y + 1, x]
            row.append(f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m"
                       f"\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀")
        out.append("".join(row) + "\x1b[0m")
    return "\n".join(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cuda-volpath-tpu-view")
    ap.add_argument("--scene", default="blob", choices=["flagship", "blob",
                                                        "cloud"])
    ap.add_argument("--size", default="160x88")
    ap.add_argument("--pool", type=int, default=None)
    ap.add_argument("--steps-per-launch", type=int, default=32)
    ap.add_argument("--density", type=float, default=None)
    ap.add_argument("--no-prewarm", action="store_true",
                    help="skip pre-compiling the alternate filter graph at "
                         "startup ('f' then compiles on first press)")
    args = ap.parse_args(argv)

    from ..runtime import configure_jax
    configure_jax()  # JAX_PLATFORMS pin + persistent compile cache: a
    # previously-seen (size, settings) graph loads in seconds instead of
    # recompiling (ROADMAP: the viewer used to re-jit per resolution)
    import jax.numpy as jnp
    from .. import scenes
    from ..config import Param, RenderSettings
    from ..render import camera as cammod
    from ..render import film as filmmod
    from ..render import integrator
    from ..render import postprocess
    from ..render.scene import (MATERIAL_PRESETS, make_material,
                                materials_from_param)
    from ..io import ppm as ppmio
    from ..io import hdr as hdrio

    width, height = (int(v) for v in args.size.lower().split("x"))
    print(f"loading scene {args.scene}…", file=sys.stderr)
    # no sun-opacity cache in the viewer: the sun is draggable ('u/y/U/Y')
    # and the cache would need a re-bake on every move (the reference's
    # opacity_dirty path, volumeRender.cpp:335-344)
    sun_xy = [0.5, 0.2]
    if args.scene == "flagship":
        scene, cam, param = scenes.flagship(bake_opacity=False)
    elif args.scene == "cloud":
        scene, cam, param = scenes.cloud(bake_opacity=False)
    else:
        scene, cam, param = scenes.gaussian_blob(32)
    if args.density is not None:
        scene = scene.replace(mat=scene.mat.replace(
            density=jnp.float32(args.density)))

    settings = RenderSettings(steps_per_launch=args.steps_per_launch,
                              precompute_opacity=False)
    pool = args.pool or min(width * height, 1 << 18)

    # Density filtering is a static of the compiled step (the reference
    # flips the texture object at runtime, kernel.cu:422-439) — one launch
    # per FilterMode, compiled lazily on first 'f' press.
    from ..config import FilterMode
    launches = {}

    def get_launch(fm):
        if fm not in launches:
            sys.stderr.write(f"\rcompiling {fm.value} filter graph… "
                             "(one-time)\n")
            sys.stderr.flush()
            s2 = settings.replace(filter_mode=fm)
            launches[fm] = integrator.make_step_fn(s2, width, height)[1]
        return launches[fm]

    filter_mode = settings.filter_mode
    launch = get_launch(filter_mode)

    def fresh():
        st = integrator.init_state(pool, settings.samples_per_item)
        st = st.replace(total_items=jnp.full((1,), width * height * 1000000,
                                             jnp.int32))
        return st, filmmod.make_film(width, height)

    print("compiling…", file=sys.stderr)
    st, film = fresh()
    st, film = launch(scene, cam, st, film)
    if not args.no_prewarm:
        # pre-warm the 'f'-toggle graph so the first keypress costs a
        # launch, not a compile (persistently cached — near-instant on
        # every later run at this resolution)
        for fm in FilterMode:
            if fm != filter_mode:
                wst, wfilm = fresh()
                get_launch(fm)(scene, cam, wst, wfilm)
    denoise_on = False
    preset = -1
    capture_idx = 0

    fd = sys.stdin.fileno()
    old_attrs = termios.tcgetattr(fd)
    tty.setcbreak(fd)
    t_last = time.time()
    try:
        sys.stdout.write("\x1b[2J")  # clear
        while True:
            st, film = launch(scene, cam, st, film)
            spp_now = float(jnp.sum(film.count[:-1])) / (width * height)

            img = filmmod.image(film)
            if denoise_on:
                img = postprocess.denoise(
                    img, filmmod.heat(film), spp=max(spp_now, 1.0),
                    variance=filmmod.variance(film) / max(spp_now, 1.0))
            disp = np.asarray(postprocess.tonemap_display(img,
                                                          settings.gamma))
            fps = 1.0 / max(time.time() - t_last, 1e-6)
            t_last = time.time()
            mat = scene.mat
            hud = (f"spp {spp_now:7.1f} | {fps:4.1f} fps | density "
                   f"{float(mat.density):6.1f} | g {float(mat.g):.3f} | "
                   f"bright {float(mat.brightness):.2f} | "
                   f"{filter_mode.value} | "
                   f"{'denoise ' if denoise_on else ''}q quits")
            sys.stdout.write("\x1b[H" + _half_block_frame(disp) + "\n"
                             + hud + "\x1b[K\n")
            sys.stdout.flush()

            # drain pending keys
            reset = False
            while select.select([sys.stdin], [], [], 0)[0]:
                ch = sys.stdin.read(1)
                if ch == "q":
                    return 0
                elif ch in "hjkl":  # orbit (arrow keys send escapes; ignore)
                    dx = {"h": -40.0, "l": 40.0}.get(ch, 0.0)
                    dy = {"j": 40.0, "k": -40.0}.get(ch, 0.0)
                    cam = cammod.orbit(cam, dx, dy)
                    reset = True
                elif ch in "HJKL":  # pan (the reference's right-drag)
                    dx = {"H": -40.0, "L": 40.0}.get(ch, 0.0)
                    dy = {"J": 40.0, "K": -40.0}.get(ch, 0.0)
                    cam = cammod.pan(cam, dx, dy)
                    reset = True
                elif ch == "i":
                    cam = cammod.zoom(cam, -0.2)
                    reset = True
                elif ch == "o":
                    cam = cammod.zoom(cam, 0.2)
                    reset = True
                elif ch == "+":
                    scene = scene.replace(mat=mat.replace(
                        density=mat.density + 10.0))
                    reset = True
                elif ch == "-":
                    scene = scene.replace(mat=mat.replace(
                        density=jnp.maximum(mat.density - 10.0, 1.0)))
                    reset = True
                elif ch == "[":
                    scene = scene.replace(mat=mat.replace(
                        brightness=mat.brightness / 1.1))
                    reset = True
                elif ch == "]":
                    scene = scene.replace(mat=mat.replace(
                        brightness=mat.brightness * 1.1))
                    reset = True
                elif ch == "x":
                    scene = scene.replace(mat=mat.replace(
                        albedo=jnp.minimum(mat.albedo + 0.01, 1.0)))
                    reset = True
                elif ch == "z":
                    scene = scene.replace(mat=mat.replace(
                        albedo=jnp.maximum(mat.albedo - 0.01, 0.0)))
                    reset = True
                elif ch == "a":
                    scene = scene.replace(mat=mat.replace(
                        g=jnp.minimum(mat.g + 0.02, 0.99)))
                    reset = True
                elif ch == "s":
                    scene = scene.replace(mat=mat.replace(
                        g=jnp.maximum(mat.g - 0.02, -0.99)))
                    reset = True
                elif ch == " ":
                    preset = (preset + 1) % len(MATERIAL_PRESETS)
                    m = make_material(*MATERIAL_PRESETS[preset])
                    scene = scene.replace(mat=m.replace(
                        density=mat.density, brightness=mat.brightness))
                    reset = True
                elif ch == "r":
                    rs = np.random.rand(6) * np.array([5, 5, 5, .1, .1, .1])
                    m = make_material(*rs)
                    scene = scene.replace(mat=m.replace(
                        density=mat.density, brightness=mat.brightness))
                    reset = True
                elif ch in "uyUY":
                    # sun placement (the reference's 'k'+drag sun mode,
                    # volumeRender.cpp:807-817): re-bake the Hosek sky —
                    # same shapes, so no recompile
                    from ..lighting import sunsky as sunskymod
                    step_xy = {"u": (0.05, 0), "y": (-0.05, 0),
                               "U": (0, 0.05), "Y": (0, -0.05)}[ch]
                    sun_xy[0] += step_xy[0]
                    sun_xy[1] = float(np.clip(sun_xy[1] + step_xy[1],
                                              0.01, 1.0))
                    env, sdir, spow, sdisk = \
                        sunskymod.make_envmap_and_sun(*sun_xy)
                    scene = scene.replace(envmap=env, sun_dir=sdir,
                                          sun_power=spow,
                                          sun_power_original=sdisk)
                    reset = True
                elif ch == "f":
                    # point/linear density filtering ('f',
                    # volumeRender.cpp:744-747 → set_texture_filter_mode)
                    filter_mode = (FilterMode.LINEAR
                                   if filter_mode == FilterMode.NEAREST
                                   else FilterMode.NEAREST)
                    launch = get_launch(filter_mode)
                    reset = True
                elif ch == "n":
                    denoise_on = not denoise_on
                elif ch == "c":
                    while os.path.exists(f"output{capture_idx}.ppm"):
                        capture_idx += 1
                    ppmio.write_ppm(f"output{capture_idx}.ppm", disp)
                    hdrio.write_hdr(f"output{capture_idx}.hdr",
                                    np.asarray(img))
            if reset:
                st, film = fresh()
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old_attrs)
        sys.stdout.write("\x1b[0m\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
