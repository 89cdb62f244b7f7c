"""Sun/sky environment bake.

Mirrors ``update_sunsky`` (reference src/volumeRender.cpp:261-345): place
the sun from normalized (x, y) mouse coordinates, bake a 1024×512 lat-long
envmap of the Hosek sky (top hemisphere) plus a constant ground-reflection
row block (bottom hemisphere), and produce the directional sun constants.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..models.skydome import Skydome
from . import envmap as envmod
from . import sun as sunmod

SUNSKY_SCALE = 0.02          # volumeRender.cpp:292
GROUND_ALBEDO = 0.01         # volumeRender.cpp:317
BAKE_WIDTH, BAKE_HEIGHT = 1024, 512   # volumeRender.cpp:285


def sun_angles_from_xy(x: float, y: float) -> Tuple[float, float]:
    """Mouse-normalized (x, y) → (phi, theta) (volumeRender.cpp:280-289):
    y is halved and clamped below the horizon."""
    y = np.clip(y * 0.5, 0.0, 0.49999)
    return x * 2.0 * np.pi, y * np.pi


def bake(x: float = 0.5, y: float = 0.2, sky=None,
         width: int = BAKE_WIDTH, height: int = BAKE_HEIGHT,
         bake_sun: bool = False):
    """Returns (envmap_image (H,W,3) float32, sun_dir, sun_power_disk).

    ``sun_power_disk`` is the disc radiance × SUNSKY_SCALE — the value the
    reference passes to set_sun (volumeRender.cpp:294-330); callers convert
    it to directional irradiance with sun.disk_to_directional.
    If ``bake_sun``, the solar disc is baked into the envmap instead and the
    returned sun power is zero (volumeRender.cpp:291,328).

    ``sky`` is any model with the SkyModel facade shape (sunsky.h:6-25):
    the Tungsten/Hosek ``models.skydome.Skydome`` (default, like the
    reference build) or ``models.sky_preetham.PreethamSunSky``.
    """
    if sky is None:
        sky = Skydome()
    phi, theta = sun_angles_from_xy(x, y)
    sky.set_sun_angles(phi, theta)

    sun_dir = sky.sun_dir()
    sun_power = sky.sun_color() * SUNSKY_SCALE

    # top hemisphere: sky radiance; direction must match Envmap::uv_to_dir
    # (volumeRender.cpp:305-313 uses u = i/width, v = j/height).
    j = np.arange(height // 2)
    i = np.arange(width)
    ph = (i / width) * 2.0 * np.pi
    th = (j / height) * np.pi
    st, ct = np.sin(th)[:, None], np.cos(th)[:, None]
    d = np.stack([st * np.sin(ph)[None, :],
                  np.broadcast_to(ct, (height // 2, width)),
                  st * -np.cos(ph)[None, :]], axis=-1)
    top = sky.sky_color(d, cel=bake_sun) * SUNSKY_SCALE

    # bottom hemisphere: diffuse ground lit by the sun
    # (volumeRender.cpp:315-321)
    disk_solid = np.pi * sunmod.SUN_DISK_RADIUS ** 2
    ground = GROUND_ALBEDO * sun_dir[1] * sun_power * disk_solid
    bottom = np.broadcast_to(ground, (height - height // 2, width, 3))

    image = np.concatenate([top, bottom], axis=0).astype(np.float32)
    if bake_sun:
        sun_power = np.zeros(3)
    return image, sun_dir.astype(np.float32), sun_power.astype(np.float32)


def make_envmap_and_sun(x: float = 0.5, y: float = 0.2, **kw):
    """One-call scene lighting: (Envmap, sun_dir, sun_power_directional,
    sun_power_original)."""
    img, sun_dir, sun_power_disk = bake(x, y, **kw)
    env = envmod.build(img)
    directional = np.asarray(sun_power_disk) * np.pi * sunmod.SUN_DISK_RADIUS ** 2
    return env, sun_dir, directional.astype(np.float32), sun_power_disk
