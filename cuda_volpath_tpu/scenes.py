"""Ready-made scenes, including the flagship benchmark scene.

The reference's default configuration (src/volumeRender.cpp:1284-1398) is
the WDAS cloud VDB with the Hosek sunsky at (x=0.5, y=0.2), material
Param{960×512, density=800, albedo=1, g=0.877, σt=1}; without the VDB it
falls back to the procedural Julia set.  The flagship scene here bakes the
Julia set into a quantized dense grid so the full grid pipeline (uint8
density + bound grid + opacity cache) is exercised, and lights it with the
same sunsky.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .config import Param
from .lighting import sunsky as sunskymod
from .models import julia
from .render import camera as cammod
from .render.scene import Scene, make_scene, materials_from_param
from .volume import opacity as opacitymod

_CACHE = Path(os.environ.get("VOLPATH_CACHE",
                             Path(__file__).parent.parent / ".cache"))


def _cached_julia(n: int) -> np.ndarray:
    _CACHE.mkdir(parents=True, exist_ok=True)
    f = _CACHE / f"julia_{n}.npz"
    if f.exists():
        return np.load(f)["vol"]
    vol = julia.bake(n)
    np.savez_compressed(f, vol=vol)
    return vol


def flagship(n: int = 256, param: Param | None = None,
             sun_x: float = 0.5, sun_y: float = 0.2,
             bake_opacity: bool = True, opacity_dt: float = 0.004,
             search_radius: float = 0.05):
    """Julia-cloud + sunsky benchmark scene.

    Returns (scene, camera, param).  The sun-opacity cache is baked on
    device and disk-cached per (n, sun, dt).
    """
    param = param or Param()
    vol = _cached_julia(n)
    env, sun_dir, sun_directional, sun_disk = \
        sunskymod.make_envmap_and_sun(sun_x, sun_y)

    mat = materials_from_param(param)
    scene = make_scene(vol, mat, envmap=env,
                       sun_dir=sun_dir, sun_power=sun_directional,
                       sun_power_original=sun_disk,
                       search_radius=search_radius, quantize=True)
    if bake_opacity:
        key = f"opacity_{n}_{sun_x}_{sun_y}_{opacity_dt}.npz"
        f = _CACHE / key
        if f.exists():
            od = np.load(f)["od"]
        else:
            od = np.asarray(opacitymod.bake(scene.density, sun_dir,
                                            dt=opacity_dt))
            _CACHE.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(f, od=od)
        scene = scene.replace(opacity=scene.opacity.replace(
            data=jnp.asarray(od)))
    cam = cammod.make_camera()
    return scene, cam, param


def gaussian_blob(n: int = 32, param: Param | None = None, **scene_kw):
    """Small analytic test scene."""
    param = param or Param(density=50.0, g=0.3)
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    r2 = ((xx - c) ** 2 + (yy - c) ** 2 + (zz - c) ** 2) / (n / 3) ** 2
    vol = np.exp(-r2).astype(np.float32)
    mat = materials_from_param(param)
    from .lighting import envmap as envmod
    scene_kw.setdefault("envmap", envmod.constant((0.3, 0.4, 0.55)))
    scene_kw.setdefault("sun_dir", (0.5826, 0.7660, 0.2717))
    scene_kw.setdefault("sun_power", (2.6, 2.5, 2.3))
    scene_kw.setdefault("sun_power_original", (100.0, 100.0, 100.0))
    scene = make_scene(vol, mat, **scene_kw)
    return scene, cammod.make_camera(), param
