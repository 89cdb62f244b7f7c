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


def _cached_sunsky(sun_x: float, sun_y: float):
    """Disk-cached Hosek envmap + sun constants (the CPU bake is ~minutes
    of numpy per scene load; the reference equally re-bakes only when the
    sun moves, volumeRender.cpp:276-345)."""
    _CACHE.mkdir(parents=True, exist_ok=True)
    f = _CACHE / f"sunsky_{sun_x}_{sun_y}.npz"
    from .lighting import envmap as envmod
    if f.exists():
        d = np.load(f)
        return (envmod.build(d["img"]), d["sun_dir"], d["sun_directional"],
                d["sun_disk"])
    img, sun_dir, sun_disk = sunskymod.bake(sun_x, sun_y)
    from .lighting import sun as sunmod
    directional = np.asarray(
        sun_disk * np.pi * sunmod.SUN_DISK_RADIUS ** 2, np.float32)
    np.savez_compressed(f, img=img, sun_dir=sun_dir,
                        sun_directional=directional, sun_disk=sun_disk)
    return envmod.build(img), sun_dir, directional, sun_disk


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
    env, sun_dir, sun_directional, sun_disk = _cached_sunsky(sun_x, sun_y)

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
        from .render.scene import pack_density_opacity
        scene = pack_density_opacity(scene, od)
    cam = cammod.make_camera()
    return scene, cam, param


def _value_noise3(shape, freq, rng):
    """Trilinear value noise at integer lattice frequency ``freq``."""
    g = rng.random((freq + 1, freq + 1, freq + 1)).astype(np.float32)
    zs = np.linspace(0, freq, shape[0], endpoint=False)
    ys = np.linspace(0, freq, shape[1], endpoint=False)
    xs = np.linspace(0, freq, shape[2], endpoint=False)
    z0 = np.floor(zs).astype(int)[:, None, None]
    y0 = np.floor(ys).astype(int)[None, :, None]
    x0 = np.floor(xs).astype(int)[None, None, :]
    fz = (zs - np.floor(zs))[:, None, None]
    fy = (ys - np.floor(ys))[None, :, None]
    fx = (xs - np.floor(xs))[None, None, :]
    def gg(dz, dy, dx):
        return g[z0 + dz, y0 + dy, x0 + dx]
    c00 = gg(0, 0, 0) * (1 - fx) + gg(0, 0, 1) * fx
    c10 = gg(0, 1, 0) * (1 - fx) + gg(0, 1, 1) * fx
    c01 = gg(1, 0, 0) * (1 - fx) + gg(1, 0, 1) * fx
    c11 = gg(1, 1, 0) * (1 - fx) + gg(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def _bake_cloud(n: int, seed: int = 7) -> np.ndarray:
    """Procedural cumulus-like cloud: fBm density inside an ellipsoid
    falloff, smooth and mostly saturated inside — the same content class as
    the reference's WDAS-cloud benchmark (dense interior, wispy boundary),
    for which decomposition tracking was designed."""
    rng = np.random.default_rng(seed)
    shape = (n, n, n)
    fbm = np.zeros(shape, np.float32)
    amp, freq = 1.0, 4
    for _ in range(5):
        fbm += amp * _value_noise3(shape, freq, rng)
        amp *= 0.55
        freq *= 2
    fbm /= fbm.max()
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    r2 = (((xx - c) / (0.42 * n)) ** 2 + ((yy - c) / (0.30 * n)) ** 2
          + ((zz - c) / (0.38 * n)) ** 2)
    falloff = np.clip(1.35 - r2 - 0.9 * fbm, 0.0, 1.0)
    dens = np.clip(falloff * 3.0, 0.0, 1.0)
    dens[dens < 0.02] = 0.0
    return dens.astype(np.float32)


def _cached_cloud(n: int) -> np.ndarray:
    _CACHE.mkdir(parents=True, exist_ok=True)
    f = _CACHE / f"cloud_{n}.npz"
    if f.exists():
        return np.load(f)["vol"]
    vol = _bake_cloud(n)
    np.savez_compressed(f, vol=vol)
    return vol


def cloud(n: int = 256, param: Param | None = None,
          sun_x: float = 0.5, sun_y: float = 0.2,
          bake_opacity: bool = True, opacity_dt: float = 0.004,
          search_radius: float = 0.05):
    """Procedural dense-cloud benchmark scene (WDAS-cloud content class)."""
    param = param or Param()
    vol = _cached_cloud(n)
    env, sun_dir, sun_directional, sun_disk = _cached_sunsky(sun_x, sun_y)
    mat = materials_from_param(param)
    scene = make_scene(vol, mat, envmap=env,
                       sun_dir=sun_dir, sun_power=sun_directional,
                       sun_power_original=sun_disk,
                       search_radius=search_radius, quantize=True)
    if bake_opacity:
        key = f"cloud_opacity_{n}_{sun_x}_{sun_y}_{opacity_dt}.npz"
        f = _CACHE / key
        if f.exists():
            od = np.load(f)["od"]
        else:
            from .volume import opacity as opacitymod
            od = np.asarray(opacitymod.bake(scene.density, sun_dir,
                                            dt=opacity_dt))
            np.savez_compressed(f, od=od)
        from .render.scene import pack_density_opacity
        scene = pack_density_opacity(scene, od)
    return scene, cammod.make_camera(), param


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
