"""Sun light: disk→directional conversion and the escape background.

Reference: src/volumeRender_kernel.cu:1254-1283.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import vecmath as vm
from . import envmap as envmap_mod

# The sun disk cone: dot(dir, sun_dir) > 94 / sqrt(94² + 0.45²)
# (kernel.cu:1263) — a disk of angular radius atan(0.45/94) ≈ 0.274°.
SUN_COS_CONE = 94.0 / np.sqrt(94.0 * 94.0 + 0.45 * 0.45)
# Disk radius used for the solid-angle conversion (kernel.cu:1276).
SUN_DISK_RADIUS = 0.45 / 94.0


def disk_to_directional(sun_power: jnp.ndarray) -> jnp.ndarray:
    """Convert disk radiance to directional irradiance: multiply by the
    sun's projected solid angle π·r² (kernel.cu:1269-1283)."""
    r = jnp.float32(SUN_DISK_RADIUS)
    return sun_power * jnp.float32(np.pi) * r * r


def background(env_image: jnp.ndarray, d: jnp.ndarray, depth: jnp.ndarray,
               sun_dir: jnp.ndarray, sun_power_original: jnp.ndarray,
               sun_light: bool = True) -> jnp.ndarray:
    """Escape radiance (kernel.cu:1258-1267): primary rays (depth==0) that
    hit the sun cone see the original disk radiance; everything else sees
    the envmap."""
    env = envmap_mod.eval_dir(env_image, d)
    if not sun_light:
        return env
    in_sun = (depth == 0) & (vm.dot(d, sun_dir) > jnp.float32(SUN_COS_CONE))
    return jnp.where(in_sun[..., None], sun_power_original, env)
