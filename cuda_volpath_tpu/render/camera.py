"""Pinhole camera with the reference's exact ray-generation convention.

The reference builds a glm::lookAt view matrix on the host, inverts and
transposes it, and uploads three rows to ``c_invViewMatrix``
(src/volumeRender.cpp:617-625); the kernel then generates per-pixel rays as

    u = (2x - W) / W,  v = (2y - H) / W         (kernel.cu:1977-1978)
    dir_cam = (u, v, -1 / tan(fovx * pi/360))   (kernel.cu:1981-1985, fovx=54.43)
    origin  = invView * (0,0,0,1),  dir = normalize(invView_rot * dir_cam)

Here the camera is a small pytree of basis vectors; ray generation is a
pure whole-image function.  Orbit/pan/zoom mirror the GLUT mouse handlers
(src/volumeRender.cpp:791-853).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..ops import vecmath as vm

FOVX_DEG = 54.43
# -1/tan(fovx * 0.00872664626) with the reference's magic constant (pi/360).
_FOCAL = 1.0 / np.tan(FOVX_DEG * 0.00872664626)


@struct.dataclass
class Camera:
    position: jnp.ndarray   # (3,)
    forward: jnp.ndarray    # (3,) unit
    up: jnp.ndarray         # (3,) unit
    focus_dist: jnp.ndarray  # scalar


def make_camera(position=(3.922986, -0.782739, 0.030000),
                forward=(-0.978148, 0.207912, 0.000000),
                up=(0.207912, 0.978148, -0.000000),
                focus_dist=4.0) -> Camera:
    """Defaults are the reference's initial view (src/volumeRender.cpp:108-112)."""
    return Camera(position=jnp.asarray(position, jnp.float32),
                  forward=vm.normalize(jnp.asarray(forward, jnp.float32)),
                  up=jnp.asarray(up, jnp.float32),
                  focus_dist=jnp.asarray(focus_dist, jnp.float32))


def basis(cam: Camera):
    """lookAt-derived world basis: s (right), u (true up), f (forward).

    glm::lookAt uses s = normalize(cross(f, up)), u = cross(s, f); the
    inverse view rotation has columns (s, u, -f), so a camera-space direction
    (a, b, c) maps to a*s + b*u - c*f.
    """
    f = vm.normalize(cam.forward)
    s = vm.normalize(vm.cross(f, cam.up))
    u = vm.cross(s, f)
    return s, u, f


def generate_rays(cam: Camera, width: int, height: int,
                  px: jnp.ndarray, py: jnp.ndarray):
    """Rays for integer pixel coords ``(px, py)`` (any shape).

    Returns ``(origins, directions)`` of shape ``px.shape + (3,)``.  Matches
    the kernel exactly: no sub-pixel jitter, both u and v divided by width.
    """
    s, u, f = basis(cam)
    uu = (2.0 * px.astype(jnp.float32) - width) / width
    vv = (2.0 * py.astype(jnp.float32) - height) / width
    d = (s * uu[..., None] + u * vv[..., None] + f * jnp.float32(_FOCAL))
    d = vm.normalize(d)
    o = jnp.broadcast_to(cam.position, d.shape)
    return o, d


def orbit(cam: Camera, dx: float, dy: float) -> Camera:
    """Left-drag orbit about the focus point (volumeRender.cpp:819-833).

    Rotates forward/up by -dx/5 degrees about up and -dy/5 about right,
    then repositions the eye on the focus sphere.
    """
    s, u, f = basis(cam)
    center = cam.position + cam.forward * cam.focus_dist

    def rot(axis, deg):
        a = vm.normalize(axis)
        th = jnp.deg2rad(jnp.float32(deg))
        c, si = jnp.cos(th), jnp.sin(th)
        x, y, z = a[0], a[1], a[2]
        return jnp.array([
            [c + x * x * (1 - c), x * y * (1 - c) - z * si, x * z * (1 - c) + y * si],
            [y * x * (1 - c) + z * si, c + y * y * (1 - c), y * z * (1 - c) - x * si],
            [z * x * (1 - c) - y * si, z * y * (1 - c) + x * si, c + z * z * (1 - c)],
        ], jnp.float32)

    r = rot(cam.up, -dx / 5.0) @ rot(s, -dy / 5.0)
    fwd = vm.normalize(r @ cam.forward)
    up = r @ cam.up
    pos = center - fwd * cam.focus_dist
    return cam.replace(position=pos, forward=fwd, up=up)


def pan(cam: Camera, dx: float, dy: float) -> Camera:
    """Right-drag pan (volumeRender.cpp:799-804)."""
    s, u, f = basis(cam)
    pos = (cam.position - s * (dx / 1000.0) * cam.focus_dist
           + u * (dy / 1000.0) * cam.focus_dist)
    return cam.replace(position=pos)


def zoom(cam: Camera, delta: float) -> Camera:
    """Wheel/middle-drag zoom toward the focus point (volumeRender.cpp:844-853)."""
    center = cam.position + cam.forward * cam.focus_dist
    fd = cam.focus_dist + delta
    return cam.replace(position=center - cam.forward * fd,
                       focus_dist=jnp.asarray(fd, jnp.float32))
