"""Henyey-Greenstein phase function and local shading frame.

Whole-wavefront re-implementation of the reference device classes
``Frame`` (src/volumeRender_kernel.cu:557-573) and ``HGPhaseFunction``
(src/volumeRender_kernel.cu:575-619).  Sampling uses the exact HG inversion
whose pdf equals the evaluation ("perfect inversion"), so phase-sampled
directions need no pdf division.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import vecmath as vm


def make_frame(n: jnp.ndarray):
    """Build an orthonormal basis around ``n`` (kernel.cu:562-568).

    Returns ``(t, b, n)``; the helper axis is (0,1,0) when ``|n.x| > 0.1``
    else (1,0,0), matching the reference branch exactly.
    """
    use_y = jnp.abs(n[..., 0]) > 0.1
    a = jnp.where(use_y[..., None],
                  jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                  jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    t = vm.normalize(vm.cross(a, n))
    b = vm.cross(n, t)
    return t, b, n


def frame_to_world(t, b, n, c: jnp.ndarray) -> jnp.ndarray:
    """Local → world: ``t*c.x + b*c.y + n*c.z`` (kernel.cu:569)."""
    return (t * c[..., 0:1] + b * c[..., 1:2] + n * c[..., 2:3])


def hg_sample_local(g: jnp.ndarray, u0: jnp.ndarray, u1: jnp.ndarray) -> jnp.ndarray:
    """Sample HG direction in the local frame (kernel.cu:580-598).

    Note the reference clamps cos_theta to **[0, 1]** (not [-1, 1]) in the
    anisotropic branch — reproduced verbatim for parity.
    """
    g = jnp.broadcast_to(jnp.asarray(g, jnp.float32), u0.shape)
    s = 2.0 * u0 - 1.0
    f = (1.0 - g * g) / (1.0 + g * s)
    cos_aniso = jnp.clip((0.5 / jnp.where(jnp.abs(g) > 1e-6, g, 1.0))
                         * (1.0 + g * g - f * f), 0.0, 1.0)
    cos_iso = 2.0 * u0 - 1.0
    cos_theta = jnp.where(jnp.abs(g) > 1e-6, cos_aniso, cos_iso)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = jnp.float32(2.0 * vm.M_PI) * u1
    return vm.vec3(jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta)


def hg_sample(g, fwd: jnp.ndarray, u0, u1) -> jnp.ndarray:
    """Sample a world-space scattered direction around ``fwd``
    (kernel.cu:608-612); normalized like the call site (kernel.cu:2301)."""
    t, b, n = make_frame(fwd)
    local = hg_sample_local(g, u0, u1)
    return vm.normalize(frame_to_world(t, b, n, local))


def hg_eval(g, cos_theta: jnp.ndarray) -> jnp.ndarray:
    """HG pdf/eval (kernel.cu:600-603):
    ``(1-g²) / (4π (1+g²-2g·cosθ)^1.5)``."""
    g = jnp.asarray(g, jnp.float32)
    return (1.0 - g * g) / (jnp.float32(4.0 * vm.M_PI)
                            * jnp.power(1.0 + g * g - 2.0 * g * cos_theta, 1.5))


def hg_eval_dir(g, fwd: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """Evaluate against a world direction: cosθ = dot(fwd, dir)
    (kernel.cu:614-618, with frame normal == ray forward)."""
    return hg_eval(g, vm.dot(fwd, direction))
