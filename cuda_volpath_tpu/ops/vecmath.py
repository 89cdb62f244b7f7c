"""Small-vector helpers over ``(..., 3)`` arrays.

The reference carries its own float3 wrapper (src/vecmath.h:9-143, plus the
CUDA SDK's helper_math.h operators).  On TPU the natural representation is a
trailing length-3 axis on whole-wavefront arrays, so every "vec3 op" is a
fused VPU op over N rays at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

M_PI = 3.14159265358979323846
TWO_PI = 2.0 * M_PI
INV_PI = 1.0 / M_PI
INV_TWO_PI = 1.0 / TWO_PI


def vec3(x, y, z) -> jnp.ndarray:
    """Stack three same-shaped arrays (or scalars) into (..., 3)."""
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32),
        jnp.asarray(z, jnp.float32)), axis=-1)


def splat3(s) -> jnp.ndarray:
    """Broadcast a scalar (or (...,) array) to (..., 3)."""
    s = jnp.asarray(s, jnp.float32)
    return jnp.broadcast_to(s[..., None], s.shape + (3,))


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(dot(a, a))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    return a * jax.lax.rsqrt(jnp.sum(a * a, axis=-1, keepdims=True))


def max_of(v: jnp.ndarray) -> jnp.ndarray:
    """max over the trailing length-3 axis (reference kernel.cu:67)."""
    return jnp.max(v, axis=-1)


def min_of(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.min(v, axis=-1)


def avg_of(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(v, axis=-1)


def sum_of(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(v, axis=-1)


def luminance(c: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance (reference kernel.cu:946-954)."""
    return c[..., 0] * 0.2126 + c[..., 1] * 0.7152 + c[..., 2] * 0.0722
