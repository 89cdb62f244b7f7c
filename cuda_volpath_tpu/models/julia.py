"""Procedural quaternion Julia-set density field.

The reference's fallback volume when no VDB is available
(src/volumeRender_kernel.cu:84-140 ``FractalJuliaSet``): iterate
``q <- q² + c`` in quaternion space from ``q0 = (pos * radius, 0)`` with
``c = (-0.2, 0.8, 0, 0)``, radius 1.4, 30 iterations, and emit a binary
density ``iter > 0.9 * maxIter``.

On TPU we provide both an on-the-fly evaluator (pure VPU math, no memory
traffic — useful for tests) and a baked dense grid (the flagship path, so
the renderer exercises the same gather pipeline as real volumes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

RADIUS = 1.4
C = (-0.2, 0.8, 0.0, 0.0)
MAX_ITER = 30


def _quat_sq(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion square (kernel.cu:90-98)."""
    w = q[..., 0]
    v = q[..., 1:]
    r0 = w * w - jnp.sum(v * v, axis=-1)
    rv = v * (2.0 * w)[..., None]
    return jnp.concatenate([r0[..., None], rv], axis=-1)


def density(pos: jnp.ndarray) -> jnp.ndarray:
    """Binary Julia density at world positions ``(..., 3)`` (kernel.cu:100-115).

    Replicates the C do/while with post-increment: the body always runs at
    least once; ``iter`` increments only while |q|² < 10, and the loop runs
    at most ``MAX_ITER + 1`` bodies.  Returns 1.0 where iter > 0.9*MAX_ITER.
    """
    # Reference packing: q = (px*r, py*r, pz*r, 0) with q.x the real part
    # and (y, z, w) imaginary — component 0 is real here too.
    q0 = jnp.concatenate([pos * jnp.float32(RADIUS),
                          jnp.zeros(pos.shape[:-1] + (1,), jnp.float32)],
                         axis=-1)

    def body(_, carry):
        q, it, active = carry
        q2 = _quat_sq(q) + jnp.asarray(C, jnp.float32)
        q = jnp.where(active[..., None], q2, q)
        inside = jnp.sum(q * q, axis=-1) < 10.0
        cont = active & inside & (it < MAX_ITER)
        it = jnp.where(active & inside, it + 1, it)
        return q, it, cont

    it0 = jnp.zeros(pos.shape[:-1], jnp.int32)
    active0 = jnp.ones(pos.shape[:-1], bool)
    _, it, _ = jax.lax.fori_loop(0, MAX_ITER + 1, body, (q0, it0, active0))
    return (it > int(MAX_ITER * 0.9)).astype(jnp.float32)


def bake(n: int = 256, box_half=(1.0, 1.0, 1.0), chunk: int = 8) -> np.ndarray:
    """Evaluate the Julia density on an n³ voxel-center lattice over
    ``[-box_half, box_half]`` and return a float numpy volume ``(nz,ny,nx)``.

    Baked in z-slabs so peak memory stays modest at 512³.
    """
    bh = np.asarray(box_half, np.float32)
    xs = (np.arange(n, dtype=np.float32) + 0.5) / n * 2.0 - 1.0

    @jax.jit
    def slab(zvals):
        z, y, x = jnp.meshgrid(zvals, jnp.asarray(xs), jnp.asarray(xs),
                               indexing="ij")
        pos = jnp.stack([x * bh[0], y * bh[1], z * bh[2]], axis=-1)
        return density(pos)

    out = np.empty((n, n, n), np.float32)
    for z0 in range(0, n, chunk):
        zs = jnp.asarray(xs[z0:z0 + chunk])
        out[z0:z0 + chunk] = np.asarray(slab(zs))
    return out
