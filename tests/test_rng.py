"""RNG stream parity and statistical sanity.

The oracle is an independent pure-Python (numpy scalar) transcription of the
generator spec (reference src/sampler.h:3-46), checked bit-for-bit against
the vectorized JAX implementation.
"""

import numpy as np
import jax.numpy as jnp

from cuda_volpath_tpu.ops import rng


def py_hash(seed: int) -> int:
    M = 0xFFFFFFFF
    seed = ((seed ^ 61) ^ (seed >> 16)) & M
    seed = (seed * 9) & M
    seed = (seed ^ (seed >> 4)) & M
    seed = (seed * 0x27D4EB2D) & M
    seed = (seed ^ (seed >> 15)) & M
    return seed


def py_next(x: int, y: int):
    M = 0xFFFFFFFF
    result = (x * 0x9E3779BB) & M
    y ^= x
    x = (((x << 26) | (x >> 6)) & M) ^ y ^ ((y << 9) & M)
    y = ((x << 13) | (x >> 19)) & M
    return x, y, result


def py_stream(px, py_, frame, n):
    x = py_hash(((px << 16) | py_) & 0xFFFFFFFF)
    y = py_hash(frame)
    x, y, _ = py_next(x, y)
    out = []
    for _ in range(n):
        x, y, raw = py_next(x, y)
        bits = 0x3F800000 | (raw >> 9)
        out.append(np.uint32(bits).view(np.float32) - 1.0)
    return out


def test_bit_parity_with_reference_spec():
    pixels = [(0, 0, 0), (5, 7, 3), (511, 959, 42), (65535, 1, 1)]
    px = jnp.asarray([p[0] for p in pixels])
    py = jnp.asarray([p[1] for p in pixels])
    fr = jnp.asarray([p[2] for p in pixels])
    state = rng.init(px, py, fr)
    draws = []
    for _ in range(8):
        state, u = rng.next_float(state)
        draws.append(np.asarray(u))
    got = np.stack(draws, axis=1)  # (npix, 8)
    for i, (a, b, f) in enumerate(pixels):
        want = np.asarray(py_stream(a, b, f, 8), np.float32)
        np.testing.assert_array_equal(got[i], want)


def test_uniformity_and_range():
    n = 50000
    px = jnp.arange(n) % 960
    py = (jnp.arange(n) // 960) % 512
    state = rng.init(px, py, 0)
    state, u = rng.next_float(state)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(np.var(u) - 1 / 12) < 0.005


def test_streams_independent_of_batch_shape():
    """A pixel's draws must not depend on which other pixels share the batch
    (the property that makes sharding invariant)."""
    s1 = rng.init(jnp.asarray([17]), jnp.asarray([23]), 5)
    s2 = rng.init(jnp.arange(100), jnp.full((100,), 23), 5)
    _, u1 = rng.next_float(s1)
    _, u2 = rng.next_float(s2)
    assert np.asarray(u1)[0] == np.asarray(u2)[17]


def test_next_floats_sequence():
    s = rng.init(jnp.asarray([1]), jnp.asarray([2]), 3)
    s2, (a, b, c) = rng.next_floats(s, 3)
    s3 = rng.init(jnp.asarray([1]), jnp.asarray([2]), 3)
    s3, a2 = rng.next_float(s3)
    s3, b2 = rng.next_float(s3)
    s3, c2 = rng.next_float(s3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s3))
