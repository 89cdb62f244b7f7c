"""Vectorized counter-initialised RNG with reference-identical streams.

The reference uses a stateless-per-sample generator: each (pixel, sample)
pair seeds a tiny xoroshiro-like 32-bit generator through a Wang-style
integer hash (reference src/sampler.h:3-46).  Because the state is derived
purely from (pixel_x, pixel_y, frame_idx), the streams are deterministic and
independent of any launch geometry — which is exactly the property we need
for sharding-invariant multi-chip rendering: a pixel's sample sequence is
identical no matter which device renders it.

Here the generator is expressed as whole-array uint32 ops over an ``(N, 2)``
state, so one fused VPU pass advances every ray's stream.  All operations
wrap mod 2**32 like the CUDA originals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

UINT = jnp.uint32


def hash_u32(seed: jnp.ndarray) -> jnp.ndarray:
    """Wang-style avalanche hash (reference src/sampler.h:3-11)."""
    seed = seed.astype(UINT)
    seed = (seed ^ UINT(61)) ^ (seed >> UINT(16))
    seed = seed * UINT(9)
    seed = seed ^ (seed >> UINT(4))
    seed = seed * UINT(0x27D4EB2D)
    seed = seed ^ (seed >> UINT(15))
    return seed


def _rotl(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return (x << UINT(k)) | (x >> UINT(32 - k))


def rng_next(state: jnp.ndarray):
    """Advance the xoroshiro-like stream one step.

    ``state`` is ``(..., 2) uint32``; returns ``(new_state, raw_u32)``.
    Matches ``RngNext`` (reference src/sampler.h:13-22): the output word is
    produced from the *pre-update* first word.
    """
    x = state[..., 0]
    y = state[..., 1]
    result = x * UINT(0x9E3779BB)
    y = y ^ x
    x = _rotl(x, 26) ^ y ^ (y << UINT(9))
    y = _rotl(x, 13)
    return jnp.stack([x, y], axis=-1), result


def init(pixel_x: jnp.ndarray, pixel_y: jnp.ndarray, sample_idx) -> jnp.ndarray:
    """Seed per-ray streams from (pixel, sample) (reference src/sampler.h:35-43).

    ``sample_idx`` may be a scalar (same sample index for all pixels, like a
    per-frame launch) or an array broadcastable against ``pixel_x``.
    Returns ``(..., 2) uint32`` state, already burned one step like the
    reference's trailing ``RngNext`` call.
    """
    px = jnp.asarray(pixel_x, UINT)
    py = jnp.asarray(pixel_y, UINT)
    fi = jnp.broadcast_to(jnp.asarray(sample_idx, UINT), px.shape)
    s0 = (px << UINT(16)) | py
    state = jnp.stack([hash_u32(s0), hash_u32(fi)], axis=-1)
    state, _ = rng_next(state)
    return state


def fmix32(x: jnp.ndarray) -> jnp.ndarray:
    """Murmur3 finalizer — full-avalanche 32-bit bijection."""
    x = x ^ (x >> UINT(16))
    x = x * UINT(0x85EBCA6B)
    x = x ^ (x >> UINT(13))
    x = x * UINT(0xC2B2AE35)
    x = x ^ (x >> UINT(16))
    return x


def cheap_next(state: jnp.ndarray):
    """Production generator step (config.cheap_rng) — same signature and
    state shape as ``rng_next``, ~⅓ the arithmetic and no serial chain
    between consecutive draws.

    ``state`` is ``[key, ctr]``: ``key`` is the per-(pixel, sample) hash and
    never changes; ``ctr`` walks a Weyl sequence (golden-ratio gamma), and
    each output word is ``fmix32(key ^ ctr)`` — a keyed SplitMix32.  Draw k
    and draw k+1 differ only in the counter, so speculative lookahead draws
    are data-parallel instead of chained through the xoroshiro update.

    NOT draw-for-draw the reference's generator (use the default parity
    generator for oracle/golden validation); streams are still keyed by
    (pixel, sample), so determinism, pool/sharding invariance, and
    checkpoint resume behave identically.
    """
    key = state[..., 0]
    ctr = state[..., 1]
    raw = fmix32(key ^ ctr)
    return jnp.stack([key, ctr + UINT(0x9E3779B9)], axis=-1), raw


def cheap_init(pixel_x: jnp.ndarray, pixel_y: jnp.ndarray,
               sample_idx) -> jnp.ndarray:
    """Seed ``cheap_next`` streams from (pixel, sample).

    Each (pixel, sample) pair gets its **own key** —
    ``key = fmix32(hash(px<<16|py) ^ hash(sample))`` — and the counter
    starts at 0, so two samples of one pixel are independent keyed
    SplitMix32 streams, not windows of one shared Weyl orbit.  (An earlier
    design shared the pixel key and offset the counter by ``hash(sample)``;
    with S samples × D draws per pixel the expected number of overlapping
    window pairs grows as S²·D/2³² — quadratic in spp — which locally
    correlates samples at accumulation-scale spp.  Per-pair key collisions
    are the only residual overlap here: probability S²/2³³ per pixel,
    sample-length-independent, and still unbiased either way.)
    """
    px = jnp.asarray(pixel_x, UINT)
    py = jnp.asarray(pixel_y, UINT)
    fi = jnp.broadcast_to(jnp.asarray(sample_idx, UINT), px.shape)
    key = fmix32(hash_u32((px << UINT(16)) | py) ^ hash_u32(fi))
    return jnp.stack([key, jnp.zeros_like(key)], axis=-1)


def bits_to_float(raw: jnp.ndarray) -> jnp.ndarray:
    """Raw u32 → uniform [0, 1) via the float bit trick (src/sampler.h:24-28):
    exponent bits of 1.0f, top 23 random bits as mantissa, minus 1."""
    bits = UINT(0x3F800000) | (raw >> UINT(9))
    return jax.lax.bitcast_convert_type(bits, jnp.float32) - 1.0


def next_float(state: jnp.ndarray):
    """Uniform in [0, 1); returns ``(new_state, float in [0,1))``."""
    state, raw = rng_next(state)
    return state, bits_to_float(raw)


def next_floats(state: jnp.ndarray, n: int):
    """Draw ``n`` sequential uniforms; returns ``(new_state, tuple_of_arrays)``."""
    outs = []
    for _ in range(n):
        state, u = next_float(state)
        outs.append(u)
    return state, tuple(outs)
