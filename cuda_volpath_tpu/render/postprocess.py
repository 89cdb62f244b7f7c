"""Output finalization: scale and gamma (reference src/volumeRender_kernel.cu
:2333-2362 ``__scale`` / ``__gamma_correct``), as jitted XLA ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def scale(img: jnp.ndarray, s) -> jnp.ndarray:
    return img * jnp.float32(s)


def gamma_correct(img: jnp.ndarray, s=1.0, gamma: float = 2.2) -> jnp.ndarray:
    """(img * s) ** (1/gamma) — matches gamma_correct passing 1/gamma down
    (kernel.cu:2359-2362)."""
    return jnp.power(jnp.maximum(img * jnp.float32(s), 0.0),
                     jnp.float32(1.0 / gamma))


def tonemap_display(img: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    """Gamma display transform clipped to [0,1] for 8-bit output."""
    return jnp.clip(gamma_correct(img, 1.0, gamma), 0.0, 1.0)


def reinhard(img: jnp.ndarray) -> jnp.ndarray:
    """Reinhard-style tonemap offered by the CPU Image class
    (src/image.cpp tonemap)."""
    return img / (1.0 + img)
