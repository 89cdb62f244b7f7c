"""Lat-long environment map: direction mapping, evaluation, and luminance-CDF
importance sampling.

Re-design of the reference Envmap namespace (src/volumeRender_kernel.cu:
853-1252).  The CUDA per-thread binary searches over CDF textures
(kernel.cu:904-944) become batched ``jnp.searchsorted`` over HBM-resident CDF
arrays; the host-side CDF build (kernel.cu:1036-1070, with the PRE_WARP
sine weighting at :1153-1162) is vectorized numpy.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import vecmath as vm


@struct.dataclass
class Envmap:
    """Environment light data.

    ``image`` is (H, W, 3) float32 radiance.  CDF tables follow the
    reference's marginal-Y / conditional-X factorization; ``pdf_norm_alt``
    is the PRE_WARP=1 luminance normalization ``W*H / (2π² * Σ lum·sinφ)``
    (kernel.cu:1164-1167).
    """

    image: jnp.ndarray       # (H, W, 3)
    cdf_y: jnp.ndarray       # (H,)
    cdf_x: jnp.ndarray       # (H, W)
    pdf_norm_alt: jnp.ndarray  # scalar


def dir_to_uv(d: jnp.ndarray):
    """Direction → lat-long uv (kernel.cu:882-895).

    theta = atan(z/x) + π/2, +π when x < 0; u = theta/2π, v = acos(y)/π.
    """
    theta = jnp.arctan(d[..., 2] / d[..., 0]) + jnp.float32(vm.M_PI / 2)
    theta = jnp.where(d[..., 0] < 0, theta + jnp.float32(vm.M_PI), theta)
    u = theta * jnp.float32(vm.INV_TWO_PI)
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) * jnp.float32(vm.INV_PI)
    return u, v


def uv_to_dir(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """uv → direction (kernel.cu:897-902):
    (sinφ sinθ, cosφ, -sinφ cosθ) with θ=2πu, φ=πv."""
    theta = u * jnp.float32(vm.TWO_PI)
    phi = v * jnp.float32(vm.M_PI)
    sp = jnp.sin(phi)
    return vm.vec3(sp * jnp.sin(theta), jnp.cos(phi), sp * -jnp.cos(theta))


def eval_uv(image: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Point-filtered fetch (HDRtexture is point-sampled, kernel.cu:1099)."""
    h, w = image.shape[0], image.shape[1]
    ix = jnp.clip(jnp.floor(u * w).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.floor(v * h).astype(jnp.int32), 0, h - 1)
    flat = image.reshape(-1, image.shape[-1])
    return jnp.take(flat, iy * w + ix, axis=0)


def eval_dir(image: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """``Envmap::eval_envmap`` (kernel.cu:956-973)."""
    u, v = dir_to_uv(d)
    return eval_uv(image, u, v)


def build(image: np.ndarray) -> Envmap:
    """Build CDF tables from an (H, W, 3) radiance image.

    Mirrors init_envmap's PRE_WARP path (kernel.cu:1144-1173): luminance is
    pre-multiplied by sin(φ_row) before the CDFs, and the alternative pdf
    normalization is W*H / (2π²·Σ) so that
    pdf(dir) = luminance(envmap(dir)) * pdf_norm_alt.
    """
    image = np.asarray(image, np.float32)
    h, w = image.shape[:2]
    lum = (image[..., 0] * 0.2126 + image[..., 1] * 0.7152
           + image[..., 2] * 0.0722)
    phi = np.pi * (np.arange(h, dtype=np.float32) + 0.5) / h
    warped = lum * np.sin(phi)[:, None]

    lumsum = float(warped.sum())
    pdf_norm_alt = w * h / (2.0 * np.pi * np.pi * max(lumsum, 1e-30))

    row_sum = warped.sum(axis=1)
    safe_rows = np.maximum(row_sum, 1e-30)
    cdf_x = np.cumsum(warped / safe_rows[:, None], axis=1)
    cdf_x[:, -1] = 1.0
    cdf_y = np.cumsum(row_sum / max(row_sum.sum(), 1e-30))
    cdf_y[-1] = 1.0

    return Envmap(image=jnp.asarray(image),
                  cdf_y=jnp.asarray(cdf_y.astype(np.float32)),
                  cdf_x=jnp.asarray(cdf_x.astype(np.float32)),
                  pdf_norm_alt=jnp.float32(pdf_norm_alt))


def sample(env: Envmap, u: jnp.ndarray, v: jnp.ndarray):
    """Importance-sample the envmap (kernel.cu:979-1006, PRE_WARP path).

    The reference's per-texel binary searches ``sample_y``/``sample_x``
    (kernel.cu:904-944) find the first index with cdf >= r — exactly
    ``searchsorted(..., side='left')``.  Returns ``(u', v', color, pdf)``
    with (u', v') snapped to texel centers like kernel.cu:985-986.
    """
    h, w = env.image.shape[0], env.image.shape[1]
    iy = jnp.clip(jnp.searchsorted(env.cdf_y, v, side="left"), 0, h - 1)
    # conditional CDF row gather, then search along x
    rows = jnp.take(env.cdf_x, iy, axis=0)  # (..., W)
    ix = jnp.clip(jax_searchsorted_rows(rows, u), 0, w - 1)
    uu = (ix.astype(jnp.float32) + 0.5) / w
    vv = (iy.astype(jnp.float32) + 0.5) / h
    c = eval_uv(env.image, uu, vv)
    pdf = vm.luminance(c) * env.pdf_norm_alt
    return uu, vv, c, pdf


def jax_searchsorted_rows(rows: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Row-wise searchsorted: rows (..., W) sorted ascending, vals (...,)."""
    return jnp.sum((rows < vals[..., None]).astype(jnp.int32), axis=-1)


def pdf_dir(env: Envmap, dir_color: jnp.ndarray) -> jnp.ndarray:
    """pdf of a direction given its envmap color (kernel.cu:1008-1034,
    PRE_WARP: pdf = luminance(color) * pdf_norm_alt, no sin division)."""
    return vm.luminance(dir_color) * env.pdf_norm_alt


def constant(color, h: int = 8, w: int = 16) -> Envmap:
    """Tiny constant-color envmap (test scenes / reference's 16x8 fallback
    at volumeRender.cpp:1374-1384)."""
    img = np.broadcast_to(np.asarray(color, np.float32), (h, w, 3)).copy()
    return build(img)
