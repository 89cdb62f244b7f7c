"""Output finalization: scale and gamma (reference src/volumeRender_kernel.cu
:2333-2362 ``__scale`` / ``__gamma_correct``), plus the denoiser post-pass,
as jitted XLA ops.

The denoiser replaces the reference's OptiX AI denoiser (src/denoiser.cpp
:90-241, toggled with 'n') — OptiX does not exist on TPU, so this is an
edge-aware à-trous wavelet filter (Dammertz et al. 2010) guided by color
and by the heat AOV (per-pixel mean scatter count, the alpha channel of
kernel.cu:2309-2317).  The ``blend = 1/spp`` fade-out semantics of
denoiser.cpp:173 are preserved: as accumulation converges the output
approaches the raw image."""

from __future__ import annotations

import functools

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


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-clamped spatial shift of (H, W, C)."""
    h, w = x.shape[:2]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return x[ys][:, xs]

# B3-spline 5-tap weights of the à-trous wavelet transform.
_TAPS = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


@functools.partial(jax.jit, static_argnames=("iterations", "has_var"))
def _atrous(img: jnp.ndarray, heat: jnp.ndarray, variance: jnp.ndarray,
            sigma_color: float, sigma_heat: float, var_scale: float,
            iterations: int, has_var: bool) -> jnp.ndarray:
    heat = heat[..., None]
    out = img
    if has_var:
        # SVGF-style noise adaptation: widen the color kernel where the
        # pixel mean is noisy (variance is Var(sample)/spp from the film's
        # E[x²] lanes), tighten it where the estimate has converged — so
        # smoothing tracks the actual Monte-Carlo error instead of one
        # global sigma.  (Schied et al. 2017 use σ·sqrt(var); the squared
        # form below keeps the weight exp-linear in variance.)
        vsum = jnp.sum(variance, axis=-1, keepdims=True)
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros_like(out[..., :1])
        for iy, wy in zip((-2, -1, 0, 1, 2), _TAPS):
            for ix, wx in zip((-2, -1, 0, 1, 2), _TAPS):
                p = _shift2d(out, iy * step, ix * step)
                ph = _shift2d(heat, iy * step, ix * step)
                dc = jnp.sum((p - out) ** 2, axis=-1, keepdims=True)
                dh = (ph - heat) ** 2
                denom = jnp.float32(sigma_color ** 2)
                if has_var:
                    denom = denom + jnp.float32(var_scale) * (
                        vsum + _shift2d(vsum, iy * step, ix * step))
                w = (wy * wx) * jnp.exp(
                    -dc / denom - dh / jnp.float32(sigma_heat ** 2))
                acc = acc + p * w
                wacc = wacc + w
        out = acc / jnp.maximum(wacc, 1e-8)
    return out


def atrous_denoise(img: jnp.ndarray, heat: jnp.ndarray,
                   variance: jnp.ndarray | None = None,
                   sigma_color: float = 0.25, sigma_heat: float = 4.0,
                   var_scale: float = 4.0,
                   iterations: int = 4) -> jnp.ndarray:
    """Edge-aware à-trous filter of an (H, W, 3) HDR image.

    ``heat`` (H, W) is the mean scatter count — a cheap geometry/feature
    proxy for volumes (silhouettes and optical-depth discontinuities show
    up as heat edges), standing in for the albedo/normal guides the OptiX
    LDR model uses.

    ``variance`` (H, W, 3), if given, is the per-pixel variance of the
    *mean* (film sample variance / spp): the color kernel widens with the
    local Monte-Carlo error, so noisy pixels smooth harder and converged
    detail is preserved — a capability the reference's fixed OptiX model
    has no access to (the film there stores only the sum,
    volumeRender.cpp:358-389)."""
    has_var = variance is not None
    if variance is None:
        variance = jnp.zeros_like(img)
    return _atrous(img, heat, variance, sigma_color, sigma_heat, var_scale,
                   iterations, has_var)


@jax.jit
def firefly_clamp(img: jnp.ndarray, variance: jnp.ndarray,
                  nsigma: float = 8.0) -> jnp.ndarray:
    """Variance-aware firefly suppression (off by default — reference
    parity keeps the raw estimator; enable with the CLI's
    ``--firefly-clamp``).

    A pixel is clamped to 2× its 3×3 neighborhood median plus
    ``nsigma``·σ of its own Monte-Carlo error (``variance`` is the
    per-pixel variance of the mean, film sample variance / spp).  The
    σ term keeps noisy-but-honest pixels tolerant while the estimate is
    rough; the 2×-median margin passes smooth bright detail.  A genuine
    single-pixel bright feature is locally indistinguishable from a
    firefly, which is why this is opt-in and the raw estimator stays the
    default.  The binary `Tr_spectral` shadow estimator's rare
    huge-weight samples (the teaser sparkle) are the target."""
    stack = jnp.stack([_shift2d(img, dy, dx)
                       for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=0)
    med = jnp.median(stack, axis=0)
    bound = 2.0 * med + jnp.float32(nsigma) * jnp.sqrt(
        jnp.maximum(variance, 0.0)) + jnp.float32(1e-6)
    return jnp.minimum(img, bound)


def denoise(img: jnp.ndarray, heat: jnp.ndarray, spp: float = 1.0,
            **kw) -> jnp.ndarray:
    """Denoiser entry point with the reference's 1/spp blend
    (denoiser.cpp:173: blendFactor = 1/spp, OptiX semantics = fraction of
    the *original* image kept — the first frame passes through and the
    denoised share grows as accumulation proceeds)."""
    den = atrous_denoise(img, heat, **kw)
    blend = jnp.float32(min(1.0, 1.0 / max(float(spp), 1.0)))
    return den * (1.0 - blend) + img * blend
