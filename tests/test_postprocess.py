"""Post-process: gamma/scale/tonemap and the à-trous denoiser."""

import numpy as np
import jax.numpy as jnp

from cuda_volpath_tpu.render import postprocess as pp


def test_gamma_matches_reference_semantics():
    img = jnp.asarray([[[0.25, 0.5, 1.0]]], jnp.float32)
    out = np.asarray(pp.gamma_correct(img, s=1.0, gamma=2.2))
    np.testing.assert_allclose(out, np.array([[[0.25, 0.5, 1.0]]]) ** (1 / 2.2),
                               rtol=1e-6)


def test_scale_is_linear():
    img = jnp.ones((2, 2, 3), jnp.float32)
    np.testing.assert_allclose(np.asarray(pp.scale(img, 0.25)), 0.25)


def test_denoiser_reduces_noise_preserves_mean(rng_np):
    h = w = 32
    clean = np.full((h, w, 3), 0.5, np.float32)
    noisy = clean + rng_np.normal(0, 0.1, (h, w, 3)).astype(np.float32)
    heat = jnp.zeros((h, w), jnp.float32)
    den = np.asarray(pp.atrous_denoise(jnp.asarray(noisy), heat))
    assert den.std() < noisy.std() * 0.35
    np.testing.assert_allclose(den.mean(), noisy.mean(), atol=0.01)


def test_denoiser_preserves_heat_edges(rng_np):
    """A sharp edge marked by the heat guide must survive filtering."""
    h = w = 32
    img = np.zeros((h, w, 3), np.float32)
    img[:, w // 2:] = 1.0
    heat = np.zeros((h, w), np.float32)
    heat[:, w // 2:] = 100.0
    den = np.asarray(pp.atrous_denoise(
        jnp.asarray(img), jnp.asarray(heat), sigma_color=1e3))
    # without the heat guide sigma_color=1e3 would smear the edge
    assert abs(den[:, w // 2 - 2].mean() - 0.0) < 0.05
    assert abs(den[:, w // 2 + 2].mean() - 1.0) < 0.05


def test_variance_guided_denoise(rng_np):
    """With the film's variance lanes as guide, smoothing tracks the local
    Monte-Carlo error: noisy regions (high variance) filter harder while a
    zero-variance detail edge survives even a wide color sigma."""
    h = w = 32
    # left half: converged sharp stripes (zero variance); right half: flat
    # 0.5 with strong noise (high variance)
    img = np.full((h, w, 3), 0.5, np.float32)
    img[:, : w // 2] = np.where((np.arange(w // 2) // 2 % 2)[None, :, None]
                                .astype(bool), 1.0, 0.0)
    noise = rng_np.normal(0, 0.25, (h, w // 2, 3)).astype(np.float32)
    img[:, w // 2:] += noise
    var = np.zeros((h, w, 3), np.float32)
    var[:, w // 2:] = 0.25 ** 2
    heat = jnp.zeros((h, w), jnp.float32)
    den = np.asarray(pp.atrous_denoise(
        jnp.asarray(img), heat, variance=jnp.asarray(var),
        sigma_color=0.05))
    # noisy flat half: residual noise well below input
    assert den[:, w // 2 + 2:].std() < img[:, w // 2 + 2:].std() * 0.4
    # converged stripes: contrast preserved despite a tight sigma_color —
    # the zero-variance guide keeps the kernel narrow there (columns
    # within the widest tap's reach of the noisy half bleed a little gray,
    # so assert stripe contrast rather than per-pixel equality)
    on = (np.arange(w // 2) // 2 % 2).astype(bool)
    contrast = (den[4:-4, : w // 2][:, on].mean()
                - den[4:-4, : w // 2][:, ~on].mean())
    assert contrast > 0.75, f"stripe contrast collapsed: {contrast}"
    # unguided filtering at the same sigma leaves more noise on the right
    # (fixed narrow kernel cannot adapt to the noise level)
    den0 = np.asarray(pp.atrous_denoise(jnp.asarray(img), heat,
                                        sigma_color=0.05))
    assert den[:, w // 2 + 2:].std() < den0[:, w // 2 + 2:].std()


def test_firefly_clamp(rng_np):
    """The variance-aware clamp kills an isolated huge-weight spike but
    leaves smooth detail and noisy-but-honest pixels alone."""
    h = w = 16
    img = np.full((h, w, 3), 0.4, np.float32)
    img[:, : w // 2] = 3.0          # smooth bright region: must survive
    var = np.full((h, w, 3), 1e-6, np.float32)
    img[8, 12] = 500.0              # firefly: one converged-looking spike
    noisy_val = 1.2
    img[3, 12] = noisy_val          # honest outlier with matching sigma
    var[3, 12] = 1.0                # sigma=1 -> bound ~ 0.8 + 8 > value
    out = np.asarray(pp.firefly_clamp(jnp.asarray(img), jnp.asarray(var)))
    assert out[8, 12].max() < 2.0          # spike clamped to ~2x median
    assert np.allclose(out[3, 12], noisy_val)   # tolerant while noisy
    assert np.allclose(out[:, : w // 2 - 1], 3.0)  # smooth detail intact
    assert np.allclose(out[12, 12], 0.4)


def test_denoise_blend_fades_with_spp(rng_np):
    h = w = 16
    noisy = rng_np.random((h, w, 3)).astype(np.float32)
    heat = jnp.zeros((h, w), jnp.float32)
    out1 = np.asarray(pp.denoise(jnp.asarray(noisy), heat, spp=1.0))
    np.testing.assert_allclose(out1, noisy, atol=1e-6)  # blend=1: original
    out100 = np.asarray(pp.denoise(jnp.asarray(noisy), heat, spp=100.0))
    den = np.asarray(pp.atrous_denoise(jnp.asarray(noisy), heat))
    np.testing.assert_allclose(out100, 0.99 * den + 0.01 * noisy, atol=1e-5)
