"""HG phase function: pdf normalization, sample/eval consistency, frame."""

import numpy as np
import jax.numpy as jnp

from cuda_volpath_tpu.ops import phase, vecmath as vm, rng


def test_pdf_normalizes():
    # Integrate HG pdf over the sphere by Gauss-style quadrature on cos_theta.
    for g in [0.0, 0.3, 0.877, -0.5]:
        ct = np.linspace(-1, 1, 200001)
        pdf = np.asarray(phase.hg_eval(g, jnp.asarray(ct, jnp.float32)))
        integral = 2 * np.pi * np.trapezoid(pdf, ct)
        np.testing.assert_allclose(integral, 1.0, rtol=2e-3)


def test_sample_matches_pdf_histogram():
    """The reference clamps cos_theta to [0,1] (kernel.cu:588), which piles
    the backward-hemisphere mass (~12% at g=0.6) onto cosθ=0.  The continuous
    part for cosθ > 0 must still match the HG pdf exactly."""
    g = 0.6
    n = 200000
    st = rng.init(jnp.arange(n), jnp.zeros(n, jnp.uint32), 0)
    st, (u0, u1) = rng.next_floats(st, 2)
    fwd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    d = phase.hg_sample(g, fwd, u0, u1)
    ct = np.asarray(vm.dot(d, fwd))
    assert ct.min() >= -1e-5  # clamp quirk: no backward samples
    hist, edges = np.histogram(ct, bins=50, range=(-1, 1), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    want = 2 * np.pi * np.asarray(phase.hg_eval(g, jnp.asarray(centers)))
    sel = centers > 0.1  # away from the clamp pile-up at 0
    np.testing.assert_allclose(hist[sel], want[sel], rtol=0.12, atol=0.02)
    # the pile-up bin holds the clipped backward mass: u0 < 0.124 at g=0.6
    pile = (np.abs(ct) < 0.02).mean()
    assert 0.08 < pile < 0.16


def test_isotropic_branch():
    n = 100000
    st = rng.init(jnp.arange(n), jnp.ones(n, jnp.uint32), 7)
    st, (u0, u1) = rng.next_floats(st, 2)
    fwd = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
    d = np.asarray(phase.hg_sample(0.0, fwd, u0, u1))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert abs(d.mean()) < 0.01  # uniform on sphere


def test_frame_orthonormal():
    dirs = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    t, b, n = phase.make_frame(jnp.asarray(dirs))
    t, b, n = map(np.asarray, (t, b, n))
    np.testing.assert_allclose((t * b).sum(-1), 0, atol=1e-5)
    np.testing.assert_allclose((t * n).sum(-1), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)
    np.testing.assert_allclose(np.cross(n, t), b, atol=1e-5)


def test_anisotropic_clamp_matches_reference_quirk():
    """The reference clamps cos_theta to [0,1] for |g|>1e-6 — backward
    hemisphere is unreachable for any g != 0 (kernel.cu:588)."""
    n = 50000
    st = rng.init(jnp.arange(n), jnp.zeros(n, jnp.uint32), 3)
    st, (u0, u1) = rng.next_floats(st, 2)
    local = np.asarray(phase.hg_sample_local(0.01, u0, u1))
    assert local[:, 2].min() >= -1e-6
