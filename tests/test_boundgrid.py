"""Bound-grid builder vs brute-force oracle, and opacity bake."""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_volpath_tpu.ops import boundgrid, grid as gridmod
from cuda_volpath_tpu.volume import opacity


@pytest.mark.parametrize("shape,sr", [((9, 8, 7), 0.3), ((16, 16, 16), 0.05),
                                      ((6, 5, 12), 0.2)])
def test_matches_bruteforce_float(rng_np, shape, sr):
    vol = rng_np.random(shape).astype(np.float32)
    got = boundgrid.build_bound_grid(vol, sr)
    want = boundgrid.build_bound_grid_bruteforce(vol, sr)
    np.testing.assert_array_equal(got, want)


def test_matches_bruteforce_uint8(rng_np):
    vol = (rng_np.random((10, 11, 12)) * 255).astype(np.uint8)
    got = boundgrid.build_bound_grid(vol, 0.25)
    want = boundgrid.build_bound_grid_bruteforce(vol, 0.25)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_radius_semantics():
    # cell_size = 2/Nx; r = ceil(sr / cell) (volumeRender.cpp:1098-1102)
    assert boundgrid.radius_in_voxels(256, 0.05) == 7
    assert boundgrid.radius_in_voxels(32, 0.05) == 1


def test_bounds_bracket_density(rng_np):
    vol = rng_np.random((12, 12, 12)).astype(np.float32)
    b = boundgrid.build_bound_grid(vol, 0.1)
    assert (b[..., 0] >= vol).all()
    assert (b[..., 1] <= vol).all()


@pytest.mark.parametrize("shape,stride", [((16, 16, 16), 4), ((10, 13, 9), 4),
                                          ((12, 12, 12), 3)])
def test_multiscale_bounds_conservative(rng_np, shape, stride):
    """Every (max_k, min_k) channel pair must bracket the density over the
    exact reachable window: cell block dilated by r_vox_k (+1 filter
    support) voxels."""
    vol = (rng_np.random(shape) * 255).astype(np.uint8)
    sr, mults = 0.15, (1.0, 3.0)
    b = boundgrid.build_multiscale_bounds(vol, sr, stride=stride,
                                          scale_mults=mults)
    nz, ny, nx = shape
    for k, mult in enumerate(mults):
        r = boundgrid.radius_in_voxels(nx, sr * mult) + 1
        for cz in range(b.shape[0]):
            for cy in range(b.shape[1]):
                for cx in range(b.shape[2]):
                    z0, y0, x0 = cz * stride, cy * stride, cx * stride
                    w = vol[max(0, z0 - r):z0 + stride + r,
                            max(0, y0 - r):y0 + stride + r,
                            max(0, x0 - r):x0 + stride + r]
                    if w.size == 0:  # padded edge cell beyond the volume
                        continue
                    assert b[cz, cy, cx, 2 * k] >= w.max()
                    assert b[cz, cy, cx, 2 * k + 1] <= w.min()


def test_multiscale_homog_detects_constant():
    vol = np.full((16, 16, 16), 77, np.uint8)
    b = boundgrid.build_multiscale_bounds(vol, 0.05, stride=4,
                                          scale_mults=(1.0, 5.0, 25.0))
    assert b.shape[-1] == 7
    assert (b[..., 0:6:2] == 77).all() and (b[..., 1:6:2] == 77).all()
    assert (b[..., 6] == 0).all()  # solid everywhere: no leap


def test_leap_channel_is_safe(rng_np):
    """leap code v at cell c ⇒ every cell within Chebyshev distance v is
    empty."""
    vol = np.zeros((24, 24, 24), np.uint8)
    vol[2:5, 3:6, 4:7] = 200
    vol[20:22, 18:20, 1:3] = 50
    stride = 2
    b = boundgrid.build_multiscale_bounds(vol, 0.05, stride=stride,
                                          scale_mults=(1.0,))
    occ = boundgrid._block_reduce(vol, stride, "max") > 0
    leap = b[..., 2].astype(int)
    nz, ny, nx = occ.shape
    for cz in range(nz):
        for cy in range(ny):
            for cx in range(nx):
                v = leap[cz, cy, cx]
                if v == 0:
                    continue
                w = occ[max(0, cz - v):cz + v + 1,
                        max(0, cy - v):cy + v + 1,
                        max(0, cx - v):cx + v + 1]
                assert not w.any(), (cz, cy, cx, v)
    # and it is not all-zero — far cells do get leaps
    assert leap.max() >= 4


def test_opacity_bake_constant_volume():
    """Constant density 1: opacity ≈ distance to box exit toward the sun."""
    n = 12
    vol = jnp.ones((n, n, n), jnp.float32)
    g = gridmod.make_grid(vol)  # box [-1,1]^3
    light = (0.0, 1.0, 0.0)  # straight up
    od = np.asarray(opacity.bake(g, light, dt=0.01))
    # voxel at the bottom center: distance to top ≈ 2 - half voxel
    ys = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    expect = 1.0 - ys  # distance from voxel center to +y face
    got = od[n // 2, :, n // 2]
    np.testing.assert_allclose(got, expect, atol=0.03)


def test_opacity_dt_regression():
    """The flagship scene bakes its sun-opacity cache at dt=0.004 — 4×
    coarser than the reference's 0.001 (kernel.cu:499).  Bound the error
    that introduces through the deep-scatter NEE shortcut
    a = exp(-σt·ρ'·od) (kernel.cu:2181-2196) at the flagship's own
    deep-scatter extinction ρ' = (1-g)·density ≈ 98.

    Measured on the quantized blob: max |Δod| ≈ 0.0015, max |Δa| ≈ 0.006 —
    the coarser cache costs <1% attenuation error.  Asserted with ~2.5×
    headroom; a regression (e.g. an off-by-one march step) trips it."""
    n = 24
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    r2 = ((xx - c) ** 2 + (yy - c) ** 2 + (zz - c) ** 2) / (n / 3) ** 2
    vol = np.exp(-r2).astype(np.float32)
    g = gridmod.make_grid(jnp.asarray(gridmod.quantize_u8(vol)))
    light = np.array([0.5826, 0.766, 0.2717], np.float32)
    light /= np.linalg.norm(light)
    od_ref = np.asarray(opacity.bake(g, light, dt=0.001))
    od_fast = np.asarray(opacity.bake(g, light, dt=0.004))
    assert np.abs(od_fast - od_ref).max() < 0.004
    rho = (1.0 - 0.877) * 800.0  # hyperion-reduced flagship extinction
    a_ref = np.exp(-rho * od_ref)
    a_fast = np.exp(-rho * od_fast)
    assert np.abs(a_fast - a_ref).max() < 0.02


def test_native_multiscale_matches_numpy(rng_np):
    from cuda_volpath_tpu.volume import loaders
    vol = (rng_np.random((24, 17, 21)) * 255).astype(np.uint8)
    vol[vol < 120] = 0
    got = loaders.build_multiscale_bounds_native(vol, 0.15, stride=2,
                                                 scale_mults=(1.0, 3.0))
    if got is None:
        pytest.skip("native boundgrid not built")
    want = boundgrid.build_multiscale_bounds(vol, 0.15, stride=2,
                                             scale_mults=(1.0, 3.0))
    np.testing.assert_array_equal(got, want)


def test_native_matches_numpy(rng_np):
    from cuda_volpath_tpu.volume import loaders
    vol = (rng_np.random((14, 9, 21)) * 255).astype(np.uint8)
    got = loaders.build_bound_grid_native(vol, 0.12)
    if got is None:
        pytest.skip("native boundgrid not built (make -C cuda_volpath_tpu/native)")
    want = boundgrid.build_bound_grid(vol, 0.12)
    np.testing.assert_array_equal(got, want)
