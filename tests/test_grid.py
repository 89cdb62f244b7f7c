"""Grid sampling semantics: clamp addressing, voxel-center alignment,
trilinear weights, uint8 dequantization, world<->local mapping."""

import numpy as np
import jax.numpy as jnp

from cuda_volpath_tpu.ops import grid as g


def _rand_grid(rng_np, shape, dtype=np.float32):
    data = rng_np.random(shape).astype(np.float32)
    if dtype == np.uint8:
        data = (data * 255).astype(np.uint8)
    return g.make_grid(jnp.asarray(data))


def ref_trilinear(data, p):
    """Brute-force CUDA-style trilinear at normalized local coords p."""
    nz, ny, nx = data.shape
    dims = np.array([nx, ny, nz], np.float32)
    xb = p * dims - 0.5
    i0 = np.floor(xb).astype(int)
    f = xb - i0
    hi = np.array([nx - 1, ny - 1, nz - 1])
    a = np.clip(i0, 0, hi)
    b = np.clip(i0 + 1, 0, hi)
    out = 0.0
    for dz, wz in ((0, 1 - f[2]), (1, f[2])):
        for dy, wy in ((0, 1 - f[1]), (1, f[1])):
            for dx, wx in ((0, 1 - f[0]), (1, f[0])):
                ix = (b if dx else a)[0]
                iy = (b if dy else a)[1]
                iz = (b if dz else a)[2]
                out += wx * wy * wz * data[iz, iy, ix]
    return out


def test_voxel_center_exact(rng_np):
    vol = _rand_grid(rng_np, (4, 5, 6))
    nx, ny, nz = vol.dims
    data = np.asarray(vol.data)
    for (i, j, k) in [(0, 0, 0), (5, 4, 3), (2, 3, 1)]:
        p = jnp.asarray([(i + 0.5) / nx, (j + 0.5) / ny, (k + 0.5) / nz])
        got = float(g.sample_trilinear(vol, p))
        np.testing.assert_allclose(got, data[k, j, i], rtol=1e-5)
        got_n = float(g.sample_nearest(vol, p))
        np.testing.assert_allclose(got_n, data[k, j, i], rtol=1e-6)


def test_trilinear_matches_bruteforce(rng_np):
    vol = _rand_grid(rng_np, (7, 6, 5))
    data = np.asarray(vol.data)
    pts = rng_np.random((64, 3)).astype(np.float32) * 1.4 - 0.2  # incl. out-of-range
    got = np.asarray(g.sample_trilinear(vol, jnp.asarray(pts)))
    want = np.array([ref_trilinear(data, p) for p in pts])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_clamp_addressing(rng_np):
    vol = _rand_grid(rng_np, (3, 3, 3))
    data = np.asarray(vol.data)
    far = jnp.asarray([[10.0, 10.0, 10.0], [-5.0, -5.0, -5.0]])
    got = np.asarray(g.sample_trilinear(vol, far))
    np.testing.assert_allclose(got, [data[2, 2, 2], data[0, 0, 0]], rtol=1e-6)


def test_uint8_dequant(rng_np):
    vol = _rand_grid(rng_np, (4, 4, 4), np.uint8)
    data = np.asarray(vol.data).astype(np.float32) / 255.0
    p = jnp.asarray([0.4, 0.6, 0.2])
    got = float(g.sample_trilinear(vol, p))
    want = ref_trilinear(data, np.asarray(p))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_world_local_roundtrip(rng_np):
    vol = g.make_grid(jnp.zeros((8, 4, 16)))
    # default box follows aspect: +/- (1, 4/16, 8/16)
    np.testing.assert_allclose(np.asarray(vol.box_min), [-1, -0.25, -0.5])
    pts = jnp.asarray(rng_np.random((10, 3)), jnp.float32)
    w = g.to_world(vol, pts)
    back = g.to_local(vol, w)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-6)


def test_multichannel_bound_grid(rng_np):
    data = rng_np.random((4, 4, 4, 2)).astype(np.float32)
    vol = g.make_grid(jnp.asarray(data))
    p = jnp.asarray([[0.1, 0.5, 0.9]])
    got = np.asarray(g.sample_nearest(vol, p))
    assert got.shape == (1, 2)
    idx = np.floor(np.array([0.1, 0.5, 0.9]) * 4).astype(int)
    np.testing.assert_allclose(got[0], data[idx[2], idx[1], idx[0]])


def test_quantize_u8_semantics():
    vol = np.array([[-1.0, 0.0, 0.5, 2.0]], np.float32).reshape(1, 1, 4)
    q = np.asarray(g.quantize_u8(vol))  # max_value = 2.0
    np.testing.assert_array_equal(q.ravel(), [0, 0, 63, 255])
