"""Model-transform parity (USE_MODEL_TRANSFORM, kernel.cu:32).

The reference carries an optional inverse model matrix (``c_invModelMatrix``,
kernel.cu:628, identity-initialised at volumeRender.cpp:1350-1353) applied to
every volume-space query: ray/box slab tests (kernel.cu:457-461, 658-661,
1635-1641) and density/bound sample positions (kernel.cu:684-685,
1595-1613).  Here it is ``Scene.world_to_model``.

The strongest test exploits floating-point exactness: a pure axis
permutation is exact in fp (one-hot row dots pick components, zero terms
add exactly), so rendering a volume through a permutation transform must be
*bit-identical* to rendering the correspondingly transposed volume with no
transform — any axis-convention mistake in the transform plumbing breaks it.
"""

import types

import numpy as np
import jax.numpy as jnp

from cuda_volpath_tpu.config import Param, RenderSettings
from cuda_volpath_tpu.render import camera as cammod
from cuda_volpath_tpu.render import film as filmmod
from cuda_volpath_tpu.render import integrator
from cuda_volpath_tpu.render.scene import (make_scene, materials_from_param,
                                           to_model_point, to_model_dir)
from cuda_volpath_tpu.lighting import envmap as envmod


BG = (0.6, 0.45, 0.3)


def _asym_volume(n=24):
    """Deliberately axis-asymmetric content (cubic shape, so the scene
    boxes and bound pyramids stay permutation-symmetric)."""
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    r2 = ((xx - 0.6 * c) ** 2 + (yy - c) ** 2
          + (zz - 1.3 * c) ** 2) / (n / 3) ** 2
    ramp = 0.3 + 0.7 * xx / (n - 1)
    return (np.exp(-r2) * ramp).astype(np.float32)


def _settings():
    return RenderSettings(sun_light=True, precompute_opacity=False,
                          steps_per_launch=4)


def _render(scene, w=10, h=10, spp=16, pool=2048):
    cam = cammod.make_camera()
    fm = integrator.render(scene, cam, _settings(), w, h, spp, pool=pool)
    return np.asarray(fm.data)


def _mk(vol, world_to_model=None):
    mat = materials_from_param(Param(density=18.0, albedo=(0.9, 0.85, 0.8),
                                     sigma_t=(1.0, 0.8, 0.6), g=0.3))
    # sun deliberately NOT x↔z-symmetric, so a missed sun_dir transform
    # in the shadow queries would break the permutation test below
    return make_scene(vol, mat, envmap=envmod.constant(BG),
                      sun_dir=(0.2, 0.9, 0.5), sun_power=(2.0, 2.0, 2.0),
                      sun_power_original=(40.0, 40.0, 40.0),
                      world_to_model=world_to_model)


def test_transform_formulas():
    """Point/direction transforms match the reference ``mul`` overloads
    (kernel.cu:631-649): row dot products, translation only for points."""
    rng = np.random.default_rng(3)
    m = rng.normal(size=(3, 4)).astype(np.float32)
    pts = rng.normal(size=(7, 3)).astype(np.float32)
    sc = types.SimpleNamespace(world_to_model=jnp.asarray(m))

    want_p = np.stack([
        np.array([np.dot(row[:3], p) + row[3] for row in m], np.float32)
        for p in pts])
    want_d = np.stack([
        np.array([np.dot(row[:3], p) for row in m], np.float32)
        for p in pts])
    np.testing.assert_allclose(
        np.asarray(to_model_point(sc, jnp.asarray(pts))), want_p,
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(to_model_dir(sc, jnp.asarray(pts))), want_d,
        rtol=1e-6, atol=1e-6)

    # None → identity, and 4x4 input is accepted (last row dropped)
    sc_none = types.SimpleNamespace(world_to_model=None)
    np.testing.assert_array_equal(
        np.asarray(to_model_point(sc_none, jnp.asarray(pts))), pts)
    m44 = np.eye(4, dtype=np.float32)
    m44[:3, 3] = (1.0, 2.0, 3.0)
    scene = _mk(_asym_volume(8), world_to_model=m44)
    assert scene.world_to_model.shape == (3, 4)


def test_identity_transform_is_bit_exact():
    """world_to_model = identity must not change a single bit of the film
    (p @ I + 0 is exact in fp), proving the transform plumbing is a pure
    no-op at the default — the reference's startup state
    (volumeRender.cpp:1350-1353 uploads identity)."""
    vol = _asym_volume()
    eye = np.concatenate([np.eye(3, dtype=np.float32),
                          np.zeros((3, 1), np.float32)], axis=1)
    np.testing.assert_array_equal(_render(_mk(vol)),
                                  _render(_mk(vol, world_to_model=eye)))


def test_permutation_transform_matches_transposed_volume():
    """Rendering volume G through the x↔z axis-permutation transform is
    bit-identical to rendering G.transpose(2,1,0) untransformed: both
    describe the same world-space density field, and a permutation is
    exact in fp.  Exercises every transformed query site (path + shadow
    slab tests, bound-pyramid fetch, packed density gather)."""
    vol = _asym_volume()
    # model = P · world with P swapping x and z (rows are one-hot)
    perm = np.asarray([[0, 0, 1, 0],
                       [0, 1, 0, 0],
                       [1, 0, 0, 0]], np.float32)
    np.testing.assert_array_equal(
        _render(_mk(vol, world_to_model=perm)),
        _render(_mk(np.ascontiguousarray(vol.transpose(2, 1, 0)))))
