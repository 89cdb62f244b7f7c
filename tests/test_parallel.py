"""Multi-device sharding: results must match the single-device render."""

import numpy as np
import jax
import jax.numpy as jnp

from cuda_volpath_tpu.config import Param, RenderSettings
from cuda_volpath_tpu.render import camera as cammod
from cuda_volpath_tpu.render import film as filmmod
from cuda_volpath_tpu.render import integrator
from cuda_volpath_tpu.parallel import shard
from cuda_volpath_tpu import scenes


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_device():
    scene, cam, _ = scenes.gaussian_blob(16, Param(density=10.0, g=0.4))
    settings = RenderSettings(precompute_opacity=False, steps_per_launch=4)
    w = h = 8
    spp = 8

    f1 = integrator.render(scene, cam, settings, w, h, spp, pool=512)
    mesh = shard.make_mesh(8)
    f8 = shard.render_sharded(scene, cam, settings, w, h, spp, mesh=mesh,
                              pool_per_device=128)
    a = np.asarray(filmmod.image(f1))
    b = np.asarray(filmmod.image(f8))
    assert np.asarray(filmmod.spp(f8)).min() == spp
    # identical sample set, different accumulation order → fp-level only
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_sharded_device_count_invariance():
    scene, cam, _ = scenes.gaussian_blob(16, Param(density=10.0, g=0.4))
    settings = RenderSettings(precompute_opacity=False, steps_per_launch=4)
    w = h = 8
    f2 = shard.render_sharded(scene, cam, settings, w, h, 8,
                              mesh=shard.make_mesh(2), pool_per_device=256)
    f8 = shard.render_sharded(scene, cam, settings, w, h, 8,
                              mesh=shard.make_mesh(8), pool_per_device=128)
    np.testing.assert_allclose(np.asarray(filmmod.image(f2)),
                               np.asarray(filmmod.image(f8)),
                               rtol=1e-5, atol=1e-6)
