"""Multi-device sharding: results must match the single-device render."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


@pytest.mark.slow
def test_sharded_production_shape():
    """The flagship execution configuration — DECOMP + packed opacity +
    samples_per_item=8 + multi-block launch — compiles and drains over the
    8-device mesh via the scan-rolled launch (config.use_scan; the
    unrolled variant explodes the XLA-CPU compiler under shard_map,
    BENCH.md) and matches the 1-device render.  CI face of
    ``__graft_entry__.dryrun_multichip``'s production-shaped gate."""
    from cuda_volpath_tpu.render.scene import pack_density_opacity
    from cuda_volpath_tpu.volume import opacity as opacitymod

    scene, cam, _ = scenes.gaussian_blob(32, Param(density=60.0, g=0.6))
    od = np.asarray(opacitymod.bake(scene.density,
                                    np.asarray(scene.sun_dir), dt=0.01))
    scene = pack_density_opacity(scene, od)
    assert scene.packed is not None and float(scene.od_scale) > 0.0
    # 40 steps = 10 scan blocks of spawn_every=4 — scan compile cost is
    # per-block, and a 4-step block is what the 1-core XLA-CPU host can
    # compile inside the driver's gate timeout (the 12-step default block
    # took ~25 min and timed round 3's gate out); shares its cached
    # graphs with __graft_entry__.dryrun_multichip
    prod = RenderSettings(steps_per_launch=40, spawn_every=4,
                          rearm_every=4, flush_every=2,
                          samples_per_item=8, use_scan=True)
    assert prod.precompute_opacity and prod.tracker.value == "decomp"
    w = h = 16
    spp = 8
    f8 = shard.render_sharded(scene, cam, prod, w, h, spp,
                              mesh=shard.make_mesh(8), pool_per_device=128)
    assert np.asarray(filmmod.spp(f8)).min() == spp
    f1 = integrator.render(scene, cam, prod, w, h, spp, pool=1024)
    np.testing.assert_allclose(np.asarray(filmmod.image(f1)),
                               np.asarray(filmmod.image(f8)),
                               rtol=1e-5, atol=1e-6)


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
