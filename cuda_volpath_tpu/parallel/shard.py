"""Multi-chip scale-out via shard_map over a 1D device mesh.

The reference is strictly single-GPU (device 0 hard-coded,
src/denoiser.cpp:95-96; parallelism is only CUDA launch geometry,
SURVEY.md §2.4).  This module is the new capability: the wavefront pool is
sharded across devices, each device owning

* a slice of the lane pool,
* its own (pixel, sample) work-queue cursor (a contiguous item range), and
* a private full-frame film shard.

Because RNG streams are keyed by (pixel, sample) — not by lane or device —
every sample's random sequence is identical no matter which device draws
it, so results are sharding-invariant by construction.  The render hot loop
has **zero cross-device communication**; films are combined with a single
``psum``-equivalent sum at readout, which rides ICI on a real TPU slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..config import RenderSettings
from ..render import camera as cammod
from ..render import film as filmmod
from ..render import integrator
from ..render.scene import Scene


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def init_sharded_state(pool_per_device: int, n_dev: int, total_items: int,
                       spp: int | None = None,
                       samples_per_item: int = 1) -> integrator.PathState:
    """Global pool state: per-lane leaves (n_dev*pool, ...), queue cursors
    (n_dev,) — device d owns the contiguous item range
    [d*per, min((d+1)*per, total))."""
    st = integrator.init_state(pool_per_device * n_dev)
    per = -(-total_items // n_dev)
    next_item = np.minimum(np.arange(n_dev) * per, total_items)
    upper = np.minimum((np.arange(n_dev) + 1) * per, total_items)
    return st.replace(next_item=jnp.asarray(next_item, jnp.int32),
                      total_items=jnp.asarray(upper, jnp.int32),
                      k_queue=jnp.full((n_dev,), samples_per_item,
                                       jnp.int32),
                      spp_limit=jnp.full((n_dev,),
                                         2**31 - 1 if spp is None else spp,
                                         jnp.int32))


def make_sharded_launch(settings: RenderSettings, cam: cammod.Camera,
                        width: int, height: int, mesh: Mesh):
    """Build the sharded launch: (scene, state, film_data) →
    (state, film_data), all device-local work.

    Each device runs the *same* launch body as a single-chip launch — the
    full housekeeping / film-flush / re-arm cadence (swept on-chip, see
    BENCH.md) — not a per-micro-step housekeeping loop, so per-device
    throughput matches the single-chip step cost."""
    if settings.instrument:
        raise ValueError("config.instrument is single-device only (the "
                         "launch's stats output does not shard)")
    _, _, body = integrator.make_step_fn(settings, width, height,
                                         with_body=True)
    axis = mesh.axis_names[0]

    def local_launch(scene: Scene, cam: cammod.Camera,
                     st: integrator.PathState, fdata: jnp.ndarray):
        film = filmmod.Film(data=fdata[0], width=width, height=height)
        st, film = body(scene, cam, st, film)
        return st, film.data[None]

    state_spec = jax.tree.map(lambda _: P(axis), integrator.init_state(1))
    launch = shard_map(local_launch, mesh=mesh,
                       in_specs=(P(), P(), state_spec, P(axis)),
                       out_specs=(state_spec, P(axis)))
    return jax.jit(launch, donate_argnums=(2, 3))


def render_sharded(scene: Scene, cam: cammod.Camera,
                   settings: RenderSettings, width: int, height: int,
                   spp: int, mesh: Mesh | None = None,
                   pool_per_device: int = 1 << 16,
                   max_launches: int | None = None) -> filmmod.Film:
    """Render with the work queue split across the mesh; returns the merged
    film.  Sample means are bitwise independent of the device count."""
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    npix = width * height
    total = npix * (-(-spp // settings.samples_per_item))
    if total > 2**31 - 1:
        raise ValueError(f"work queue {total} items overflows int32; "
                         "render in chunks of fewer spp")

    launch = make_sharded_launch(settings, cam, width, height, mesh)
    st = init_sharded_state(pool_per_device, n_dev, total, spp,
                            samples_per_item=settings.samples_per_item)
    fdata = jnp.zeros((n_dev, npix + 1, 8), jnp.float32)
    # Lay the initial state/film out with the launch's own sharding BEFORE
    # the first call: otherwise call 1 (unsharded init arrays) and call 2
    # (the sharded donated outputs) present different input layouts and
    # XLA compiles the whole launch TWICE (measured: two back-to-back
    # ~8 min compiles of the production-shaped graph on the 1-core
    # XLA-CPU host — half of round 3's multichip-gate timeout).
    dev_sh = jax.sharding.NamedSharding(mesh, P(mesh.axis_names[0]))
    st = jax.tree.map(lambda x: jax.device_put(x, dev_sh), st)
    fdata = jax.device_put(fdata, dev_sh)

    launches = 0
    while True:
        st, fdata = launch(scene, cam, st, fdata)
        launches += 1
        if max_launches is not None and launches >= max_launches:
            break
        # a DONE lane still owns a pixel until the next housekeeping pass
        # retires it — require all-flushed too, else the last samples of a
        # launch are lost (lanes can go DONE mid-step, e.g. inline scatters
        # hitting max depth or escapes shading at the following retire)
        if bool(jnp.all(st.status == integrator.DONE)) and \
                bool(jnp.all(st.pixel < 0)) and \
                bool(jnp.all(st.next_item >= st.total_items)):
            break

    return filmmod.Film(data=fdata.sum(axis=0), width=width, height=height)
