"""Wavefront volumetric path tracer.

This is the TPU-native re-architecture of the reference's divergent
per-pixel megakernels (src/volumeRender_kernel.cu:1285-2318).  TPUs have no
SIMT divergence handling and no per-lane loops, so the nested
free-flight / null-collision / shadow-march loops become a flat
**state machine over a pool of rays**: every jitted micro-step advances all
lanes by one event, with per-lane phase masks instead of branches, and
retired lanes are immediately *regenerated* from a global (pixel, sample)
work queue so the pool stays fully occupied — this replaces both CUDA's
early-exiting threads and warp-level divergence with dense vector work.

Physics follows ``__d_render_bounded_decomp`` (kernel.cu:1958-2318) exactly,
with the DELTA / BOUNDED variants expressed as parameter degenerations of
the same step (see config.Tracker):

* segment setup      = intersectSuperVolume + local bounds + hyperion
                       schedule + decomposition control sampling
                       (kernel.cu:2017-2078)
* march              = one null-collision event of the inner loop
                       (kernel.cu:2082-2142), spectral-tracking weights with
                       history-aware average (Ps/Pn, kernel.cu:2106-2141)
* tracking restart   = kernel.cu:2149-2155
* NEE                = precomputed-opacity shortcut (kernel.cu:2181-2196) or
                       spectral shadow march ``Tr_spectral``
                       (kernel.cu:754-808), one event per micro-step
* scatter            = HG direction sampling (kernel.cu:2300-2303)

Every lane owns an independent RNG stream keyed by (pixel, sample)
(src/sampler.h), and a lane consumes a draw only when the corresponding
reference code path would — so per-sample random sequences are *identical*
to the reference's logical streams regardless of pool size, step batching,
or device sharding.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import RenderSettings, Tracker, FilterMode
from ..ops import rng as rngmod
from ..ops import vecmath as vm
from ..ops import aabb
from ..ops import grid as gridmod
from ..ops import phase as phasemod
from ..lighting import sun as sunmod
from . import camera as cammod
from . import film as filmmod
from .scene import Scene

# Lane phases.
NEW_SEGMENT = 0
MARCH = 1
SHADOW = 2
DONE = 3


@struct.dataclass
class PathState:
    """SoA state for a pool of N lanes."""

    # ray + path
    o: jnp.ndarray            # (N,3)
    d: jnp.ndarray            # (N,3)
    throughput: jnp.ndarray   # (N,3)
    radiance: jnp.ndarray     # (N,3)
    rng: jnp.ndarray          # (N,2) uint32
    pixel: jnp.ndarray        # (N,) i32 flat pixel; -1 = parked
    sample: jnp.ndarray       # (N,) i32 sample index of this lane
    num_scatters: jnp.ndarray  # (N,) i32
    status: jnp.ndarray       # (N,) i32
    # per-ray material (supports MULTI_CHANNEL later)
    sigma_t_spec: jnp.ndarray  # (N,3)
    sigma_s_spec: jnp.ndarray  # (N,3)
    # segment state
    t_far: jnp.ndarray        # (N,)
    dist: jnp.ndarray         # (N,)
    distc: jnp.ndarray        # (N,) control-collision distance
    sigma_t_prime: jnp.ndarray  # (N,)
    inv_sigma_t: jnp.ndarray  # (N,)
    inv_sigma: jnp.ndarray    # (N,) residual (distance-sampling) 1/σ
    sigma_c: jnp.ndarray      # (N,) control coefficient
    d_max: jnp.ndarray        # (N,)
    g_cur: jnp.ndarray        # (N,) phase g for this scatter order
    density_prime: jnp.ndarray  # (N,)
    # shadow state
    nee_coeff: jnp.ndarray    # (N,3) sun_power * T * phase
    sh_dist: jnp.ndarray      # (N,)
    sh_maxt: jnp.ndarray      # (N,)
    sh_inv_sigma: jnp.ndarray  # (N,)
    sh_rho: jnp.ndarray       # (N,) density_prime at NEE order
    sh_term: jnp.ndarray      # (N,3) termination flags (0/1)
    # work queue (shape (1,) so a device-sharded pool can carry one queue
    # cursor per device under shard_map)
    next_item: jnp.ndarray    # (1,) i32
    total_items: jnp.ndarray  # (1,) i32


def init_state(pool: int) -> PathState:
    z = lambda *s: jnp.zeros(s, jnp.float32)
    zi = lambda *s: jnp.zeros(s, jnp.int32)
    return PathState(
        o=z(pool, 3), d=z(pool, 3), throughput=z(pool, 3), radiance=z(pool, 3),
        rng=jnp.zeros((pool, 2), jnp.uint32),
        pixel=jnp.full((pool,), -1, jnp.int32), sample=zi(pool),
        num_scatters=zi(pool), status=jnp.full((pool,), DONE, jnp.int32),
        sigma_t_spec=z(pool, 3), sigma_s_spec=z(pool, 3),
        t_far=z(pool), dist=z(pool), distc=z(pool), sigma_t_prime=z(pool),
        inv_sigma_t=z(pool), inv_sigma=z(pool), sigma_c=z(pool),
        d_max=z(pool), g_cur=z(pool), density_prime=z(pool),
        nee_coeff=z(pool, 3), sh_dist=z(pool), sh_maxt=z(pool),
        sh_inv_sigma=z(pool), sh_rho=z(pool), sh_term=z(pool, 3),
        next_item=zi(1), total_items=zi(1))


def _w(mask, a, b):
    """where() broadcasting a (N,) mask against (N,...) operands."""
    m = mask
    while m.ndim < a.ndim:
        m = m[..., None]
    return jnp.where(m, a, b)


def _draw(state_rng, mask):
    """Advance RNG only for masked lanes; returns (rng', u)."""
    nxt, u = rngmod.next_float(state_rng)
    return _w(mask, nxt, state_rng), u


def _hyperion(num_scatters, g0, density):
    """Disney-Hyperion reduced scattering schedule (kernel.cu:2039-2043):
    s = clamp((n-5)/15), g' = (1-s)g, ρ' = ((1-s) + s(1-g))·ρ."""
    s = jnp.clip((num_scatters.astype(jnp.float32) - 5.0)
                 * jnp.float32(0.066666666666666666667), 0.0, 1.0)
    g = (1.0 - s) * g0
    reduction = (1.0 - s) + s * (1.0 - g0)
    return g, reduction * density


def _sample_density(scene: Scene, pos, linear: bool):
    """vol_sigma_t's raw grid fetch (kernel.cu:682-694), without the
    density scale."""
    return gridmod.sample_world(scene.density, pos, linear=linear)


def make_step_fn(settings: RenderSettings, cam: cammod.Camera,
                 width: int, height: int):
    """Build the jitted micro-step for a static (settings, resolution).

    The returned function advances (state, film) by one event per lane:
      retire/spawn → segment setup → march (+NEE prep) → shadow (+scatter).
    """
    linear = settings.filter_mode == FilterMode.LINEAR
    use_decomp = settings.tracker == Tracker.DECOMP
    local_bounds = settings.tracker != Tracker.DELTA
    search_radius = (settings.search_radius if local_bounds else 1e30)
    npix = width * height

    def spawn(scene: Scene, st: PathState) -> PathState:
        """Retire finished lanes into nothing (film add happens in retire)
        and pull new (pixel, sample) work items."""
        can = st.status == DONE
        rank = jnp.cumsum(can.astype(jnp.int32)) - can.astype(jnp.int32)
        item = st.next_item[0] + rank
        ok = can & (item < st.total_items[0])
        n_spawned = jnp.minimum(
            jnp.sum(can.astype(jnp.int32)),
            jnp.maximum(st.total_items[0] - st.next_item[0], 0))

        pixel = item % npix
        sample = item // npix
        px = pixel % width
        py = pixel // width
        new_rng = rngmod.init(px, py, sample)
        o, d = cammod.generate_rays(cam, width, height, px, py)

        sigma_t_spec = scene.mat.sigma_t[None, :] * jnp.ones_like(st.sigma_t_spec)
        sigma_s_spec = sigma_t_spec * scene.mat.albedo[None, :]

        return st.replace(
            o=_w(ok, o, st.o), d=_w(ok, d, st.d),
            throughput=_w(ok, jnp.ones_like(st.throughput), st.throughput),
            radiance=_w(ok, jnp.zeros_like(st.radiance), st.radiance),
            rng=_w(ok, new_rng, st.rng),
            pixel=jnp.where(ok, pixel, st.pixel),
            sample=jnp.where(ok, sample, st.sample),
            num_scatters=jnp.where(ok, 0, st.num_scatters),
            status=jnp.where(ok, NEW_SEGMENT, st.status),
            sigma_t_spec=_w(ok, sigma_t_spec, st.sigma_t_spec),
            sigma_s_spec=_w(ok, sigma_s_spec, st.sigma_s_spec),
            next_item=st.next_item + n_spawned)

    def retire(scene: Scene, st: PathState, film: filmmod.Film):
        flush = (st.status == DONE) & (st.pixel >= 0)
        rgb = jnp.maximum(st.radiance, 0.0) * scene.mat.brightness
        val = jnp.concatenate(
            [rgb, st.num_scatters.astype(jnp.float32)[:, None]], axis=-1)
        film = filmmod.add_samples(film, st.pixel, val, flush)
        st = st.replace(pixel=jnp.where(flush, -1, st.pixel))
        return st, film

    def segment_setup(scene: Scene, st: PathState) -> PathState:
        m = st.status == NEW_SEGMENT
        hit, t_near, t_far = aabb.intersect_supervolume(
            st.o, st.d, scene.density.box_min, scene.density.box_max,
            search_radius)

        # miss → escape radiance + done (kernel.cu:2024-2032)
        miss = m & ~hit
        bg = sunmod.background(scene.envmap.image, st.d, st.num_scatters,
                               scene.sun_dir, scene.sun_power_original,
                               settings.sun_light)
        radiance = _w(miss, st.radiance + bg * st.throughput, st.radiance)
        status = jnp.where(miss, DONE, st.status)

        seg = m & hit
        entry = st.o + st.d * t_near[:, None]
        if local_bounds:
            bound = gridmod.sample_world(scene.bound, entry, linear=False)
            d_max = jnp.maximum(1e-4, bound[..., 0])
            d_min = bound[..., 1]
        else:
            d_max = jnp.ones_like(t_near)
            d_min = jnp.zeros_like(t_near)

        g_cur, density_prime = _hyperion(st.num_scatters, scene.mat.g,
                                         scene.mat.density)
        max_sigma_t = vm.max_of(st.sigma_t_spec)
        min_sigma_t = vm.min_of(st.sigma_t_spec)
        sigma_t_prime = max_sigma_t * density_prime * d_max

        if use_decomp:
            dm = seg & (d_min > 0.0)
            rng2, u = _draw(st.rng, dm)
            sigma_c = min_sigma_t * density_prime * d_min
            distc = t_near - jnp.log(u) / jnp.maximum(sigma_c, 1e-20)
            sigma_r = jnp.maximum(sigma_t_prime - sigma_c, 1e-20)
            distc = jnp.where(dm, distc, 1e20)
            sigma_c = jnp.where(dm, sigma_c, 0.0)
            inv_sigma = jnp.where(dm, 1.0 / sigma_r, 1.0 / sigma_t_prime)
        else:
            rng2 = st.rng
            distc = jnp.full_like(t_near, 1e20)
            sigma_c = jnp.zeros_like(t_near)
            inv_sigma = 1.0 / sigma_t_prime

        return st.replace(
            radiance=radiance,
            status=jnp.where(seg, MARCH, status),
            rng=rng2,
            t_far=jnp.where(seg, t_far, st.t_far),
            dist=jnp.where(seg, t_near, st.dist),
            distc=jnp.where(seg, distc, st.distc),
            sigma_t_prime=jnp.where(seg, sigma_t_prime, st.sigma_t_prime),
            inv_sigma_t=jnp.where(seg, 1.0 / sigma_t_prime, st.inv_sigma_t),
            inv_sigma=jnp.where(seg, inv_sigma, st.inv_sigma),
            sigma_c=jnp.where(seg, sigma_c, st.sigma_c),
            d_max=jnp.where(seg, d_max, st.d_max),
            g_cur=jnp.where(seg, g_cur, st.g_cur),
            density_prime=jnp.where(seg, density_prime, st.density_prime))

    def nee_and_scatter_prep(scene: Scene, st: PathState, col, pos):
        """Shared by march (on collision): compute NEE coefficient, either
        take the baked-opacity shortcut + scatter now, or enter SHADOW.
        ``col`` is the collided-lane mask; ``pos`` the collision points.
        Corresponds to kernel.cu:2161-2303."""
        # post-increment hyperion (kernel.cu:2168-2178)
        _, rho2 = _hyperion(st.num_scatters, scene.mat.g, scene.mat.density)
        max_sigma_t = vm.max_of(st.sigma_t_spec)
        sigma_t_prime2 = max_sigma_t * rho2 * st.d_max
        inv_sigma2 = 1.0 / sigma_t_prime2

        phase_val = phasemod.hg_eval_dir(st.g_cur, st.d,
                                         scene.sun_dir[None, :])
        nee_coeff = (scene.sun_power[None, :] * st.throughput
                     * phase_val[:, None])

        if settings.sun_light and settings.precompute_opacity:
            shortcut = col & (st.sample > 10) & (st.num_scatters > 20)
            od = gridmod.sample_world(scene.opacity, pos, linear=True)
            a = jnp.exp(-st.sigma_t_spec * (rho2 * od)[:, None])
            radiance = _w(shortcut, st.radiance + nee_coeff * a, st.radiance)
        else:
            shortcut = jnp.zeros_like(col)
            radiance = st.radiance

        # shadow-ray setup (Tr_spectral preamble, kernel.cu:763-780)
        need_shadow = col & ~shortcut
        if settings.sun_light:
            sh_hit, sh_tn, sh_tf = aabb.intersect_box(
                pos, jnp.broadcast_to(scene.sun_dir, pos.shape),
                scene.density.box_min, scene.density.box_max)
            sh_miss = need_shadow & ~sh_hit   # Tr = 1 (kernel.cu:769-772)
            radiance = _w(sh_miss, radiance + nee_coeff, radiance)
            go_shadow = need_shadow & sh_hit
        else:
            sh_tn = sh_tf = jnp.zeros_like(st.sh_dist)
            sh_miss = need_shadow
            go_shadow = jnp.zeros_like(col)

        # lanes that skip the shadow march scatter immediately
        scatter_now = col & (shortcut | sh_miss)
        st = st.replace(radiance=radiance,
                        o=_w(col, pos, st.o),
                        nee_coeff=_w(go_shadow, nee_coeff, st.nee_coeff),
                        sh_dist=jnp.where(go_shadow, sh_tn, st.sh_dist),
                        sh_maxt=jnp.where(go_shadow, sh_tf, st.sh_maxt),
                        sh_inv_sigma=jnp.where(go_shadow, inv_sigma2,
                                               st.sh_inv_sigma),
                        sh_rho=jnp.where(go_shadow, rho2, st.sh_rho),
                        sh_term=_w(go_shadow, jnp.zeros_like(st.sh_term),
                                   st.sh_term),
                        status=jnp.where(go_shadow, SHADOW, st.status))
        return do_scatter(st, scatter_now)

    def do_scatter(st: PathState, m) -> PathState:
        """HG direction sampling + depth check (kernel.cu:2300-2304, loop
        condition kernel.cu:2015). Origin must already be at the collision
        point."""
        rng2, u0 = _draw(st.rng, m)
        rng2, u1 = _draw(rng2, m)
        new_d = phasemod.hg_sample(st.g_cur, st.d, u0, u1)
        deep = st.num_scatters >= settings.max_depth
        return st.replace(
            rng=rng2,
            d=_w(m, new_d, st.d),
            status=jnp.where(m, jnp.where(deep, DONE, NEW_SEGMENT), st.status))

    def march(scene: Scene, st: PathState) -> PathState:
        m = st.status == MARCH
        rng2, u = _draw(st.rng, m)
        dist = st.dist - jnp.log(u) * st.inv_sigma
        brk = (dist >= st.distc) | (dist >= st.t_far)
        through = m & brk & (jnp.minimum(st.distc, dist) >= st.t_far)
        collide_ctrl = m & brk & ~through

        pos_event = st.o + st.d * dist[:, None]
        pos_ctrl = st.o + st.d * st.distc[:, None]

        # null-collision event (kernel.cu:2106-2141)
        ev = m & ~brk
        den = _sample_density(scene, pos_event, linear) * st.density_prime
        sigma_t_den = st.sigma_t_spec * den[:, None] - st.sigma_c[:, None]
        sigma_s_den = st.sigma_s_spec * den[:, None] - st.sigma_c[:, None]
        sigma_n_den = st.sigma_t_prime[:, None] - sigma_t_den
        ps = vm.sum_of(jnp.abs(sigma_t_den * st.throughput))
        pn = vm.sum_of(jnp.abs(sigma_n_den * st.throughput))
        c = ps + pn
        rng2, u2 = _draw(rng2, ev)
        e = u2 * c
        real = ev & (e < ps)
        null = ev & ~real

        w_real = sigma_s_den * (st.inv_sigma_t * c
                                / jnp.maximum(ps, 1e-30))[:, None]
        w_null = sigma_n_den * (st.inv_sigma_t * c
                                / jnp.maximum(pn, 1e-30))[:, None]
        throughput = st.throughput
        throughput = _w(real, throughput * w_real, throughput)
        throughput = _w(null, throughput * w_null, throughput)

        collided = real | collide_ctrl
        st = st.replace(
            rng=rng2,
            dist=jnp.where(m, dist, st.dist),
            throughput=throughput,
            o=_w(through, st.o + st.d * st.t_far[:, None], st.o),
            status=jnp.where(through, NEW_SEGMENT, st.status),
            num_scatters=st.num_scatters + collided.astype(jnp.int32))

        pos = _w(collide_ctrl, pos_ctrl, pos_event)
        return nee_and_scatter_prep(scene, st, collided, pos)

    def shadow(scene: Scene, st: PathState) -> PathState:
        m = st.status == SHADOW
        rng2, u = _draw(st.rng, m)
        sh_dist = st.sh_dist - jnp.log(u) * st.sh_inv_sigma
        all_term = vm.min_of(st.sh_term) > 0.5
        done = m & ((sh_dist >= st.sh_maxt) | all_term)
        stepm = m & ~done

        pos = st.o + scene.sun_dir[None, :] * sh_dist[:, None]
        den = _sample_density(scene, pos, linear) * st.sh_rho
        rng2, e = _draw(rng2, stepm)
        new_term = jnp.maximum(
            st.sh_term,
            (e[:, None] < st.sigma_t_spec * (den * st.sh_inv_sigma)[:, None])
            .astype(jnp.float32))
        sh_term = _w(stepm, new_term, st.sh_term)

        a = 1.0 - st.sh_term  # flags at loop exit (kernel.cu:807)
        radiance = _w(done, st.radiance + st.nee_coeff * a, st.radiance)

        st = st.replace(rng=rng2,
                        sh_dist=jnp.where(m, sh_dist, st.sh_dist),
                        sh_term=sh_term,
                        radiance=radiance)
        return do_scatter(st, done)

    def step(scene: Scene, st: PathState, film: filmmod.Film):
        st, film = retire(scene, st, film)
        st = spawn(scene, st)
        st = segment_setup(scene, st)
        st = march(scene, st)
        st = shadow(scene, st)
        return st, film

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def launch(scene: Scene, st: PathState, film: filmmod.Film):
        # The micro-steps are Python-unrolled rather than rolled into
        # lax.fori_loop/scan: on TPU, XLA lowers gathers inside loop bodies
        # to a serialized path that is orders of magnitude slower than the
        # top-level dynamic-gather kernel (measured ~4600x on v5e).  The
        # trilinear fetches are the hot op, so the step graph is replicated
        # steps_per_launch times instead — same math, fast gathers.
        for _ in range(settings.steps_per_launch):
            st, film = step(scene, st, film)
        return st, film

    return step, launch


def render(scene: Scene, cam: cammod.Camera, settings: RenderSettings,
           width: int, height: int, spp: int,
           pool: int | None = None,
           film: filmmod.Film | None = None) -> filmmod.Film:
    """Render ``spp`` samples per pixel progressively; returns the film.

    Equivalent of the display loop driving render_kernel once per sample
    (volumeRender.cpp:613-641), but the wavefront retires and respawns
    samples continuously.
    """
    npix = width * height
    if pool is None:
        pool = min(npix, 1 << 19)
    _, launch = make_step_fn(settings, cam, width, height)
    st = init_state(pool)
    st = st.replace(total_items=jnp.full((1,), npix * spp, jnp.int32))
    if film is None:
        film = filmmod.make_film(width, height)

    while True:
        st, film = launch(scene, st, film)
        done = bool(jnp.all(st.status == DONE)) and \
            int(st.next_item[0]) >= int(st.total_items[0])
        if done:
            break
    return film
