"""Wavefront volumetric path tracer.

This is the TPU-native re-architecture of the reference's divergent
per-pixel megakernels (src/volumeRender_kernel.cu:1285-2318).  TPUs have no
SIMT divergence handling and no per-lane loops, so the nested
free-flight / null-collision / shadow-march loops become a flat
**state machine over a pool of rays**: every jitted micro-step advances all
lanes by one event, with per-lane phase masks instead of branches, and
retired lanes are *regenerated* from a global (pixel, sample) work queue so
the pool stays fully occupied — this replaces both CUDA's early-exiting
threads and warp-level divergence with dense vector work.

TPU-specific design points (measured on v5e — random gathers cost ~8 ns per
element regardless of table size, so performance is set by (a) gathered
elements per micro-step and (b) micro-steps per camera sample):

* The camera-path null-collision march and the NEE shadow march are **one
  unified code path**: both advance ``dist += -ln(U)/σ`` and fetch the
  density grid once per micro-step; a lane's mode only changes which
  (cheap, masked) state update applies.
* Segments come from a **coarse multiscale bound pyramid with a
  distance-to-solid leap channel** (ops.boundgrid.build_multiscale_bounds)
  instead of the reference's full-resolution bound texture: each lane takes
  the largest scale whose expected residual-event count per segment stays
  under a small budget — vacuum leaps the baked empty radius in one
  draw-free micro-step, saturated and smooth interiors take long
  analytic-control segments, and only loose-majorant shells march at
  ``search_radius``.  The reference instead creeps through empty space one
  ``search_radius`` (and one majorant-floor free-flight draw) at a time
  (kernel.cu:1654 ``fminf(smallest_tmax, search_radius)``, :2044 1e-4
  majorant floor).
* Shadow transmittance is **segmented**: per segment the control medium
  ``σ_c = σ_t·ρ·d_min`` contributes an exact ``exp(-σ_c·len)`` factor
  (homogeneous interior segments cost no events at all) and only the
  residual ``σ_t·ρ·(ρ(x)-d_min)`` is tracked.  Two estimators for the
  residual (config.ShadowMode): **BINARY** — the reference's
  ``Tr_spectral`` (kernel.cu:754-808), one shared draw kills channel ch
  with probability ``σ_r,ch(x)/σ̄_r`` so optically thick chords terminate
  after ~one real collision (measured 4.5× throughput on the dense-cloud
  scene; the default, like the reference) — and **RATIO**, the
  expected-value refinement with the deterministic weight
  ``1 - σ_r,ch(x)/σ̄_r`` per event: identical expectation, strictly lower
  variance, but it marches every event of the chord in smooth media.
* Micro-steps are Python-unrolled inside one jit (not lax.fori_loop): XLA
  lowers gathers inside loop bodies to a serialized path that is orders of
  magnitude slower than top-level dynamic gathers.
* With ``config.unified_march`` every pass serves BOTH segment setup and
  marching from ONE pool-wide gather of a fused row table (in-graph:
  packed density rows ++ bound-pyramid rows): the two consumer sets are
  disjoint per pass, so the legacy structure's third gather (the setup
  pass's bound fetch) disappears and no lane idles a march sub-step
  waiting for the next setup pass.  Draw sequences and arithmetic are
  bit-identical between the structures (tests/test_unified.py).

Physics follows ``__d_render_bounded_decomp`` (kernel.cu:1958-2318), with
the DELTA / BOUNDED variants expressed as parameter degenerations of the
same step (see config.Tracker):

* segment setup      = intersectSuperVolume + local bounds + hyperion
                       schedule + decomposition control sampling
                       (kernel.cu:2017-2078)
* march              = one null-collision event of the inner loop
                       (kernel.cu:2082-2142), spectral-tracking weights with
                       history-aware average (kernel.cu:2106-2141)
* tracking restart   = kernel.cu:2149-2155
* NEE                = precomputed-opacity shortcut (kernel.cu:2181-2196) or
                       the segmented shadow march (``Tr_spectral``
                       kernel.cu:754-808, refined as described above)
* scatter            = HG direction sampling (kernel.cu:2300-2303)

Every lane owns an independent RNG stream keyed by (pixel, sample)
(src/sampler.h), and a lane consumes a draw only when the corresponding
event happens — per-sample random sequences are *identical* regardless of
pool size, step batching, or device sharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from ..config import (RenderSettings, Tracker, FilterMode, EnvmapMode,
                      SpectralMode, ShadowMode)
from ..ops import rng as rngmod
from ..ops import vecmath as vm
from ..ops import aabb
from ..ops import grid as gridmod
from ..ops import phase as phasemod
from ..lighting import envmap as envmod
from ..lighting import sun as sunmod
from . import camera as cammod
from . import film as filmmod
from .scene import Scene, unpack_od, to_model_point, to_model_dir

# Lane phases.  A lane is either setting up a segment (path or shadow,
# selected by ``shadow``), marching inside one, waiting for the batched
# scatter pass (SCATTER), or done.  Scattering, film accumulation, escape
# shading and respawn are *housekeeping*: they concern ~2% of lanes per
# step, so they run once every ``spawn_every`` micro-steps instead of
# paying pool-wide transcendentals/scatter-adds every step (measured
# 8.2 + 9.3 ns/lane-step on v5e when run inline).
NEW_SEGMENT = 0
MARCH = 1
SCATTER = 2
DONE = 3


@struct.dataclass
class PathState:
    """SoA state for a pool of N lanes.

    The segment registers are shared between path marching and shadow
    marching (they are dead across the transition):

    ===========  ==============================  ===========================
    register     path mode                       shadow mode
    ===========  ==============================  ===========================
    dist         march distance from o along d   march distance from o
                                                 along sun_dir
    t_max        segment end                     segment end
    distc        decomposition control distance  total chord end (t_far of
                                                 the sun ray)
    inv_sigma    1/σ_r (residual free-flight)    1/σ̄_r (residual majorant)
    d_max        local max density of segment    local *min* density of
                                                 segment (control)
    ===========  ==============================  ===========================
    """

    o: jnp.ndarray            # (N,3) ray origin / collision point
    d: jnp.ndarray            # (N,3) path direction
    throughput: jnp.ndarray   # (N,3)
    radiance: jnp.ndarray     # (N,3)
    rng: jnp.ndarray          # (N,2) uint32
    pixel: jnp.ndarray        # (N,) i32 flat pixel; -1 = parked
    sample: jnp.ndarray       # (N,) i32
    num_scatters: jnp.ndarray  # (N,) i32
    status: jnp.ndarray       # (N,) i32
    shadow: jnp.ndarray       # (N,) bool — lane is shadow-marching
    esc: jnp.ndarray          # (N,) bool — escaped; background owed at
                              # retire (the envmap fetch batches there)
    # unified segment registers (see class docstring)
    dist: jnp.ndarray         # (N,)
    t_max: jnp.ndarray        # (N,)
    inv_sigma: jnp.ndarray    # (N,)
    sigma_t_prime: jnp.ndarray  # (N,)
    distc: jnp.ndarray        # (N,)
    sigma_c: jnp.ndarray      # (N,) control coefficient (path mode)
    d_max: jnp.ndarray        # (N,)
    g_cur: jnp.ndarray        # (N,) phase g of this scatter order
    density_prime: jnp.ndarray  # (N,) hyperion-reduced density scale
    # NEE registers
    nee_coeff: jnp.ndarray    # (N,3) light * T * phase (sun or envmap MIS)
    sh_tr: jnp.ndarray        # (N,3) running shadow transmittance
    # MIS registers (EnvmapMode.MIS only; dead pass-throughs otherwise)
    shadow_dir: jnp.ndarray   # (N,3) current shadow-march direction
    env_stage: jnp.ndarray    # (N,) bool — the envmap NEE is in flight/done
    # pending banked escape (config.eager_rearm): when a sample completes
    # by escaping, the lane re-arms its next sample immediately and owes
    # the film row for the *banked* sample — the costly envmap fetch is
    # deferred to the next batched fold pass, which shades
    # pend_rad + bg(pend_dir)·pend_coeff and folds the row into ``acc``.
    # ``pend_scat`` doubles as the slot flag (-1 = free) and the banked
    # sample's heat value.
    pend_dir: jnp.ndarray     # (N,3) escape direction
    pend_coeff: jnp.ndarray   # (N,3) throughput at escape
    pend_rad: jnp.ndarray     # (N,3) radiance before the background term
    pend_scat: jnp.ndarray    # (N,) i32; -1 = no pending escape
    # per-lane film accumulator in the film's own row layout
    # (r, g, b, heat, count, r², g², b²): finished samples fold here and
    # the whole-pool film scatter-add runs once per work item / flush
    # cadence instead of once per sample (see config.samples_per_item)
    acc: jnp.ndarray          # (N,8) f32
    # first sample NOT in the lane's current work item (= spawn sample +
    # the queue's item size at spawn time) — item granularity is a traced
    # register, not a compile-time static, so every samples_per_item value
    # shares one compiled graph and ``render`` can taper the last item
    # generation to 1-sample items (the drain tail is one item long)
    item_end: jnp.ndarray     # (N,) i32
    # work queue; shape (1,) so sharded pools carry one cursor per device
    next_item: jnp.ndarray    # (1,) i32
    total_items: jnp.ndarray  # (1,) i32
    # samples per newly spawned work item (item i ↦ pixel i % npix,
    # samples [(i // npix)·k, (i // npix)·k + k))
    k_queue: jnp.ndarray      # (1,) i32
    # sample count bound of the render (clips the last multi-sample item)
    spp_limit: jnp.ndarray    # (1,) i32


def init_state(pool: int, samples_per_item: int = 1) -> PathState:
    z = lambda *s: jnp.zeros(s, jnp.float32)
    zi = lambda *s: jnp.zeros(s, jnp.int32)
    return PathState(
        o=z(pool, 3), d=z(pool, 3), throughput=z(pool, 3), radiance=z(pool, 3),
        rng=jnp.zeros((pool, 2), jnp.uint32),
        pixel=jnp.full((pool,), -1, jnp.int32), sample=zi(pool),
        num_scatters=zi(pool), status=jnp.full((pool,), DONE, jnp.int32),
        shadow=jnp.zeros((pool,), bool), esc=jnp.zeros((pool,), bool),
        dist=z(pool), t_max=z(pool), inv_sigma=z(pool),
        sigma_t_prime=z(pool), distc=z(pool), sigma_c=z(pool), d_max=z(pool),
        g_cur=z(pool), density_prime=z(pool),
        nee_coeff=z(pool, 3), sh_tr=z(pool, 3),
        shadow_dir=z(pool, 3), env_stage=jnp.zeros((pool,), bool),
        pend_dir=z(pool, 3), pend_coeff=z(pool, 3), pend_rad=z(pool, 3),
        pend_scat=jnp.full((pool,), -1, jnp.int32),
        acc=z(pool, 8),
        item_end=zi(pool),
        next_item=zi(1), total_items=zi(1),
        k_queue=jnp.full((1,), samples_per_item, jnp.int32),
        spp_limit=jnp.full((1,), 2**31 - 1, jnp.int32))


def _w(mask, a, b):
    m = mask
    while m.ndim < a.ndim:
        m = m[..., None]
    return jnp.where(m, a, b)


def _hyperion(num_scatters, g0, density):
    """Disney-Hyperion reduced scattering (kernel.cu:2039-2043)."""
    s = jnp.clip((num_scatters.astype(jnp.float32) - 5.0)
                 * jnp.float32(0.066666666666666666667), 0.0, 1.0)
    g = (1.0 - s) * g0
    reduction = (1.0 - s) + s * (1.0 - g0)
    return g, reduction * density


def _sample_density(scene: Scene, pos, linear: bool):
    """vol_sigma_t's raw grid fetch (kernel.cu:682-694), unscaled; applies
    the optional world→model transform (kernel.cu:684-685)."""
    return gridmod.sample_world(scene.density, to_model_point(scene, pos),
                                linear=linear)


def make_step_fn(settings: RenderSettings, width: int, height: int,
                 with_body: bool = False):
    """Build the jitted micro-step/launch for static (settings, resolution).

    ``samples_per_item`` does not appear in the traced graph (item
    granularity rides the state's ``k_queue``/``item_end`` registers), so
    it is canonicalized out of the memo key here: every item size shares
    ONE jit wrapper and ONE compiled executable — K sweeps and the
    ``render`` tail taper cost zero recompiles."""
    return _make_step_fn(settings.replace(samples_per_item=1),
                         width, height, with_body)


@functools.lru_cache(maxsize=None)
def _make_step_fn(settings: RenderSettings, width: int, height: int,
                  with_body: bool = False):
    """Build the jitted micro-step/launch for static (settings, resolution).

    Memoized: every caller with the same static config shares ONE jit
    wrapper, so executables compiled by ``prewarm_drain`` are served from
    the in-process jit cache when ``render`` (or bench/sweep/viewer code)
    launches later — separate wrappers each re-trace and, on the remote
    TPU backend, re-compile identical signatures (measured 24-160 s per
    launch graph; the persistent cache does not reliably serve them).

    The camera is a traced argument of the returned functions — moving it
    re-runs, never re-compiles (the reference equivalently re-uploads
    ``c_invViewMatrix`` per frame, volumeRender.cpp:617-625).

    The step advances every lane one event:
      [housekeeping] → segment setup (path | shadow) → unified march.

    With ``with_body=True`` also returns the un-jitted launch body (the
    full housekeeping/flush/rearm cadence loop) for embedding in larger
    jitted programs — the multi-chip path wraps it in ``shard_map``
    (parallel/shard.py) so every device runs the same swept cadence as a
    single-chip launch.
    """
    linear = settings.filter_mode == FilterMode.LINEAR
    op_linear = settings.opacity_filter == FilterMode.LINEAR
    binary_shadow = settings.shadow_mode == ShadowMode.BINARY
    use_decomp = settings.tracker == Tracker.DECOMP
    local_bounds = settings.tracker != Tracker.DELTA
    use_mis = settings.envmap_mode == EnvmapMode.MIS
    ref_march = settings.reference_march
    if ref_march and use_mis:
        raise ValueError("reference_march parity covers the reference's "
                         "active configuration (PASSIVE_ENVMAP=1) only")
    if ref_march and settings.cheap_rng:
        raise ValueError("reference_march is the draw-for-draw parity mode; "
                         "cheap_rng replaces the reference generator — "
                         "pick one")
    npix = width * height

    # RNG primitives: the reference-parity hash+xoroshiro generator, or the
    # opt-in production counter generator (config.cheap_rng).  Both keep
    # streams (pixel, sample)-keyed; all consumption masks/ordering below
    # are generator-agnostic.
    if settings.cheap_rng:
        rng_next_f = rngmod.cheap_next
        rng_init_f = rngmod.cheap_init
    else:
        rng_next_f = rngmod.rng_next
        rng_init_f = rngmod.init

    def _next_float(state):
        state, raw = rng_next_f(state)
        return state, rngmod.bits_to_float(raw)

    def _draw(state_rng, mask):
        """Advance RNG only for masked lanes; returns (rng', u)."""
        nxt, u = _next_float(state_rng)
        return _w(mask, nxt, state_rng), u

    def mono_scene(scene: Scene) -> Scene:
        """SpectralMode.MONO ignores Param.sigma_t and runs an achromatic
        medium (reference ``float sigma_t = density``, kernel.cu:1328-1329);
        with σt ≡ 1 the spectral-tracking weights reduce to plain delta
        tracking with throughput *= albedo per real scatter."""
        if settings.spectral != SpectralMode.MONO:
            return scene
        return scene.replace(mat=scene.mat.replace(
            sigma_t=jnp.ones((3,), jnp.float32)))

    def _sample_regs(px, py, sample, throughput_like):
        """Fresh per-sample registers: the (pixel, sample)-keyed RNG stream
        and the initial throughput (shared by queue spawn and in-item
        re-arm so multi-sample items are draw-for-draw identical to
        one-sample items)."""
        new_rng = rng_init_f(px, py, sample)
        if settings.spectral == SpectralMode.MULTI_CHANNEL:
            # one wavelength per sample: channel = min((1-u)*3, 2.9999998)
            # drawn right after rng init; the sample writes channel ch
            # scaled by 3 (kernel.cu:1319-1321, 1583-1586) — expressed here
            # as a one-hot ×3 initial throughput through the same spectral
            # machinery (identical expectation, max-σt majorant).
            new_rng, u = _next_float(new_rng)
            ch = jnp.minimum((1.0 - u) * 3.0,
                             jnp.float32(2.9999998)).astype(jnp.int32)
            tp = jax.nn.one_hot(ch, 3, dtype=jnp.float32) * 3.0
        else:
            tp = jnp.ones_like(throughput_like)
        return new_rng, tp

    def spawn(scene: Scene, cam: cammod.Camera,
              st: PathState, order=None) -> PathState:
        """Pull new work items into retired lanes.  An item is
        ``samples_per_item`` consecutive samples of one pixel; the lane
        runs them back-to-back (fold_and_rearm) and flushes once.

        ``order`` (optional (npix,) i32 permutation) remaps the pixel slot
        of every sample block — issuing hard pixels first (see
        ``heat_order``) is pure makespan scheduling: per-sample draw
        sequences are (pixel, sample)-keyed, so the film converges to the
        identical result; only the straggler drain shrinks."""
        can = (st.status == DONE) & (st.pixel < 0)
        rank = jnp.cumsum(can.astype(jnp.int32)) - can.astype(jnp.int32)
        item = st.next_item[0] + rank
        ok = can & (item < st.total_items[0])
        n_spawned = jnp.minimum(
            jnp.sum(can.astype(jnp.int32)),
            jnp.maximum(st.total_items[0] - st.next_item[0], 0))

        pixel = item % npix
        if order is not None:
            pixel = jnp.take(order, pixel, axis=0)
        sample = (item // npix) * st.k_queue[0]
        px = pixel % width
        py = pixel // width
        new_rng, tp = _sample_regs(px, py, sample, st.throughput)
        o, d = cammod.generate_rays(cam, width, height, px, py)

        return st.replace(
            o=_w(ok, o, st.o), d=_w(ok, d, st.d),
            throughput=_w(ok, tp, st.throughput),
            radiance=_w(ok, jnp.zeros_like(st.radiance), st.radiance),
            rng=_w(ok, new_rng, st.rng),
            pixel=jnp.where(ok, pixel, st.pixel),
            sample=jnp.where(ok, sample, st.sample),
            num_scatters=jnp.where(ok, 0, st.num_scatters),
            status=jnp.where(ok, NEW_SEGMENT, st.status),
            shadow=jnp.where(ok, False, st.shadow),
            esc=jnp.where(ok, False, st.esc),
            acc=_w(ok, jnp.zeros_like(st.acc), st.acc),
            item_end=jnp.where(ok, sample + st.k_queue[0], st.item_end),
            env_stage=(jnp.where(ok, False, st.env_stage) if use_mis
                       else st.env_stage),
            next_item=st.next_item + n_spawned)

    def _fold_row(radiance, num_scatters, brightness):
        """One film row from a finished sample (kernel.cu:2306-2317:
        radiance clamped >=0, x brightness, heat = num_scatters)."""
        rgb = jnp.maximum(radiance, 0.0) * brightness
        one = jnp.ones(rgb.shape[:-1] + (1,), jnp.float32)
        return jnp.concatenate(
            [rgb, num_scatters.astype(jnp.float32)[:, None], one,
             rgb * rgb], axis=-1)

    def _rearm(cam: cammod.Camera, st: PathState, consumed) -> PathState:
        """Lanes whose sample was just consumed (folded or banked) re-arm
        the item's next sample immediately -- without touching the work
        queue or the film; item-complete lanes park (num_scatters = -1
        marks 'awaiting flush')."""
        next_sample = st.sample + 1
        more = consumed \
            & (next_sample < st.item_end) \
            & (next_sample < st.spp_limit[0])
        px = st.pixel % width
        py = st.pixel // width
        new_rng, tp = _sample_regs(px, py, next_sample, st.throughput)
        o, d = cammod.generate_rays(cam, width, height, px, py)
        return st.replace(
            o=_w(more, o, st.o), d=_w(more, d, st.d),
            throughput=_w(more, tp, st.throughput),
            radiance=_w(more, jnp.zeros_like(st.radiance), st.radiance),
            rng=_w(more, new_rng, st.rng),
            sample=jnp.where(more, next_sample, st.sample),
            num_scatters=jnp.where(
                more, 0, jnp.where(consumed, -1, st.num_scatters)),
            status=jnp.where(more, NEW_SEGMENT, st.status),
            shadow=jnp.where(more, False, st.shadow),
            esc=jnp.where(consumed, False, st.esc),
            env_stage=(jnp.where(more, False, st.env_stage) if use_mis
                       else st.env_stage))

    def fold_and_rearm(scene: Scene, cam: cammod.Camera,
                       st: PathState) -> PathState:
        """The batched fold pass: shade escapes (the deferred envmap
        gather, kernel.cu:2024-2032, at fold cadence instead of every
        micro-step), fold finished samples into the lane accumulator, and
        re-arm/park via ``_rearm``.  With ``eager_rearm`` the same single
        gather also *resolves* banked pending escapes
        (``PathState.pend_*``) -- those lanes already re-armed inside a
        micro-step and only owe the film row."""
        complete = (st.status == DONE) & (st.pixel >= 0) \
            & (st.num_scatters >= 0)
        if eager:
            pend = st.pend_scat >= 0
            dir_sel = _w(pend, st.pend_dir, st.d)
            scat_sel = jnp.where(pend, st.pend_scat, st.num_scatters)
            bg = sunmod.background(scene.envmap.image, dir_sel, scat_sel,
                                   scene.sun_dir, scene.sun_power_original,
                                   settings.sun_light)
            prad = st.pend_rad + bg * st.pend_coeff
            acc = _w(pend,
                     st.acc + _fold_row(prad, st.pend_scat,
                                        scene.mat.brightness),
                     st.acc)
            st = st.replace(acc=acc,
                            pend_scat=jnp.where(pend, -1, st.pend_scat))
            # A lane whose slot was occupied keeps its *current* complete
            # sample unfolded this pass (the next eager pass banks it) --
            # each lane's film rows accumulate in exact sample order, so
            # films stay bit-identical across pool sizes and cadences.
            complete = complete & ~pend
        else:
            bg = sunmod.background(scene.envmap.image, st.d,
                                   st.num_scatters, scene.sun_dir,
                                   scene.sun_power_original,
                                   settings.sun_light)
        if use_mis:
            # under MIS escapes only contribute at depth 0
            # (the #else branch of kernel.cu:2026-2031)
            bg = _w(st.num_scatters == 0, bg, jnp.zeros_like(bg))
        radiance = _w(complete & st.esc, st.radiance + bg * st.throughput,
                      st.radiance)
        acc = _w(complete,
                 st.acc + _fold_row(radiance, st.num_scatters,
                                    scene.mat.brightness),
                 st.acc)
        return _rearm(cam, st.replace(acc=acc), complete)

    def eager_fold(scene: Scene, cam: cammod.Camera,
                   st: PathState) -> PathState:
        """``config.eager_rearm``: the in-micro-step fold/re-arm -- no
        gather, no film access.  A completed non-escape sample folds its
        row immediately; a completed escape *banks* the background-
        dependent part into the lane's pending slot (resolved by the next
        ``fold_and_rearm``) -- either way the lane re-arms the item's
        next sample now instead of idling until the next fold pass (the
        measured 8.1 fold-wait steps/sample, BENCH.md occupancy table).
        A lane whose pending slot is still occupied waits (pre-eager
        behavior), preserving exact in-lane sample order."""
        complete = (st.status == DONE) & (st.pixel >= 0) \
            & (st.num_scatters >= 0) & (st.pend_scat < 0)
        bank = complete & st.esc
        fold_now = complete & ~st.esc
        acc = _w(fold_now,
                 st.acc + _fold_row(st.radiance, st.num_scatters,
                                    scene.mat.brightness),
                 st.acc)
        st = st.replace(
            acc=acc,
            pend_dir=_w(bank, st.d, st.pend_dir),
            pend_coeff=_w(bank, st.throughput, st.pend_coeff),
            pend_rad=_w(bank, st.radiance, st.pend_rad),
            pend_scat=jnp.where(bank, st.num_scatters, st.pend_scat))
        return _rearm(cam, st, complete)

    def flush_film(st: PathState, film: filmmod.Film):
        """The whole-pool film scatter-add (~92 ns/row on v5e — the
        costliest single op in a launch; see config.flush_every)."""
        fmask = (st.status == DONE) & (st.pixel >= 0)
        if eager:
            # Only flush *parked* lanes (num_scatters = -1) whose pending
            # slot is resolved: under eager re-arm a lane can be DONE with
            # a *complete-but-unfolded* current sample (its pending slot
            # was occupied when it finished — fold_and_rearm resolves the
            # slot but defers the current sample to the next eager pass).
            # Flushing such a lane would retire the pixel with that sample
            # still unaccumulated — a lost sample (caught by
            # tests/test_eager.py::test_eager_thin_scene_slot_contention).
            # Without eager this mask is provably identical to the one
            # above: the fold pass right before every flush folds every
            # complete lane, so DONE & pixel≥0 ⇒ parked.
            fmask = fmask & (st.num_scatters < 0) & (st.pend_scat < 0)
        film = filmmod.add_rows(film, st.pixel, st.acc, fmask)
        return st.replace(pixel=jnp.where(fmask, -1, st.pixel)), film

    def do_scatter(st: PathState, m) -> PathState:
        """HG direction sampling + depth check (kernel.cu:2300-2304; loop
        condition :2015).  Also exits shadow mode.  Both draws share one
        mask, so the RNG state commits once (two-step lookahead)."""
        rs1, raw0 = rng_next_f(st.rng)
        rs2, raw1 = rng_next_f(rs1)
        u0 = rngmod.bits_to_float(raw0)
        u1 = rngmod.bits_to_float(raw1)
        new_d = phasemod.hg_sample(st.g_cur, st.d, u0, u1)
        deep = st.num_scatters >= settings.max_depth
        return st.replace(
            rng=_w(m, rs2, st.rng),
            d=_w(m, new_d, st.d),
            shadow=jnp.where(m, False, st.shadow),
            env_stage=(jnp.where(m, False, st.env_stage) if use_mis
                       else st.env_stage),
            status=jnp.where(m, jnp.where(deep, DONE, NEW_SEGMENT), st.status))

    def env_nee_start(scene: Scene, st: PathState, m):
        """One-sample MIS between the phase function and the envmap
        luminance CDF (the PASSIVE_ENVMAP=0 branch, kernel.cu:2220-2297).

        Returns (state, scatter_now): lanes whose MIS ray misses the box
        (Tr=1, contribution added) or whose envmap pdf is zero scatter
        immediately; the rest enter a second segmented shadow march along
        the sampled direction."""
        rng2, u_s = _draw(st.rng, m)
        rng2, u0 = _draw(rng2, m)
        rng2, u1 = _draw(rng2, m)
        by_phase = u_s < 0.5

        # strategy A: sample the phase function, evaluate the envmap
        dir_p = phasemod.hg_sample(st.g_cur, st.d, u0, u1)
        envc_p = envmod.eval_dir(scene.envmap.image, dir_p)
        pdf_brdf = phasemod.hg_eval_dir(st.g_cur, st.d, dir_p)
        pdf_env_v = envmod.pdf_dir(scene.envmap, envc_p)
        # balance heuristic over strategy-weighted pdfs, / P_phase
        w_p = pdf_brdf / jnp.maximum(0.5 * (pdf_brdf + pdf_env_v), 1e-30)
        coeff_p = envc_p * st.throughput * w_p[:, None]

        # strategy B: sample the envmap CDF, evaluate the phase
        uu, vv, envc_e, pdf_env = envmod.sample(scene.envmap, u0, u1)
        dir_e = envmod.uv_to_dir(uu, vv)
        ph_e = phasemod.hg_eval_dir(st.g_cur, st.d, dir_e)
        w_e = pdf_env / jnp.maximum(0.5 * (pdf_env + ph_e), 1e-30)
        coeff_e = (envc_e * st.throughput
                   * (ph_e / jnp.maximum(pdf_env, 1e-30) * w_e)[:, None])
        # pdf_env <= 0 → zero contribution (the reference `continue`s,
        # skipping the scatter too — kernel.cu:2266; here the lane still
        # scatters, which only differs for zero-luminance texels)
        coeff_e = _w(pdf_env > 0.0, coeff_e, jnp.zeros_like(coeff_e))

        nee_dir = _w(by_phase, dir_p, dir_e)
        coeff = _w(by_phase, coeff_p, coeff_e)

        sh_hit, sh_tn, sh_tf = aabb.intersect_box(
            to_model_point(scene, st.o), to_model_dir(scene, nee_dir),
            scene.density.box_min, scene.density.box_max)
        go = m & sh_hit
        scatter_now = m & ~sh_hit
        radiance = _w(scatter_now, st.radiance + coeff, st.radiance)

        st = st.replace(
            rng=rng2,
            radiance=radiance,
            nee_coeff=_w(go, coeff, st.nee_coeff),
            sh_tr=_w(go, jnp.ones_like(st.sh_tr), st.sh_tr),
            shadow_dir=_w(go, nee_dir, st.shadow_dir),
            dist=jnp.where(go, sh_tn, st.dist),
            distc=jnp.where(go, sh_tf, st.distc),
            shadow=jnp.where(go, True, st.shadow),
            env_stage=jnp.where(m, True, st.env_stage),
            status=jnp.where(go, NEW_SEGMENT, st.status))
        return st, scatter_now

    def housekeeping(scene: Scene, cam: cammod.Camera, st: PathState,
                     film: filmmod.Film, flush: bool = True, order=None):
        """The batched per-``spawn_every`` pass: process pending scatters
        (under MIS the sun estimate is followed by the envmap estimate
        before scattering), shade escapes + fold finished samples, re-arm
        in-item lanes; on ``flush`` passes also scatter-add the film and
        respawn from the work queue."""
        pend = st.status == SCATTER
        if use_mis:
            done_env = pend & st.env_stage
            st, sc_now = env_nee_start(scene, st, pend & ~st.env_stage)
            st = do_scatter(st, done_env | sc_now)
        elif not scatter_inline:
            # with inline scatter no lane can still be pending here — skip
            # the pool-wide HG pass entirely
            st = do_scatter(st, pend)
        st = fold_and_rearm(scene, cam, st)
        if flush:
            st, film = flush_film(st, film)
            st = spawn(scene, cam, st, order)
        return st, film

    use_shadow = settings.sun_light or use_mis

    def setup_pre(scene: Scene, st: PathState) -> dict:
        """Pre-fetch half of segment setup: phase masks, the box slab test
        (kernel.cu:2017-2020), the hyperion schedule, and the bound-row
        fetch position (the segment entry point, kernel.cu:1655-1659)."""
        setup = st.status == NEW_SEGMENT
        p_setup = setup & ~st.shadow
        s_setup = setup & st.shadow if use_shadow else \
            jnp.zeros_like(setup)
        hit, t_near, t_far_box = aabb.intersect_box(
            to_model_point(scene, st.o), to_model_dir(scene, st.d),
            scene.density.box_min, scene.density.box_max)
        sh_dir = st.shadow_dir if use_mis else \
            jnp.broadcast_to(scene.sun_dir, st.d.shape)
        # hyperion schedule first — the scale-selection cost model uses ρ'
        g_cur, density_prime = _hyperion(st.num_scatters, scene.mat.g,
                                         scene.mat.density)
        pos_b = _w(st.shadow,
                   st.o + sh_dir * st.dist[:, None],
                   st.o + st.d * t_near[:, None])
        return dict(setup=setup, p_setup=p_setup, s_setup=s_setup, hit=hit,
                    t_near=t_near, t_far_box=t_far_box, g_cur=g_cur,
                    density_prime=density_prime, pos_b=pos_b)

    def setup_fetch(scene: Scene, ctx: dict):
        """Legacy-structure bound fetch (its own pool-wide gather; the
        unified pass gets the row from ``fused_fetch`` instead)."""
        if not local_bounds:
            return None
        return gridmod.sample_world(scene.bound,
                                    to_model_point(scene, ctx["pos_b"]),
                                    linear=False)

    def setup_post(scene: Scene, st: PathState, ctx: dict,
                   bnd) -> PathState:
        """Path: bounds + decomposition control (kernel.cu:2017-2078),
        with multiscale analytic segments.  Shadow: next transmittance
        segment (control factor applied analytically; residual majorant
        set up for the march)."""
        p_setup, s_setup = ctx["p_setup"], ctx["s_setup"]
        hit, t_near, t_far_box = ctx["hit"], ctx["t_near"], ctx["t_far_box"]
        g_cur, density_prime = ctx["g_cur"], ctx["density_prime"]

        # path miss → escape; the background shade is owed at retire
        # (kernel.cu:2024-2032; see retire)
        miss = p_setup & ~hit
        radiance = st.radiance
        status = jnp.where(miss, DONE, st.status)
        esc = jnp.where(miss, True, st.esc)
        pseg = p_setup & hit

        radii = scene.bound_radii
        max_sigma_t = jnp.max(scene.mat.sigma_t)
        min_sigma_t = jnp.min(scene.mat.sigma_t)
        if local_bounds:
            # Scale selection: take the *largest* scale whose expected
            # residual-event count over one segment,
            #   ev_k = σ̄t·ρ'·(max_k − min_k)·r_k,
            # stays below a small constant.  Any scale is an unbiased
            # choice (each window is a valid majorant/minorant over its
            # radius); small segments stay preferred in heterogeneous
            # regions because committing a long segment to a loose
            # majorant pays its event rate over the whole span, while
            # short segments re-tighten at every boundary.  Vacuum and
            # homogeneous windows (ev = 0) take the largest scale, and
            # smooth interiors (WDAS-class clouds, Δd ~ few/255) get long
            # segments too.
            rho_sel = _w(st.shadow, st.density_prime, density_prime)
            ev_budget = jnp.float32(settings.ev_budget)
            d_max = bnd[..., 0]
            d_min = bnd[..., 1]
            seg_len = jnp.full_like(t_near, radii[0])
            for k in range(1, len(radii)):
                mk = bnd[..., 2 * k]
                nk = bnd[..., 2 * k + 1]
                ok = (max_sigma_t * rho_sel * (mk - nk) * radii[k]
                      <= ev_budget)
                d_max = jnp.where(ok, mk, d_max)
                d_min = jnp.where(ok, nk, d_min)
                seg_len = jnp.where(ok, radii[k], seg_len)
            if not ref_march:
                # distance-to-solid leap: density ≡ 0 for leap_cells coarse
                # cells (Chebyshev) around this one → extend the vacuum
                # segment (the u8 channel dequantizes by 1/255)
                nleap = len(radii) * 2
                leap_cells = bnd[..., nleap] * (
                    255.0 if scene.bound.data.dtype == jnp.uint8 else 1.0)
                edge = jnp.min((scene.bound.box_max - scene.bound.box_min)
                               / jnp.asarray(scene.bound.data.shape[2::-1],
                                             jnp.float32))
                leap = leap_cells * edge
                vac_leap = d_max <= 0.0
                seg_len = jnp.where(vac_leap, jnp.maximum(seg_len, leap),
                                    seg_len)
        else:
            d_max = jnp.ones_like(t_near)
            d_min = jnp.zeros_like(t_near)
            seg_len = jnp.full_like(t_near, 1e30)

        # ================= path segment =================
        if ref_march:
            # the reference clamps at search_radius from the *origin*
            # (kernel.cu:1654) — see config.RenderSettings.reference_march
            t_far = jnp.minimum(t_far_box, seg_len)
        else:
            t_far = jnp.minimum(t_far_box, t_near + seg_len)
        # exact vacuum leap: Tr ≡ 1 across the segment, no draw, no march
        # (replaces the reference's 1e-4-majorant creep, kernel.cu:2044)
        vacuum = pseg & (d_max <= 0.0) if local_bounds and not ref_march \
            else jnp.zeros_like(pseg)
        o = _w(vacuum, st.o + st.d * t_far[:, None], st.o)
        act = pseg & ~vacuum

        d_max_f = jnp.maximum(1e-4, d_max)  # reference floor (kernel.cu:1658)
        sigma_t_prime = max_sigma_t * density_prime * d_max_f

        if use_decomp:
            dm = act & (d_min > 0.0)
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

        st = st.replace(
            o=o,
            radiance=radiance,
            esc=esc,
            status=jnp.where(act, MARCH, status),
            rng=rng2,
            t_max=jnp.where(act, t_far, st.t_max),
            dist=jnp.where(act, t_near, st.dist),
            distc=jnp.where(act, distc, st.distc),
            sigma_t_prime=jnp.where(act, sigma_t_prime, st.sigma_t_prime),
            inv_sigma=jnp.where(act, inv_sigma, st.inv_sigma),
            sigma_c=jnp.where(act, sigma_c, st.sigma_c),
            d_max=jnp.where(act, d_max_f, st.d_max),
            g_cur=jnp.where(act, g_cur, st.g_cur),
            density_prime=jnp.where(act, density_prime, st.density_prime))

        # ================= shadow segment =================
        if use_shadow:
            rho2 = st.density_prime
            seg_end = jnp.minimum(st.distc, st.dist + seg_len)
            dlen = jnp.maximum(seg_end - st.dist, 0.0)
            # exact control factor exp(-σ_t·ρ·d_min·len) per channel
            ctrl = jnp.exp(-scene.mat.sigma_t[None, :]
                           * (rho2 * d_min * dlen)[:, None])
            sh_tr = _w(s_setup, st.sh_tr * ctrl, st.sh_tr)
            homog = d_max == d_min
            s_hom = s_setup & homog
            s_het = s_setup & ~homog
            sigma_r_bar = jnp.maximum(
                max_sigma_t * rho2 * (d_max - d_min), 1e-20)
            complete = s_hom & (seg_end >= st.distc)
            radiance2 = _w(complete, st.radiance + st.nee_coeff * sh_tr,
                           st.radiance)
            st = st.replace(
                radiance=radiance2,
                sh_tr=sh_tr,
                dist=jnp.where(s_hom, seg_end, st.dist),
                t_max=jnp.where(s_het, seg_end, st.t_max),
                d_max=jnp.where(s_het, d_min, st.d_max),
                inv_sigma=jnp.where(s_het, 1.0 / sigma_r_bar, st.inv_sigma),
                status=jnp.where(s_het, MARCH,
                                 jnp.where(complete, SCATTER, st.status)))
        return st

    def segment_setup(scene: Scene, st: PathState) -> PathState:
        """Legacy-structure segment setup: pre + own bound gather + post
        (the unified pass shares one fused gather with the march instead —
        see step_inner)."""
        ctx = setup_pre(scene, st)
        return setup_post(scene, st, ctx, setup_fetch(scene, ctx))

    def nee_prep(scene: Scene, st: PathState, col, pos, od_packed=None):
        """On a real collision: compute the NEE coefficient; either take the
        baked-opacity shortcut and scatter now, or enter segmented shadow
        marching (kernel.cu:2161-2217; Tr_spectral preamble
        kernel.cu:763-780).  ``od_packed`` is the baked optical depth at
        ``pos`` when the march already fetched it from the packed row
        table; ``None`` falls back to a separate opacity-grid gather."""
        # post-increment hyperion (kernel.cu:2168-2178)
        _, rho2 = _hyperion(st.num_scatters, scene.mat.g, scene.mat.density)

        phase_val = phasemod.hg_eval_dir(st.g_cur, st.d,
                                         scene.sun_dir[None, :])
        nee_coeff = (scene.sun_power[None, :] * st.throughput
                     * phase_val[:, None])

        if settings.sun_light and settings.precompute_opacity:
            # The shortcut additionally requires an actual baked cache:
            # without one the stored optical depth is 0 and the estimate
            # would be the full *unshadowed* sun term while the real
            # shadow march is skipped.  (The reference cannot hit this —
            # it re-bakes whenever spp>10, volumeRender.cpp:335-344.)
            # Packed scenes gate on the traced od_scale (0 = no bake);
            # unpacked scenes gate statically on the placeholder shape,
            # which also lets XLA drop the opacity gather entirely.
            if od_packed is not None:
                has_cache = scene.od_scale > 0.0
                od = od_packed
            elif scene.opacity.data.size > 1:
                has_cache = True
                # transformed, unlike the reference's dead-code path
                # (kernel.cu:2184) — see Scene.world_to_model
                od = gridmod.sample_world(scene.opacity,
                                          to_model_point(scene, pos),
                                          linear=op_linear)
            else:
                has_cache = False
                od = jnp.zeros_like(rho2)
            shortcut = col & (st.sample > 10) & (st.num_scatters > 20) \
                & has_cache
            a = jnp.exp(-scene.mat.sigma_t[None, :] * (rho2 * od)[:, None])
            radiance = _w(shortcut, st.radiance + nee_coeff * a, st.radiance)
        else:
            shortcut = jnp.zeros_like(col)
            radiance = st.radiance

        need_shadow = col & ~shortcut
        if settings.sun_light:
            sh_hit, sh_tn, sh_tf = aabb.intersect_box(
                to_model_point(scene, pos),
                jnp.broadcast_to(to_model_dir(scene, scene.sun_dir),
                                 pos.shape),
                scene.density.box_min, scene.density.box_max)
            sh_miss = need_shadow & ~sh_hit   # Tr = 1 (kernel.cu:769-772)
            radiance = _w(sh_miss, radiance + nee_coeff, radiance)
            go_shadow = need_shadow & sh_hit
        else:
            sh_tn = sh_tf = jnp.zeros_like(st.dist)
            sh_miss = need_shadow
            go_shadow = jnp.zeros_like(col)

        scatter_now = col & (shortcut | sh_miss)
        if ref_march:
            # reference Tr_spectral chord: one unsegmented march over
            # [t_near, t_far] of the sun ray with the *collision segment's*
            # majorant σ̄ = maxσt·ρ'(post)·d_max and no control medium
            # (kernel.cu:2231-2249 compute inv_sigma from the NEE-block
            # recompute; Tr_spectral :754-808 tracks the full chord).
            max_sigma_t = jnp.max(scene.mat.sigma_t)
            sh_inv_sigma = 1.0 / (max_sigma_t * rho2 * st.d_max)
            extra = dict(
                t_max=jnp.where(go_shadow, sh_tf, st.t_max),
                inv_sigma=jnp.where(go_shadow, sh_inv_sigma, st.inv_sigma),
                # the shadow-mode d_max register holds the control minorant;
                # the reference shadow march has none
                d_max=jnp.where(go_shadow, 0.0, st.d_max))
            shadow_status = MARCH
        else:
            extra = {}
            shadow_status = NEW_SEGMENT
        st = st.replace(
            radiance=radiance,
            o=_w(col, pos, st.o),
            nee_coeff=_w(go_shadow, nee_coeff, st.nee_coeff),
            sh_tr=_w(go_shadow, jnp.ones_like(st.sh_tr), st.sh_tr),
            shadow_dir=(_w(go_shadow,
                           jnp.broadcast_to(scene.sun_dir, st.d.shape),
                           st.shadow_dir) if use_mis else st.shadow_dir),
            dist=jnp.where(go_shadow, sh_tn, st.dist),
            distc=jnp.where(go_shadow, sh_tf, st.distc),
            # ρ' recomputed post-increment is also what the envmap MIS
            # transmittance uses (kernel.cu:2243-2249)
            density_prime=jnp.where(col, rho2, st.density_prime),
            shadow=jnp.where(go_shadow, True, st.shadow),
            status=jnp.where(go_shadow, shadow_status, st.status),
            **extra)
        return st, scatter_now

    need_od = settings.sun_light and settings.precompute_opacity

    def march_pre(scene: Scene, st: PathState) -> dict:
        """Pre-fetch half of the unified march: the speculative draw pair,
        boundary tests, and the event/collision fetch position
        (kernel.cu:2082-2094)."""
        m = st.status == MARCH
        path = m & ~st.shadow
        shad = m & st.shadow

        # ---- RNG: the free-flight draw and the event draw (path test u2 /
        # shadow kill u3) occupy consecutive stream positions, so both come
        # from one speculative two-step lookahead and the state commits in
        # a single masked update instead of three — state streaming
        # dominates; the extra rng_next is cheap VPU work.  Per-lane draw
        # sequences are bit-identical to sequential masked draws.
        rs1, raw1 = rng_next_f(st.rng)
        rs2, raw2 = rng_next_f(rs1)
        u = rngmod.bits_to_float(raw1)
        u2 = rngmod.bits_to_float(raw2)

        # ---- advance distance (1 draw, both modes)
        dist = st.dist - jnp.log(u) * st.inv_sigma

        # ---- boundary tests
        brk_path = path & ((dist >= st.distc) | (dist >= st.t_max))
        through = brk_path & (jnp.minimum(st.distc, dist) >= st.t_max)
        collide_ctrl = brk_path & ~through
        sh_end = shad & (dist >= st.t_max)
        sh_complete = sh_end & (st.t_max >= st.distc)
        ev_sh = shad & ~sh_end

        sh_dir = st.shadow_dir if use_mis else \
            jnp.broadcast_to(scene.sun_dir, st.d.shape)
        march_dir = _w(st.shadow, sh_dir, st.d)
        pos_event = st.o + march_dir * dist[:, None]
        # collision position: control break at distc, else the event point
        # (kernel.cu:2086-2094)
        pos = _w(collide_ctrl, st.o + st.d * st.distc[:, None], pos_event)
        return dict(m=m, path=path, shad=shad, rs1=rs1, rs2=rs2, u2=u2,
                    dist=dist, brk_path=brk_path, through=through,
                    collide_ctrl=collide_ctrl, sh_end=sh_end,
                    sh_complete=sh_complete, ev_sh=ev_sh,
                    pos_event=pos_event, pos=pos)

    def march_fetch(scene: Scene, ctx: dict):
        """Legacy-structure fetch — one pool-wide gather serves both march
        modes and, when the scene carries the packed [density, od₂₄] row
        table, the NEE opacity shortcut too.  Every lane consumes at most
        one of (density, od): marching lanes need density at the event
        point, control-collision lanes (known from the drawn distance
        alone, before any fetch) need only the baked optical depth at the
        collision point, and a real-scatter lane reads both at the *same*
        point.  So fetching the packed row at the per-lane
        collision/event position replaces the march's two pool-wide
        gathers (density + opacity, kernel.cu:2086 + 2181-2196) with one,
        bit-identically for density and to 24-bit precision for od.
        Returns (grid density value, baked od) — both unscaled by ρ'."""
        use_packed = (scene.packed is not None and not linear
                      and not op_linear)
        if use_packed:
            row = gridmod.fetch_rows_raw(scene.packed,
                                         to_model_point(scene, ctx["pos"]))
            dv = row[..., 0] * jnp.float32(1.0 / 255.0)
            od_packed = unpack_od(row, scene.od_scale) if need_od else None
        else:
            dv = _sample_density(scene, ctx["pos_event"], linear)
            if need_od and scene.packed is not None:
                # filter modes force separate fetches, but the optical
                # depth still lives (only) in the packed table — trilinear
                # filtering commutes with the linear channel recombination
                rows = gridmod.sample_world(scene.packed,
                                            to_model_point(scene, ctx["pos"]),
                                            linear=op_linear)
                od_packed = unpack_od(rows, scene.od_scale,
                                      dequantized=True)
            else:
                od_packed = None
        return dv, od_packed

    def march_post(scene: Scene, st: PathState, ctx: dict, dv,
                   od_packed) -> PathState:
        """Post-fetch half: one null-collision event — path free-flight
        (kernel.cu:2082-2142) or one shadow residual-tracking event,
        selected per lane."""
        m, path, shad = ctx["m"], ctx["path"], ctx["shad"]
        rs1, rs2, u2 = ctx["rs1"], ctx["rs2"], ctx["u2"]
        dist = ctx["dist"]
        brk_path, through = ctx["brk_path"], ctx["through"]
        collide_ctrl = ctx["collide_ctrl"]
        sh_end, ev_sh = ctx["sh_end"], ctx["ev_sh"]
        sh_complete = ctx["sh_complete"]
        den = dv * st.density_prime

        # which lanes consume the second draw: a path event test, plus the
        # shadow kill draw under BINARY (shadow weights are deterministic
        # under RATIO)
        second = path & ~brk_path
        if binary_shadow:
            second = second | ev_sh
        rng2 = _w(m, _w(second, rs2, rs1), st.rng)

        # path event: spectral-tracking weights (kernel.cu:2106-2141)
        sigma_t_den = (scene.mat.sigma_t[None, :] * den[:, None]
                       - st.sigma_c[:, None])
        sigma_s_den = ((scene.mat.sigma_t * scene.mat.albedo)[None, :]
                       * den[:, None] - st.sigma_c[:, None])
        sigma_n_den = st.sigma_t_prime[:, None] - sigma_t_den
        ps = vm.sum_of(jnp.abs(sigma_t_den * st.throughput))
        pn = vm.sum_of(jnp.abs(sigma_n_den * st.throughput))
        c = ps + pn
        e = u2 * c
        real = path & ~brk_path & (e < ps)
        null = path & ~brk_path & ~real
        # 1/σt' is recomputed rather than carried as a register: a state
        # leaf streams through every unrolled step, a reciprocal of the
        # already-read sigma_t_prime is near-free (bit-identical: same op
        # on the same input as the former segment-setup store)
        inv_sigma_t = 1.0 / st.sigma_t_prime
        w_real = sigma_s_den * (inv_sigma_t * c
                                / jnp.maximum(ps, 1e-30))[:, None]
        w_null = sigma_n_den * (inv_sigma_t * c
                                / jnp.maximum(pn, 1e-30))[:, None]
        throughput = st.throughput
        throughput = _w(real, throughput * w_real, throughput)
        throughput = _w(null, throughput * w_null, throughput)

        # shadow event: the residual collision probability per channel is
        # p_ch = σ_r,ch(x)/σ̄_r with σ_r,ch(x) = σ_t[ch]·(ρ(x)·ρ' − ρ'·d_min)
        # (d_min is stored in the d_max register in shadow mode).
        p_kill = ((scene.mat.sigma_t[None, :]
                   * (den - st.density_prime * st.d_max)[:, None])
                  * st.inv_sigma[:, None])
        if binary_shadow:
            # Tr_spectral (kernel.cu:754-808): one shared acceptance draw
            # (u2, the second lookahead word) kills channel ch with
            # probability p_ch — transmittance flags are 0/1 and the march
            # stops at the first event where every channel is dead (the
            # dead-shadow exit below), which makes optically thick chords
            # ~O(1) events like the reference.
            w_sh = (u2[:, None] >= p_kill).astype(jnp.float32)
        else:
            # deterministic expected-value weight w_ch = 1 - p_ch
            w_sh = jnp.maximum(1.0 - p_kill, 0.0)
        sh_tr = _w(ev_sh, st.sh_tr * w_sh, st.sh_tr)

        # dead-shadow termination: once every channel's weight is exactly 0
        # (guaranteed on the max-σt channel whenever an event hits a voxel
        # at the segment's d_max — e.g. any solid voxel of a binary medium)
        # no further event can change the estimate, so stop marching.  This
        # is the analog of binary delta tracking's first-hit exit
        # (kernel.cu:785-788) and is exact, not Russian roulette.
        sh_dead = ev_sh & (vm.max_of(sh_tr) <= 0.0)
        sh_complete = sh_complete | sh_dead
        if ref_march and binary_shadow:
            # the reference's all-channels-dead exit happens at the top of
            # the NEXT loop iteration, after one more free-flight draw
            # (kernel.cu:783-788) — consume it to keep streams aligned
            rng2, _ = _draw(rng2, sh_dead)

        # shadow completion: add the estimate, then scatter
        radiance = _w(sh_complete, st.radiance + st.nee_coeff * sh_tr,
                      st.radiance)

        collided = real | collide_ctrl
        st = st.replace(
            rng=rng2,
            dist=jnp.where(sh_end, st.t_max, jnp.where(m, dist, st.dist)),
            throughput=throughput,
            radiance=radiance,
            sh_tr=sh_tr,
            o=_w(through, st.o + st.d * st.t_max[:, None], st.o),
            status=jnp.where(through | (sh_end & ~sh_complete),
                             NEW_SEGMENT, st.status),
            num_scatters=st.num_scatters + collided.astype(jnp.int32))

        st, scatter_now = nee_prep(scene, st, collided, ctx["pos"],
                                   od_packed)
        return st.replace(status=jnp.where(scatter_now | sh_complete,
                                           SCATTER, st.status))

    def march(scene: Scene, st: PathState) -> PathState:
        """Legacy-structure march: pre + own density gather + post."""
        ctx = march_pre(scene, st)
        dv, od_packed = march_fetch(scene, ctx)
        return march_post(scene, st, ctx, dv, od_packed)

    def make_fused_table(scene: Scene) -> jnp.ndarray:
        """Concatenate packed [density, od₂₄] rows and bound-pyramid rows
        into the (Nd + Nb, 8) uint8 table the unified pass gathers from —
        built in-graph once per launch from the resident planes (~0.2 ms
        of HBM traffic; zero standing memory/pytree cost when
        unified_march is off)."""
        from .scene import can_fuse_tables
        if not can_fuse_tables(scene) or linear or op_linear:
            raise ValueError(
                "unified_march requires a quantized packed scene and "
                "NEAREST density/opacity filtering — use "
                "unified_march=False for this configuration")

        def pad8(rows):
            c = rows.shape[-1]
            return jnp.pad(rows, ((0, 0), (0, 8 - c))) if c < 8 else rows
        return jnp.concatenate(
            [pad8(scene.packed.data.reshape(-1,
                                            scene.packed.data.shape[-1])),
             pad8(scene.bound.data.reshape(-1,
                                           scene.bound.data.shape[-1]))],
            axis=0)

    def fused_fetch(scene: Scene, fused, ctx_m: dict, ctx_s: dict):
        """The unified pass's single pool-wide gather: a marching lane
        fetches its packed [density, od₂₄] row at the event/collision
        position; any other lane fetches the bound-pyramid row at its
        (prospective) segment entry point — the row index selects between
        the two halves of the concatenated table.  The two consumer sets
        are disjoint (a lane is either MARCHing or setting up), so one
        gather replaces the march's density gather AND the setup pass's
        bound gather.  Values are bit-identical to the separate fetches
        (same index math, same dequantization ops)."""
        idx_d = gridmod.flat_index(scene.packed,
                                   to_model_point(scene, ctx_m["pos"]))
        idx_b = gridmod.flat_index(scene.bound,
                                   to_model_point(scene, ctx_s["pos_b"]))
        nz, ny, nx = scene.packed.data.shape[:3]
        idx = jnp.where(ctx_m["m"], idx_d, nz * ny * nx + idx_b)
        rows = jax.lax.optimization_barrier(
            jnp.take(fused, idx, axis=0)).astype(jnp.float32)
        dv = rows[..., 0] * jnp.float32(1.0 / 255.0)
        od_packed = unpack_od(rows, scene.od_scale) if need_od else None
        cb = scene.bound.data.shape[-1]
        bnd = rows[..., :cb] * jnp.float32(1.0 / 255.0)
        return dv, od_packed, bnd

    # bf16 radiometric-state storage (settings.state_bf16): the unrolled
    # steps materialize every state leaf between gathers, so storing the
    # 4×(N,3) radiometric registers half-width halves that stream.  The
    # cast sits at each phase boundary (XLA folds it into the producing
    # fusion); the launch interface stays f32 (init_state, checkpoints,
    # donation all unchanged).
    _rad_fields = ("throughput", "radiance", "sh_tr", "nee_coeff")
    _sdt = jnp.bfloat16 if settings.state_bf16 else jnp.float32

    def _pack(st: PathState) -> PathState:
        if _sdt == jnp.float32:
            return st
        return st.replace(**{f: getattr(st, f).astype(_sdt)
                             for f in _rad_fields})

    def _unpack(st: PathState) -> PathState:
        if _sdt == jnp.float32:
            return st
        return st.replace(**{f: getattr(st, f).astype(jnp.float32)
                             for f in _rad_fields})

    def step(scene: Scene, cam: cammod.Camera, st: PathState,
             film: filmmod.Film, order=None):
        scene = mono_scene(scene)
        st = _pack(st)
        st, film = housekeeping(scene, cam, st, film, order=order)
        st = step_inner(scene, cam, st)
        return _unpack(st), film

    scatter_inline = settings.scatter_inline and not use_mis
    # like scatter_inline, the eager fold/re-arm path is PASSIVE-envmap
    # only: under MIS a completing sample chains the envmap NEE, which
    # stays batched in housekeeping
    eager = settings.eager_rearm and not use_mis

    def unified_pass(scene: Scene, fused, st: PathState) -> PathState:
        """One unified march/setup pass (config.unified_march): marching
        lanes advance one null-collision event while NEW_SEGMENT lanes set
        up their next segment, sharing ONE pool-wide gather (fused_fetch).
        Both halves mask on the pre-pass status, so their lane sets are
        disjoint and the masked updates commute; per-lane draw sequences
        and arithmetic are bit-identical to the legacy structure — only
        the fetch *timing* moves, so drained renders match exactly."""
        ctx_s = setup_pre(scene, st)
        ctx_m = march_pre(scene, st)
        dv, od_packed, bnd = fused_fetch(scene, fused, ctx_m, ctx_s)
        st = _pack(march_post(scene, st, ctx_m, dv, od_packed))
        st = _pack(setup_post(scene, st, ctx_s, bnd))
        if scatter_inline:
            st = _pack(do_scatter(st, st.status == SCATTER))
        return st

    def step_inner(scene: Scene, cam: cammod.Camera, st: PathState,
                   fused=None) -> PathState:
        if settings.unified_march:
            # marches_per_step + 1 passes ≙ the legacy pass count per
            # micro-step, keeping the housekeeping cadences comparable
            if fused is None:  # launch_body hoists one table per launch
                fused = make_fused_table(scene)
            for _ in range(settings.marches_per_step + 1):
                st = unified_pass(scene, fused, st)
        else:
            st = _pack(segment_setup(scene, st))
            for _ in range(settings.marches_per_step):
                st = _pack(march(scene, st))
                if scatter_inline:
                    # immediate HG scatter: the lane re-enters NEW_SEGMENT
                    # next pass instead of idling until housekeeping (same
                    # per-lane draw sequence, just consumed earlier)
                    st = _pack(do_scatter(st, st.status == SCATTER))
        if eager:
            # once per micro-step: completed samples fold/bank and re-arm
            # now (gather-free) instead of idling for the next fold pass
            st = _pack(eager_fold(scene, cam, st))
        return st

    def _phase_counts(st: PathState) -> jnp.ndarray:
        """One (7,) i32 row of lane-phase occupancy (config.instrument):
        [march_path, march_shadow, new_segment, scatter_wait, fold_wait,
        parked, empty].  fold_wait = sample finished, waiting for the
        fold/re-arm pass; parked = item folded, waiting for the film
        flush; empty = waiting for queue spawn."""
        s = lambda m: jnp.sum(m.astype(jnp.int32))
        done = st.status == DONE
        return jnp.stack([
            s((st.status == MARCH) & ~st.shadow),
            s((st.status == MARCH) & st.shadow),
            s(st.status == NEW_SEGMENT),
            s(st.status == SCATTER),
            s(done & (st.pixel >= 0) & (st.num_scatters >= 0)),
            s(done & (st.pixel >= 0) & (st.num_scatters < 0)),
            s(done & (st.pixel < 0))])

    def unrolled_launch_body(scene: Scene, cam: cammod.Camera,
                             st: PathState, film: filmmod.Film, order=None):
        scene = mono_scene(scene)
        st = _pack(st)
        # Python-unrolled (not fori_loop) — see module docstring.
        # Housekeeping (scatter/fold/rearm) runs every spawn_every steps;
        # the film scatter-add + queue spawn only on every flush_every-th
        # housekeeping (and always at the launch boundary, so the host
        # sees an up-to-date film between launches).  A lighter
        # fold/re-arm-only pass optionally runs every rearm_every steps in
        # between (settings.rearm_every < spawn_every), so a finished
        # sample re-arms the lane's next sample sooner at the price of a
        # pool-wide envmap gather per pass — per-lane draw sequences are
        # (pixel, sample)-keyed, so the cadence cannot change any result.
        rearm = min(settings.rearm_every, settings.spawn_every)
        fused = make_fused_table(scene) if settings.unified_march else None
        stats = []
        for i in range(settings.steps_per_launch):
            if i % settings.spawn_every == 0:
                hk = i // settings.spawn_every
                st, film = housekeeping(
                    scene, cam, st, film,
                    flush=(hk % settings.flush_every == 0), order=order)
            elif i % rearm == 0:
                st = _pack(fold_and_rearm(scene, cam, st))
            if settings.instrument:
                stats.append(_phase_counts(st))
            st = step_inner(scene, cam, st, fused)
        st, film = housekeeping(scene, cam, st, film, flush=True,
                                order=order)
        if settings.instrument:
            return _unpack(st), film, jnp.stack(stats)
        return _unpack(st), film

    def scan_launch_body(scene: Scene, cam: cammod.Camera, st: PathState,
                         film: filmmod.Film, order=None):
        """``config.use_scan``: the same launch rolled into ``lax.scan``
        over blocks of ``spawn_every`` micro-steps, so the compiled graph
        is one block long (plus the unrolled sub-block remainder when
        ``steps_per_launch`` is not a multiple) regardless of
        ``steps_per_launch``.  The flush cadence becomes a ``lax.cond``
        on the block counter; the op sequence per micro-step (and with
        ``spawn_every % rearm_every == 0``, the exact unrolled schedule)
        is unchanged, and cadence cannot change results anyway — films
        match the unrolled launch to ~1 ulp (the scanned block is a
        separate compiled artifact, so XLA's fusion/fma rounding can
        differ; tests/test_scan.py).  Measured on v5e at the flagship
        defaults: 667k vs 657k samples/s (≥ the unrolled launch) with
        ~7× faster cold compiles (~90 s vs ~11 min) — see BENCH.md
        "Scan launch A/B"."""
        scene = mono_scene(scene)
        st = _pack(st)
        rearm = min(settings.rearm_every, settings.spawn_every)
        fused = make_fused_table(scene) if settings.unified_march else None
        n_blocks = settings.steps_per_launch // settings.spawn_every
        remainder = settings.steps_per_launch % settings.spawn_every

        def hk_flush(stf):
            return housekeeping(scene, cam, stf[0], stf[1], flush=True,
                                order=order)

        def hk_fold(stf):
            return housekeeping(scene, cam, stf[0], stf[1], flush=False,
                                order=order)

        def block(carry, b):
            st, film = carry
            st, film = jax.lax.cond(b % settings.flush_every == 0,
                                    hk_flush, hk_fold, (st, film))
            for i in range(settings.spawn_every):
                if i > 0 and i % rearm == 0:
                    st = _pack(fold_and_rearm(scene, cam, st))
                st = step_inner(scene, cam, st, fused)
            return (st, film), None

        (st, film), _ = jax.lax.scan(block, (st, film),
                                     jnp.arange(n_blocks, dtype=jnp.int32))
        # Unrolled remainder.  Fold passes key off the block-local index j
        # (j % rearm), like the scanned blocks key off theirs — when rearm
        # divides spawn_every this IS the unrolled launch's global schedule
        # (i = n_blocks*spawn_every + j ⇒ i % rearm == j % rearm);
        # otherwise the fold *timing* differs from the unrolled launch
        # while the rendered result cannot (draws are (pixel, sample)-
        # keyed; pinned by tests/test_scan.py's non-divisible case).
        for j in range(remainder):
            if j == 0:
                st, film = housekeeping(
                    scene, cam, st, film,
                    flush=(n_blocks % settings.flush_every == 0),
                    order=order)
            elif j % rearm == 0:
                st = _pack(fold_and_rearm(scene, cam, st))
            st = step_inner(scene, cam, st, fused)
        st, film = housekeeping(scene, cam, st, film, flush=True,
                                order=order)
        return _unpack(st), film

    # instrument needs per-step stats rows → always the unrolled launch;
    # launches shorter than one block have nothing to scan — delegating to
    # the unrolled body keeps their jaxprs (and compile caches) identical
    # to the pre-scan graphs.
    if settings.use_scan and not settings.instrument \
            and settings.steps_per_launch >= settings.spawn_every:
        launch_body = scan_launch_body
    else:
        launch_body = unrolled_launch_body

    launch = functools.partial(jax.jit, donate_argnums=(2, 3))(launch_body)
    if with_body:
        return step, launch, launch_body
    return step, launch


@functools.partial(jax.jit, static_argnums=(1,))
def compact_state(st: PathState, new_pool: int) -> PathState:
    """Repack live lanes into a smaller pool (drain phase only).

    Lane identity carries no meaning — RNG streams live in the lane
    registers — so repacking is exact: a stable partition (argsort of the
    1-bit deadness key) moves live lanes to the front in their original
    order, and slots past the live count are fresh ``init_state`` lanes
    (DONE, inert).  Runs entirely on device: the original host-side repack
    round-tripped every state leaf (~180 B/lane) through the axon tunnel —
    measured 26 s for one 2^20→2^19 rung on zero-filled state and several
    hundred seconds across a full drain ladder on real (incompressible)
    state, which dominated finite-render drain time (BENCH.md).
    """
    # A lane is reclaimable only once fully retired: DONE *and* flushed
    # (pixel < 0).  Between launches the two were equivalent before eager
    # re-arm; with config.eager_rearm a DONE lane can still own a
    # complete-but-unfolded sample or an unflushed accumulator row —
    # compacting it away would lose that sample's film contribution.
    dead = (st.status == DONE) & (st.pixel < 0)
    idx = jnp.argsort(dead, stable=True)[:new_pool]
    keep = jnp.arange(new_pool) < jnp.sum(~dead)
    fresh = init_state(new_pool)
    pool = dead.shape[0]

    def pick(new, old):
        if old.shape and old.shape[0] == pool:
            return _w(keep, old[idx], new)
        return old  # queue cursors keep their (1,) shape
    return jax.tree.map(pick, fresh, st)


def drain_ladder(pool: int, tail_pool: int, factor: int = 2) -> list:
    """Geometric pool sizes for straggler compaction (largest first).

    2× rungs keep the draining pool within 2× of the live-lane count, so
    the tail of a finite render pays at most ~2× the optimal launch cost
    (8× rungs measured ~25% of wall clock on time-to-1000-spp renders).
    Each size is its own compiled graph, persistently cached — see
    ``prewarm_drain`` for taking the one-time compiles off the clock.
    """
    ladder = []
    p = pool // factor
    while p > tail_pool:
        ladder.append(p)
        p //= factor
    if tail_pool < pool:
        ladder.append(tail_pool)
    return ladder


def prewarm_drain(scene: Scene, cam: cammod.Camera,
                  settings: RenderSettings, width: int, height: int,
                  pool: int, tail_pool: int = 1 << 14,
                  pixel_order: bool = False) -> None:
    """Compile every drain-ladder graph (one launch per pool size on an
    empty queue) so a timed render never hits a cold compile mid-drain.
    ``pixel_order=True`` additionally warms the permuted-queue variant (a
    traced (npix,) argument — its own HLO) at the main pool size only:
    ``render`` drops the order once the queue empties, so drain launches
    always run the no-order graphs warmed below."""
    _, launch = make_step_fn(settings, width, height)
    film = filmmod.make_film(width, height)
    rungs = [pool] + drain_ladder(pool, tail_pool)
    # Warm the EXACT in-render drain sequence — launch, live-check,
    # compact, launch on the compacted state — not just per-rung launches
    # on fresh init_state: on the remote TPU backend a launch whose state
    # inputs come from compact_state misses the executable cache that a
    # fresh-state warmup populated (measured 70-205 s recompile per rung
    # mid-drain, ~790 s of a 855 s drain phase).
    st = init_state(rungs[0])
    st, film = launch(scene, cam, st, film, None)
    for p in rungs[1:]:
        # live-check — the exact reduction render() runs between launches
        int(jnp.sum(((st.status != DONE)
                     | (st.pixel >= 0)).astype(jnp.int32)))
        st = compact_state(st, p)
        st, film = launch(scene, cam, st, film, None)
    int(jnp.sum(((st.status != DONE) | (st.pixel >= 0)).astype(jnp.int32)))
    if pixel_order:
        order = jnp.arange(width * height, dtype=jnp.int32)
        st = init_state(pool)
        st, film = launch(scene, cam, st, film, order)
    float(jnp.sum(film.count[:-1]))  # force (lazy tunnel backends)


def heat_order(film: filmmod.Film, tile: int | None = None):
    """Work-queue pixel permutation from measured heat, hardest first.

    LPT-style makespan scheduling for the straggler drain: high-heat
    pixels (deep-scatter paths — the reference's 800-bounce tails,
    kernel.cu:34) enter the pool at the *front* of every sample block, so
    the items still in flight when the queue empties are the easy ones.
    Per-sample draw sequences are (pixel, sample)-keyed, so the rendered
    result is unchanged (tests/test_integrator.py).  Pixels with no
    flushed samples yet sort hardest of all — on a mid-render film they
    are precisely the still-marching stragglers.  Returns (npix,) i32,
    computed on device (pulling the film through the axon tunnel costs
    tens of seconds; the permutation itself is 2 MB).
    See ``render(heat_ordered=True)`` for the drain-free two-phase use.

    ``tile`` permutes whole tile×tile pixel blocks (keyed by the tile's
    hardest pixel) and keeps raster order *within* each tile: lanes
    spawned from one sample block then still sample neighboring voxels,
    preserving the spawn-order gather locality the wavefront's fetch
    throughput depends on (BENCH.md round-4 coherence probe: a locally
    coherent index stream gathers ~17× faster than a random one; the
    per-pixel permutation was measured to slow the whole queue phase).
    """
    h = film.data[:-1, 3]
    c = film.data[:-1, 4]
    key = jnp.where(c > 0, h / jnp.maximum(c, 1.0), jnp.inf)
    if tile is None:
        return jnp.argsort(-key, stable=True).astype(jnp.int32)
    w, ht = film.width, film.height
    ntx = -(-w // tile)
    p = jnp.arange(w * ht, dtype=jnp.int32)
    tid = (p // w // tile) * ntx + (p % w) // tile
    tkey = jnp.full((ntx * (-(-ht // tile)),), -jnp.inf).at[tid].max(key)
    ids = jnp.argsort(-tkey, stable=True)          # tiles, hardest first
    trank = jnp.zeros_like(ids).at[ids].set(jnp.arange(ids.shape[0]))
    # stable sort by tile rank alone: ties (pixels of one tile) keep
    # their raster order
    return jnp.argsort(trank[tid], stable=True).astype(jnp.int32)


def render(scene: Scene, cam: cammod.Camera, settings: RenderSettings,
           width: int, height: int, spp: int,
           pool: int | None = None,
           film: filmmod.Film | None = None,
           progress_cb=None,
           tail_pool: int = 1 << 14,
           sample_offset: int = 0,
           stats: dict | None = None,
           pixel_order=None,
           heat_ordered: bool = False,
           heat_tile: int | None = None,
           tail_taper: bool = True) -> filmmod.Film:
    """Render ``spp`` samples per pixel progressively; returns the film.

    Equivalent of the display loop driving render_kernel once per sample
    (volumeRender.cpp:613-641), with asynchronous sample retirement.  Once
    the work queue drains, surviving stragglers (max-depth paths are up to
    800 scatters, kernel.cu:34) are compacted into a small pool so the tail
    doesn't pay full-pool launches.  ``progress_cb(film)`` is invoked after
    every launch.

    ``sample_offset`` renders the absolute sample range
    [offset, offset + spp) of every pixel: RNG streams are keyed by
    (pixel, absolute sample), so independent hosts rendering disjoint
    ranges produce exactly the sample set one render would —
    ``film.merge`` combines them (zero-communication multi-host
    scale-out).  Must be a multiple of ``samples_per_item`` (work items
    are K-sample-aligned blocks).

    ``pixel_order`` (optional (npix,) permutation, see ``heat_order``)
    remaps the pixel slot of every sample block in the work queue —
    hardest-first issue order shrinks the straggler drain without
    changing the result.

    ``heat_ordered=True`` derives that permutation in-render: phase 1
    issues one work item per pixel in identity order; when its queue
    empties, the film's measured heat permutes all remaining sample
    blocks hardest-first and the new queue is installed *under* the
    still-marching phase-1 stragglers — no intermediate drain, no lost
    work.  The straggler drain then only ever holds the easiest pixels.
    Identical film to a plain render (RNG is (pixel, sample)-keyed).
    ``heat_tile`` orders at tile granularity (see ``heat_order``) to
    keep the spawn-order gather locality of the raster queue; it only
    modifies the heat permutation, so it requires ``heat_ordered=True``
    (passing it alone raises rather than silently rendering un-ordered).

    ``tail_taper=True`` (default) renders the last ~max(k, k·pool/npix)
    samples of every pixel as 1-sample work items: when the
    multi-sample-item queue empties, every lane holds an in-flight item
    whose remaining work is ~uniform in [0, k·steps-per-sample) — the
    drain tail is one full item generation long regardless of pixel
    ordering (measured: heat-ordered issue does NOT shrink it).  Issuing
    the final samples as k=1 items cuts that tail ~k× — PROVIDED the
    1-item queue phase outlasts the in-flight K-items: retiring lanes
    consume it at ~pool items per item-duration, so a tail shorter than
    ~k·pool/npix samples empties while K-item stragglers still march,
    and the drain pays them anyway (measured on v5e time-to-200-spp:
    drain 41 s at K8 with a k-sample tail vs 6.7 s at K1 — BENCH.md
    round 4).  Item size is a traced register (``k_queue``), so the
    taper reuses the launch graph — zero extra compiles — and sample
    values are untouched (the same (pixel, sample) set is rendered; RNG
    streams are (pixel, absolute-sample)-keyed).

    ``stats`` (optional dict) is filled with drain diagnostics:
    ``queue_empty_s`` (wall seconds until the work queue emptied),
    ``drain_s`` (wall seconds from queue-empty to the last straggler),
    ``launches`` and ``drain_launches`` (counts), ``drain_pool_steps``
    (Σ pool·steps over drain launches, the tail's lane-step budget).
    """
    npix = width * height
    if settings.instrument:
        raise ValueError("config.instrument is for the occupancy analysis "
                         "tool (launch returns a third output); disable it "
                         "for render()")
    if heat_tile is not None and not heat_ordered:
        raise ValueError("heat_tile shapes the heat permutation and does "
                         "nothing on its own — pass heat_ordered=True")
    if pool is None:
        pool = min(npix, 1 << 19)
    _, launch = make_step_fn(settings, width, height)
    k = settings.samples_per_item
    st = init_state(pool, k)
    if sample_offset % k:
        raise ValueError(f"sample_offset {sample_offset} must be a "
                         f"multiple of samples_per_item {k}")
    base = npix * (sample_offset // k)
    # items = ceil((offset+spp) / k) per pixel, starting at the offset block
    total = npix * (-(-(sample_offset + spp) // k))
    if total > 2**31 - 1:
        raise ValueError(f"work queue {total} items overflows int32; "
                         "render in chunks of fewer spp")
    # tail taper: samples [offset, offset+m) as k-items, the remaining
    # [offset+m, offset+spp) as 1-items (1-item indices count absolute
    # samples, so they must fit int32 too — silently keep full-k items
    # otherwise, exactly the pre-taper behavior)
    taper = (tail_taper and k > 1 and spp > k
             and npix * (sample_offset + spp) <= 2**31 - 1)
    if taper:
        # Size the 1-item tail to OUTLAST the in-flight K-items (see the
        # docstring): at least one item generation (k·pool/npix samples,
        # rounded up), never less than k.  The floor-to-multiple-of-k
        # below adds up to k more.  m = 0 (an all-1-item render) is valid
        # for small spp; under heat_ordered phase 1 issues one full
        # K-item per pixel, so the K-item range must keep those samples.
        t_target = max(k, -(-(k * pool) // npix))
        m = max(((spp - t_target) // k) * k, 0)
        if heat_ordered:
            m = max(m, k)
    else:
        m = spp
    total_main = npix * (-(-(sample_offset + m) // k))
    # queue phases applied in order whenever the current queue empties
    # (installed *under* the still-marching pool — no intermediate drain):
    # [heat-ordered main], [1-sample tail]; the plain render has none.
    phases = []
    if taper:
        phases.append(dict(next=npix * (sample_offset + m),
                           total=npix * (sample_offset + spp), k=1))
    st = st.replace(next_item=jnp.full((1,), base, jnp.int32),
                    total_items=jnp.full((1,), total_main, jnp.int32),
                    spp_limit=jnp.full((1,), sample_offset + spp,
                                       jnp.int32))
    if film is None:
        film = filmmod.make_film(width, height)
    order = None if pixel_order is None else \
        jnp.asarray(pixel_order, jnp.int32)
    if heat_ordered and spp > k:
        if pixel_order is not None:
            raise ValueError("pass pixel_order or heat_ordered, not both")
        # identity order for phase 1: same traced signature (and compiled
        # graph) as the permuted phase 2
        order = jnp.arange(npix, dtype=jnp.int32)
        phases.insert(0, dict(total=total_main, heat=True))
        st = st.replace(total_items=jnp.full((1,), base + npix, jnp.int32))
    if taper and m == 0:
        # The whole render is 1-sample items (small spp relative to
        # k·pool/npix): install the tail phase directly instead of letting
        # the first launch run on an empty K-item queue and spawn nothing.
        # m == 0 implies not heat_ordered (it floors m at k), so the tail
        # phase is necessarily phases[0].
        ph = phases.pop(0)
        st = st.replace(next_item=jnp.full((1,), ph["next"], jnp.int32),
                        total_items=jnp.full((1,), ph["total"], jnp.int32),
                        k_queue=jnp.full((1,), ph["k"], jnp.int32))

    # Drain ladder: once the queue empties, live lanes collapse quickly but
    # a launch still costs the full pool — repack stragglers into
    # geometrically smaller pools (each size is its own compiled graph,
    # cached across renders) instead of one late jump to tail_pool.
    ladder = drain_ladder(pool, tail_pool)

    import time as _time
    t0 = _time.time()
    queue_empty_t = None
    n_launches = n_drain = 0
    drain_pool_steps = 0
    drain_log = [] if stats is not None else None
    while True:
        t_dispatch = _time.time()
        st, film = launch(scene, cam, st, film, order)
        n_launches += 1
        if queue_empty_t is not None:
            n_drain += 1
            drain_pool_steps += pool * settings.steps_per_launch
        if progress_cb is not None:
            progress_cb(film)
        # this host pull blocks until the launch has executed
        queue_live = int(st.next_item[0]) < int(st.total_items[0])
        t_done = _time.time()
        if drain_log is not None and queue_empty_t is not None:
            drain_log.append([pool, round(t_done - t_dispatch, 2)])
        if queue_live:
            continue
        if phases:
            ph = phases.pop(0)
            if ph.get("heat"):
                # phase-1 queue empty: permute the remaining sample blocks
                # hardest-first (unflushed pixels — the in-flight
                # stragglers — sort first) and install the full queue
                # under the pool
                order = jnp.asarray(heat_order(film, tile=heat_tile))
                if stats is not None:
                    stats["phase1_s"] = round(_time.time() - t0, 1)
            repl = dict(total_items=jnp.full((1,), ph["total"], jnp.int32))
            if "next" in ph:
                repl["next_item"] = jnp.full((1,), ph["next"], jnp.int32)
            if "k" in ph:
                repl["k_queue"] = jnp.full((1,), ph["k"], jnp.int32)
            st = st.replace(**repl)
            continue
        if queue_empty_t is None:
            queue_empty_t = _time.time()
            # drain launches spawn nothing, so the queue permutation is
            # inert — drop it and reuse the cached no-order full-pool and
            # ladder graphs instead of compiling permuted drain variants
            order = None
        # a DONE lane still counts as live until fully retired (flushed,
        # pixel < 0): under eager re-arm it may own a complete-but-
        # unfolded sample or an unflushed accumulator row — matching
        # compact_state's reclaimable-lane definition
        live = int(jnp.sum(((st.status != DONE)
                            | (st.pixel >= 0)).astype(jnp.int32)))
        t_live = _time.time()
        if drain_log is not None and drain_log:
            drain_log[-1] += [live, round(t_live - t_done, 2)]
        if live == 0:
            break
        for p in ladder:
            # live lanes only decrease once the queue is empty, so an
            # exact fit is safe (compact_state must never drop live lanes).
            # At most ONE rung per launch: prewarm_drain warms exactly the
            # launch→compact→launch sequence, and a second consecutive
            # compaction (compact output feeding compact input) is a
            # different executable-cache entry on the remote TPU backend —
            # an occasional launch at ≤2× the ideal pool is far cheaper
            # than a mid-drain recompile.
            if pool > p and live <= p:
                st = compact_state(st, p)
                pool = p
                if drain_log:  # no row yet on the queue-emptying launch
                    drain_log[-1].append(
                        round(_time.time() - t_live, 2))
                break
    if stats is not None:
        end = _time.time()
        stats.update(
            queue_empty_s=round((queue_empty_t or end) - t0, 1),
            drain_s=round(end - (queue_empty_t or end), 1),
            launches=n_launches, drain_launches=n_drain,
            drain_pool_steps=drain_pool_steps,
            # per-drain-launch [pool, launch_s, live, check_s, compact_s*]
            drain_log=drain_log)
    return film
