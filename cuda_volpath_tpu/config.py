"""Render configuration.

TPU-native re-design of the reference's parameter plumbing:

* ``Param`` mirrors the per-launch kernel parameter block
  (reference: src/param.h:4-12 — width/height/density/brightness/albedo/g/sigma_t).
* ``RenderSettings`` lifts the reference's compile-time ``#define`` switches
  (reference: src/volumeRender_kernel.cu:14-34 — SUN_LIGHT, PASSIVE_ENVMAP,
  MULTI_CHANNEL/SPECTRAL_TRACKING, PRECOMPUTE_OPACITY, max_depth) plus the
  kernel-variant selection (src/volumeRender_kernel.cu:2364-2370) into runtime
  enums, so one compiled renderer supports every reference configuration.

Everything here is a plain (frozen) dataclass: instances are hashable and are
closed over by ``jax.jit`` as static configuration, never traced.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple

Vec3 = Tuple[float, float, float]


class Tracker(enum.Enum):
    """Which free-flight estimator drives the integrator.

    Mirrors the three megakernels kept side-by-side in the reference
    (src/volumeRender_kernel.cu:2364-2370):

    * DELTA — global-majorant delta/spectral tracking (``__d_render``, :1285).
    * BOUNDED — tracking restart every ``search_radius`` with a local max
      density majorant (``__d_render_bounded``, :1667).
    * DECOMP — BOUNDED plus analog decomposition tracking using the local min
      density as a control medium (``__d_render_bounded_decomp``, :1958).
      This is the variant the reference actually benchmarks.
    """

    DELTA = "delta"
    BOUNDED = "bounded"
    DECOMP = "decomp"


class SpectralMode(enum.Enum):
    """Chromatic rendering strategy (src/volumeRender_kernel.cu:23-27).

    * SPECTRAL — spectral (joint RGB) tracking with history-aware weights;
      the reference default (SPECTRAL_TRACKING=1).
    * MULTI_CHANNEL — one wavelength per sample, chosen uniformly; writes a
      single channel scaled by 3 (MULTI_CHANNEL=1 path, kernel.cu:1319-1321).
    * MONO — fast achromatic mode (both switches off): scalar sigma_t,
      throughput *= albedo after each real collision (kernel.cu:1436-1455).
    """

    SPECTRAL = "spectral"
    MULTI_CHANNEL = "multi_channel"
    MONO = "mono"


class EnvmapMode(enum.Enum):
    """Environment lighting strategy (src/volumeRender_kernel.cu:21).

    * PASSIVE — envmap contributes only when a path escapes the volume
      (PASSIVE_ENVMAP=1, the reference default).
    * MIS — one-sample MIS between phase function and the envmap luminance
      CDF at every scatter (the compiled-out branch, kernel.cu:1494-1569).
    """

    PASSIVE = "passive"
    MIS = "mis"


class ShadowMode(enum.Enum):
    """Shadow-ray transmittance estimator.

    * BINARY — the reference's ``Tr_spectral`` (src/volumeRender_kernel.cu:
      754-808): spectral delta tracking with sample reuse; each event kills
      channel ch with probability σ_r,ch(x)/σ̄_r, so transmittance per
      channel is 0/1 and the march terminates as soon as every channel is
      dead.  Cheapest in optically thick media (terminates after ~1 real
      collision), higher variance per sample.
    * RATIO — segmented residual ratio tracking: the expected-value
      refinement (deterministic weight 1-σ_r,ch(x)/σ̄_r per event; exact
      analytic factor over each segment's control medium).  Same mean,
      lower variance; marches the whole chord in smooth media.
    """

    BINARY = "binary"
    RATIO = "ratio"


class FilterMode(enum.Enum):
    """Density texture filtering (reference toggles at runtime with 'f';
    src/volumeRender_kernel.cu:422-439)."""

    NEAREST = "nearest"
    LINEAR = "linear"


@dataclasses.dataclass(frozen=True)
class Param:
    """Per-launch render parameters (reference src/param.h:4-12).

    ``sigma_t`` is the normalized spectral extinction (max channel == 1,
    see ``Mat`` in src/volumeRender.cpp:44-57); ``density`` scales it to the
    physical extinction coefficient. ``albedo`` is the single-scattering
    albedo per channel, ``g`` the Henyey-Greenstein anisotropy.
    """

    width: int = 960
    height: int = 512
    density: float = 800.0
    brightness: float = 1.0
    albedo: Vec3 = (1.0, 1.0, 1.0)
    g: float = 0.877
    sigma_t: Vec3 = (1.0, 1.0, 1.0)

    def replace(self, **kw) -> "Param":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Runtime equivalents of the reference's compile-time configuration
    (src/volumeRender_kernel.cu:14-34 and TextureVolume::search_radius :151).
    """

    tracker: Tracker = Tracker.DECOMP
    spectral: SpectralMode = SpectralMode.SPECTRAL
    envmap_mode: EnvmapMode = EnvmapMode.PASSIVE
    # BINARY is the default for reference parity (Tr_spectral is what the
    # reference benchmarks) and for speed: thick chords terminate after ~one
    # real collision (measured 4.5× on the dense-cloud scene).  RATIO is the
    # lower-variance-per-sample refinement.
    shadow_mode: ShadowMode = ShadowMode.BINARY
    sun_light: bool = True
    precompute_opacity: bool = True
    max_depth: int = 800
    search_radius: float = 0.05
    # Density filtering defaults to point sampling like the reference
    # (``linear_interp = false``, src/volumeRender_kernel.cu:351; 'f'
    # toggles it at runtime).  On TPU a trilinear fetch is 8 gathers
    # instead of 1, so the default also matters for speed.
    filter_mode: FilterMode = FilterMode.NEAREST
    # The reference's opacity cache texture is always trilinear
    # (create_cuda_texture<float>(..., true, true), kernel.cu:541-542).
    # NEAREST is the TPU-native default: the cache is only used for the
    # deep-scatter NEE shortcut where the ~half-voxel error is invisible,
    # and it cuts 8 gathers to 1 per micro-step.
    opacity_filter: FilterMode = FilterMode.NEAREST
    # Gamma used by the display/tonemap path (src/volumeRender.cpp:481).
    gamma: float = 2.2
    # Wavefront execution knobs (TPU-specific; no reference equivalent).
    # Number of state-machine micro-steps unrolled into one jitted call
    # (unrolled, not lax.fori_loop — see integrator.make_step_fn).
    steps_per_launch: int = 64
    # Retire/spawn cadence in micro-steps: the work-queue cumsum + film
    # scatter are whole-pool ops, amortized over several march steps.
    # Swept on v5e: 8 was optimal when scatters waited for housekeeping;
    # with scatter_inline the balance moved to 12 (4→337k, 8→484k,
    # 12→493k, 16→488k samples/s on the flagship scene); re-swept after
    # the round-2 register slimming + RNG lookahead (12 vs 16 within
    # noise at one-sample items) and again with multi-sample items,
    # where 12 clearly beats 16 (755k vs 712k at K16_R8).
    spawn_every: int = 12
    # March sub-steps per segment-setup pass: null-collision chains run
    # several events per fetch of the bound pyramid, amortizing setup,
    # housekeeping and intersect costs (lanes whose segment ends idle the
    # remaining sub-steps).  Under ``unified_march`` the same knob sets the
    # unified passes per micro-step (marches_per_step + 1, matching the
    # legacy pass count) so the housekeeping cadences stay comparable.
    marches_per_step: int = 2
    # Unified march/setup passes: instead of one segment-setup pass (with
    # its own pool-wide bound-pyramid gather) followed by marches_per_step
    # march passes (one density gather each), every pass serves BOTH
    # phases with ONE gather from the scene's fused row table
    # (built in-graph once per launch): a marching lane fetches its packed [density, od₂₄]
    # row, a lane setting up a segment fetches its bound row — the two
    # lane sets are disjoint by construction, and gathers are the dominant
    # per-step cost on TPU (BENCH.md: 3 → 2 pool-wide gathers per
    # micro-step at marches_per_step=2).  A lane also never idles a march
    # sub-step waiting for the next setup pass.  Per-lane draw sequences
    # and arithmetic are bit-identical to the legacy structure (only fetch
    # *timing* moves), so drained renders match exactly
    # (tests/test_unified.py).  Requires a quantized packed scene
    # and NEAREST filtering (see integrator.make_fused_table).
    unified_march: bool = False
    # Scale-selection event budget: a segment takes the largest bound-pyramid
    # scale whose expected residual-event count σ̄t·ρ'·(max_k-min_k)·r_k stays
    # under this (integrator.segment_setup).  Larger = longer segments with
    # looser majorants (fewer setups, more null events).
    ev_budget: float = 1.0
    # Process pending scatters inline after every march sub-step instead of
    # only at housekeeping cadence: a lane that decides to scatter would
    # otherwise idle up to spawn_every steps.  Costs a masked HG-sampling
    # pass per sub-step and wins big (+29% measured on the flagship scene —
    # scatter-wait idle dominates the masked transcendentals).
    # (PASSIVE envmap only — under MIS the scatter stage chains the envmap
    # NEE, which stays batched.)
    scatter_inline: bool = True
    # Work-item granularity: each queue item is ``samples_per_item``
    # consecutive samples of one pixel.  A lane folds each finished sample
    # into per-lane accumulator registers (rgb, rgb², heat, count) and
    # re-arms the next sample of the same pixel inline — the film
    # scatter-add (a ~92 ns/row whole-pool op on v5e, measured; by far the
    # priciest single op in the launch) then runs once per item instead of
    # once per sample.  1 = reference-like one-sample items.  Swept on the
    # finite-render ground truth (time-to-N-spp, BENCH.md round 5): the
    # queue-phase rate rises with K (fold/flush amortization; K1 is −29%)
    # while the drain tail grows ~linearly with K even with the 1-sample
    # taper, so the optimum depends on render length — K8 wins the
    # 1000-spp headline (756.7 s vs K4's 770.1 s), K4 wins short renders
    # (spp ≲ 300: 168.8 s vs K8's 172.9 s at spp 200).  Item size is a
    # traced register, so changing it never recompiles.
    samples_per_item: int = 8
    # Film-flush + work-queue-spawn cadence, in housekeeping periods: the
    # flush pass (film scatter + spawn cumsum) runs every
    # ``flush_every``-th housekeeping; the fold/re-arm pass runs at every
    # one.  With multi-sample items lanes rarely need the queue, so the
    # whole-pool scatter amortizes over flush_every*spawn_every
    # micro-steps.  (The launch's final housekeeping always flushes.)
    # Swept with samples_per_item: 8 (R4 596k / R8 602k at K8 — the
    # flush savings beat the slightly longer item-boundary parking).
    flush_every: int = 8
    # Cadence (in micro-steps) of the light fold/re-arm pass between
    # housekeepings: a lane whose sample completes otherwise idles until
    # the next spawn_every boundary (mean spawn_every/2 steps).  The pass
    # costs one pool-wide envmap gather (deferred escape shading) plus
    # cheap masked VPU work; values < spawn_every trade that gather for
    # lower re-arm latency.  Draw sequences are (pixel, sample)-keyed, so
    # the cadence cannot change the rendered result.  Swept on-chip at
    # K8_R8 defaults (two independent long-window runs): 4 → 646k/655k,
    # 6 → 644k/651k, 2 → 621k, 12 (== spawn_every, no extra passes) →
    # 605k/612k samples/s — the occupancy decomposition's 9.6% fold_wait
    # was the predicted lever and 4 collects most of it.
    rearm_every: int = 4
    # Eager fold/re-arm: a lane whose sample completes re-arms the item's
    # next sample *inside the micro-step* (once per step, after the last
    # march pass) instead of idling until the next fold/re-arm pass —
    # killing the measured 8.1 fold-wait steps/sample (BENCH.md occupancy
    # table) without paying that pass's pool-wide envmap gather every
    # step: an escaped sample's background shade is *banked* into pending
    # registers (direction, throughput, radiance-so-far, scatter count)
    # and resolved by the next batched fold pass's single envmap gather.
    # One pending slot per lane; a lane whose slot is occupied simply
    # waits for the next fold pass (pre-eager behavior), which also keeps
    # each lane's film-row accumulation in exact sample order, so films
    # stay bit-identical across pool sizes and cadences.  Zero extra
    # gathers; ~10 masked VPU ops + 10 extra state words per lane-step.
    # PASSIVE envmap only (under MIS the scatter/NEE chain stays batched,
    # like scatter_inline).
    # Measured NEUTRAL on v5e (BENCH.md round 4): at the swept fine
    # cadence (rearm_every=4) the fold-wait it removes is already
    # collected and the per-step masked re-arm costs what it saves (667k
    # off vs 654k on, flagship; 947k vs 925k cloud); with the fold passes
    # removed (rearm_every=12) it exactly breaks even (667k).  It DOES
    # buy +8% when housekeeping must be coarse (spawn_every=24: 629k vs
    # 583k) — kept as a tested opt-in for such regimes, default off.
    eager_rearm: bool = False
    # Store the radiometric lane registers (throughput, radiance, sh_tr,
    # nee_coeff — 4×(N,3)) as bfloat16 between micro-steps: the unrolled
    # steps materialize every state leaf to HBM (gathers break fusion), so
    # halving those 48 bytes/lane trims the dominant stream.  Math stays
    # f32; only the store rounds (~0.4% relative per actual event update).
    # Geometry (o, d, dist, …) and RNG state stay full width.
    state_bf16: bool = False
    # Collect per-micro-step lane-phase occupancy counters inside the
    # launch (returned as a third output: (steps, 7) i32 rows of
    # [march_path, march_shadow, new_segment, scatter_wait, fold_wait,
    # parked, empty] counts).  Costs a few masked pool-wide reductions per
    # step — for the occupancy analysis tool (tools/analyze_occupancy.py),
    # not production renders; integrator.render() rejects it.
    instrument: bool = False
    # Roll the launch into ``lax.scan`` over blocks of ``spawn_every``
    # micro-steps (the housekeeping period) instead of Python-unrolling
    # ``steps_per_launch`` micro-steps into one flat graph; a non-multiple
    # remainder is unrolled after the scan with the identical cadence.
    # Identical draw sequences and op order (the flush cadence becomes a
    # ``lax.cond`` on the block counter; films match to ~1 ulp of
    # compiled-fusion rounding, tests/test_scan.py); the graph is one
    # block long, which tames XLA's superlinear compile cost — the
    # unrolled 128-step graph takes ~11 min to compile on the remote TPU
    # and the shard_map'd variant exhausts XLA-CPU entirely (>54 GB RSS,
    # BENCH.md), while the scanned block compiles in ~90 s, making the
    # *production-shaped* multi-chip graph compilable on a virtual mesh
    # (__graft_entry__.dryrun_multichip).  Measured on v5e at the
    # flagship defaults: 667k vs 657k samples/s — at least neutral, so
    # the DEFAULT since round 3 (BENCH.md "Scan launch A/B").  Launches
    # shorter than one block, and instrumented launches, automatically
    # use the unrolled body (identical graphs to use_scan=False).
    use_scan: bool = True
    # Production RNG (ops.rng.cheap_next): a keyed-SplitMix32 counter
    # generator instead of the reference-parity hash+xoroshiro stream —
    # ~⅓ the per-draw arithmetic and no serial dependency between the
    # march's two lookahead draws (the parity generator measures ~23% of
    # step cost, BENCH.md "Where the time goes").  Streams remain
    # (pixel, sample)-keyed: determinism, pool/sharding invariance and
    # checkpoint resume are unaffected; only the draw VALUES differ, so
    # per-sample results are not draw-for-draw the reference's (identical
    # expectation — tests/test_statistical.py covers both generators).
    # Default off: parity is the validated configuration and the bench
    # default.  Incompatible with reference_march (which is the parity
    # validation mode by definition).
    cheap_rng: bool = False
    # Reference march semantics: draw-for-draw parity with the reference's
    # active kernel (__d_render_bounded_decomp + Tr_spectral,
    # src/volumeRender_kernel.cu:1958-2318, 754-808).  Requires a scene
    # built with ``reference_bounds=True`` (full-resolution (max,min) bound
    # grid).  Differences from the production TPU path that this restores:
    # * segment end is min(box_tfar, search_radius) measured from the
    #   current ray *origin* (kernel.cu:1654) — including the reference's
    #   quirk of creeping from the camera to the box one search_radius (and
    #   one free-flight draw) at a time when the origin is outside;
    # * no vacuum/leap segments — empty space marches against the 1e-4
    #   majorant floor (kernel.cu:1658, 2044);
    # * the sun shadow march is one unsegmented chord using the collision
    #   segment's majorant (kernel.cu:2231-2249), no analytic control
    #   factors;
    # * Tr_spectral's all-channels-dead exit consumes one extra free-flight
    #   draw (the loop-top draw of the breaking iteration, kernel.cu:783-788).
    # With identical (pixel,sample) RNG streams the per-sample radiance
    # matches the reference kernel to fp rounding.  PASSIVE envmap only.
    # Validation-only: slower than the production path by design.
    reference_march: bool = False
    # Hard cap on inner null-collision iterations per micro-step is 1 by
    # construction (the wavefront advances one collision event per step).

    def replace(self, **kw) -> "RenderSettings":
        return dataclasses.replace(self, **kw)


DEFAULT_PARAM = Param()
DEFAULT_SETTINGS = RenderSettings()
