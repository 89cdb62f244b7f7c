"""Scene container: volume grids, lighting, and material parameters.

TPU-native replacement for the reference's scattered device globals — the
``__constant__`` texture handles (kernel.cu:339-347), sun constants
(kernel.cu:1254-1256) and envmap module state (kernel.cu:858-880) — as one
jit-traversable pytree.  "Uploading" a constant is simply passing a new
pytree leaf; XLA keeps everything resident in HBM across launches.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import Param
from ..ops import grid as gridmod
from ..ops import boundgrid as boundmod
from ..lighting import envmap as envmod


@struct.dataclass
class Materials:
    """Traced (non-static) render parameters — the fields of ``Param``
    (src/param.h) that the kernels consume.  Changing them does not retrigger
    compilation."""

    density: jnp.ndarray      # scalar
    brightness: jnp.ndarray   # scalar
    albedo: jnp.ndarray       # (3,)
    g: jnp.ndarray            # scalar
    sigma_t: jnp.ndarray      # (3,)


def materials_from_param(p: Param) -> Materials:
    return Materials(density=jnp.float32(p.density),
                     brightness=jnp.float32(p.brightness),
                     albedo=jnp.asarray(p.albedo, jnp.float32),
                     g=jnp.float32(p.g),
                     sigma_t=jnp.asarray(p.sigma_t, jnp.float32))


def make_material(sx, sy, sz, ax, ay, az) -> Materials:
    """(sigma_s, sigma_a) → normalized (sigma_t, albedo), max sigma_t = 1
    (reference ``Mat``, src/volumeRender.cpp:44-57)."""
    st = np.asarray([sx + ax, sy + ay, sz + az], np.float32)
    albedo = np.asarray([sx, sy, sz], np.float32) / st
    st = st / st.max()
    return Materials(density=jnp.float32(800.0), brightness=jnp.float32(1.0),
                     albedo=jnp.asarray(albedo), g=jnp.float32(0.877),
                     sigma_t=jnp.asarray(st))


# The 13 preset materials (src/volumeRender.cpp:1296-1308), as (σs, σa)
# triples fed through make_material.
MATERIAL_PRESETS = [
    (2.29, 2.39, 1.97, 0.0030, 0.0034, 0.046),
    (0.15, 0.21, 0.38, 0.015, 0.077, 0.19),
    (0.19, 0.25, 0.32, 0.018, 0.088, 0.20),
    (7.38, 5.47, 3.15, 0.0002, 0.0028, 0.0163),
    (0.18, 0.07, 0.03, 0.061, 0.97, 1.45),
    (2.19, 2.62, 3.00, 0.0021, 0.0041, 0.0071),
    (0.68, 0.70, 0.55, 0.0024, 0.0090, 0.12),
    (0.70, 1.22, 1.90, 0.0014, 0.0025, 0.0142),
    (0.74, 0.88, 1.01, 0.032, 0.17, 0.48),
    (1.09, 1.59, 1.79, 0.013, 0.070, 0.145),
    (11.6, 20.4, 14.9, 0.0, 0.0, 0.0),
    (2.55, 3.21, 3.77, 0.0011, 0.0024, 0.014),
    (1.0, 1.0, 1.0, 0.0, 0.0, 0.0),
]


@struct.dataclass
class Scene:
    density: gridmod.Grid3D        # (Nz,Ny,Nx) uint8 or f32
    # Coarse multiscale bound pyramid (ops.boundgrid.build_multiscale_bounds):
    # (Ncz,Ncy,Ncx, 2K) channels (max_k, min_k) per scale.
    bound: gridmod.Grid3D
    opacity: gridmod.Grid3D        # (Nz,Ny,Nx) f32 sun optical-depth cache
    envmap: envmod.Envmap
    sun_dir: jnp.ndarray           # (3,)
    sun_power: jnp.ndarray         # (3,) directional (disk-converted)
    sun_power_original: jnp.ndarray  # (3,) disk radiance for primary hits
    mat: Materials
    # Optional fused fetch table (see ``pack_density_opacity``): uint8
    # (Nz,Ny,Nx,4) rows [density_u8, od_hi, od_mid, od_lo] so the march
    # loop's density fetch and the NEE opacity-shortcut fetch
    # (kernel.cu:2181-2196) ride ONE row gather instead of two — gathers
    # are the dominant per-step cost on TPU (BENCH.md).  ``od_scale``
    # dequantizes the 24-bit fixed-point optical depth (max abs error
    # od_max/2²⁴ ≈ 1e-7·od_max — far below the opacity bake's own dt
    # discretization).  ``None`` → the integrator falls back to separate
    # density + opacity fetches.
    packed: Optional[gridmod.Grid3D] = None
    od_scale: Optional[jnp.ndarray] = None
    # Static: world-space segment radii per bound scale (k=0 is the
    # reference's search_radius; larger scales enable long homogeneous /
    # vacuum segments).  Baked into the pyramid; part of the treedef.
    bound_radii: tuple = struct.field(pytree_node=False, default=(0.05,))
    # Optional world→model transform — the reference's USE_MODEL_TRANSFORM
    # switch (kernel.cu:32): a row-major (3,4) *inverse* model matrix
    # (c_invModelMatrix, kernel.cu:628, uploaded identity at startup,
    # volumeRender.cpp:1350-1353) applied to every volume-space query —
    # ray/box intersections (kernel.cu:457-461, 658-661, 1635-1641) and
    # density/bound sample positions (kernel.cu:684-685, 1595-1613).
    # ``None`` (the default) compiles to the untransformed graph.  Only
    # rigid transforms (rotation + translation) keep slab-test t values
    # valid as world marching distances — the same parameterization the
    # reference's (compiled-out) path assumes, since it never renormalizes
    # the transformed direction.  Unlike the reference we also transform
    # the NEE opacity-shortcut position: the reference samples opacity_tex
    # at the untransformed world point (kernel.cu:2184) while every other
    # volume query transforms — an inconsistency in its dead code that
    # would misalign the cache with the density field.
    world_to_model: Optional[jnp.ndarray] = None


def to_model_point(scene: Scene, p: jnp.ndarray) -> jnp.ndarray:
    """World position → model space (``mul(c_invModelMatrix, float4(p,1))``,
    kernel.cu:641-649: row dot products + translation column)."""
    m = scene.world_to_model
    if m is None:
        return p
    return p @ m[:, :3].T + m[:, 3]


def to_model_dir(scene: Scene, d: jnp.ndarray) -> jnp.ndarray:
    """World direction → model space (``mul(c_invModelMatrix, float3)``,
    kernel.cu:631-638: rotation/scale only, no translation, no
    renormalization — matching the reference's slab-test usage)."""
    m = scene.world_to_model
    if m is None:
        return d
    return d @ m[:, :3].T


def make_scene(volume: np.ndarray,
               mat: Materials,
               envmap: Optional[envmod.Envmap] = None,
               sun_dir=(0.0, 1.0, 0.0),
               sun_power=(0.0, 0.0, 0.0),
               sun_power_original=None,
               box_min=None, box_max=None,
               search_radius: float = 0.05,
               quantize: bool = True,
               opacity: Optional[np.ndarray] = None,
               bound_stride: int = 2,
               bound_scales=(1.0, 5.0, 25.0),
               reference_bounds: bool = False,
               world_to_model=None) -> Scene:
    """Bake a dense volume into a render-ready scene.

    Mirrors the ingestion path loadVdbFile → init_cuda (volumeRender.cpp:
    968-1019, kernel.cu:354-420): optional normalize-by-max uint8
    quantization, bound-grid build on the (quantized) data, aspect-derived
    default bounding box.  ``opacity`` (a baked sun optical-depth volume,
    density-shaped) is packed into the fused [density, od₂₄] row table —
    see ``pack_density_opacity``; ``scene.opacity`` itself is a (1,1,1)
    zero placeholder unless packing is impossible (f32 density).  The bound grid is the TPU-native coarse
    multiscale pyramid (see ops.boundgrid.build_multiscale_bounds) — or,
    with ``reference_bounds=True``, the reference's full-resolution
    (max, min) bound texture (kernel.cu:392-395, built exactly like
    volumeRender.cpp:1088-1267) for draw-for-draw validation against the
    reference kernels (config.RenderSettings.reference_march).
    """
    volume = np.asarray(volume, np.float32)
    if quantize:
        data = np.asarray(gridmod.quantize_u8(volume))
    else:
        data = volume
    density = gridmod.make_grid(jnp.asarray(data), box_min, box_max)
    if reference_bounds:
        bnd2 = boundmod.build_bound_grid(data, search_radius)
        leap = np.zeros(data.shape + (1,), data.dtype)
        bound_g = gridmod.Grid3D(
            data=jnp.asarray(np.concatenate([bnd2, leap], axis=-1)),
            box_min=density.box_min, box_max=density.box_max)
        bound_scales = (1.0,)
    else:
        from ..volume import loaders as loadersmod
        bound = loadersmod.build_multiscale_bounds_native(
            data, search_radius, stride=bound_stride,
            scale_mults=bound_scales)
        if bound is None:
            bound = boundmod.build_multiscale_bounds(
                data, search_radius, stride=bound_stride,
                scale_mults=bound_scales)

        # The coarse grid pads each axis to a stride multiple; its box must
        # map cell c exactly onto voxels [c*stride, (c+1)*stride) — extend
        # box_max by the padded fraction so the nearest-cell lookup never
        # skews when stride does not divide the dims.
        nz, ny, nx = data.shape
        pad_scale = np.array([bound.shape[2] * bound_stride / nx,
                              bound.shape[1] * bound_stride / ny,
                              bound.shape[0] * bound_stride / nz],
                             np.float32)
        bound_box_max = density.box_min + \
            (density.box_max - density.box_min) * jnp.asarray(pad_scale)
        bound_g = gridmod.Grid3D(data=jnp.asarray(bound),
                                 box_min=density.box_min,
                                 box_max=bound_box_max)
    # A (1,1,1) zero placeholder stands in for "no baked opacity" — clamp
    # sampling makes it od ≡ 0 everywhere, identical to a full-size zero
    # grid, without shipping 64 MB of zeros to the device (transfers
    # through the remote-TPU tunnel are the dominant scene-build cost).
    opacity_g = gridmod.Grid3D(data=jnp.zeros((1, 1, 1), jnp.float32),
                               box_min=density.box_min,
                               box_max=density.box_max)
    if envmap is None:
        envmap = envmod.constant((0.0, 0.0, 0.0))
    if world_to_model is not None:
        world_to_model = np.asarray(world_to_model, np.float32)
        if world_to_model.shape == (4, 4):
            world_to_model = world_to_model[:3]  # drop the affine last row
        if world_to_model.shape != (3, 4):
            raise ValueError("world_to_model must be a row-major (3,4) or "
                             f"(4,4) matrix, got {world_to_model.shape}")
        world_to_model = jnp.asarray(world_to_model)
    spo = sun_power if sun_power_original is None else sun_power_original
    scene = Scene(density=density, bound=bound_g, opacity=opacity_g,
                 envmap=envmap,
                 sun_dir=jnp.asarray(sun_dir, jnp.float32),
                 sun_power=jnp.asarray(sun_power, jnp.float32),
                 sun_power_original=jnp.asarray(spo, jnp.float32),
                 mat=mat,
                 bound_radii=tuple(float(search_radius * m)
                                   for m in bound_scales),
                 world_to_model=world_to_model)
    return pack_density_opacity(scene, opacity)


def unpack_od(packed_rows: jnp.ndarray, od_scale,
              dequantized: bool = False) -> jnp.ndarray:
    """Recombine the 24-bit fixed-point optical depth from packed rows
    (``(..., 4)``, channels [density, od_hi, od_mid, od_lo]).  Linear in
    the channels, so it commutes with trilinear filtering; pass
    ``dequantized=True`` for rows that went through the u8→[0,1] fetch
    dequantization (``sample_*``) rather than a raw fetch."""
    od = (packed_rows[..., 1] * 65536.0 + packed_rows[..., 2] * 256.0
          + packed_rows[..., 3]) * od_scale
    return od * 255.0 if dequantized else od


def pack_density_opacity(scene: Scene, od: "np.ndarray | None" = None) \
        -> Scene:
    """Fuse the uint8 density grid and the sun-opacity cache into one
    (Nz,Ny,Nx,4) uint8 row table [density, od_hi, od_mid, od_lo].

    The march loop needs the density at the free-flight event point and —
    only on a collision — the baked optical depth at the collision point
    for the deep-scatter NEE shortcut (kernel.cu:2181-2196).  Both
    positions are known *before* the fetch (a control-collision breaks on
    the drawn distance alone), and every lane consumes at most one of the
    two values, so a single gather of this packed row replaces two
    separate pool-wide gathers per march — the single most expensive ops
    in the step (see BENCH.md "where the time goes").

    The optical depth is 24-bit fixed point over [0, od_max]: absolute
    error ≤ od_max/2²⁴, i.e. ~1e-7 relative in the shortcut's
    ``exp(-σt·ρ'·od)`` exponent — negligible against the bake's own dt
    discretization.  The table is assembled on the device from the
    already-resident density plane plus (when ``od`` is given) three
    quantized uint8 planes, so packing ships at most 3 bytes/voxel through
    the host↔device link — remote-TPU transfers dominate scene build.
    ``scene.opacity`` stays the (1,1,1) placeholder: every consumer
    (integrator fallback paths, the reference oracle) reconstructs od from
    the packed table via ``unpack_od``.

    Requires a quantized (uint8) density grid (and, if given, an ``od`` of
    the same shape); otherwise the scene keeps the separate-fetch layout —
    a real ``od`` is then stored full-resolution f32 in ``scene.opacity``.
    """
    den = scene.density.data
    full_od = od is not None and float(np.max(od)) > 0.0
    if den.dtype != jnp.uint8 or den.ndim != 3 \
            or (full_od and od.shape != den.shape[:3]):
        sc = scene.replace(packed=None, od_scale=None)
        if full_od:
            sc = sc.replace(opacity=gridmod.Grid3D(
                data=jnp.asarray(od, jnp.float32),
                box_min=scene.density.box_min,
                box_max=scene.density.box_max))
        return sc
    if full_od:
        od = np.asarray(od, np.float32)
        od_max = max(float(od.max()), 1e-30)
        q = np.minimum(np.round(od / od_max * ((1 << 24) - 1)),
                       float((1 << 24) - 1)).astype(np.uint32)
        planes = [jnp.asarray((q >> 16).astype(np.uint8)),
                  jnp.asarray(((q >> 8) & 0xFF).astype(np.uint8)),
                  jnp.asarray((q & 0xFF).astype(np.uint8))]
        od_scale = jnp.float32(od_max / ((1 << 24) - 1))
    else:
        z = jnp.zeros_like(den)
        planes = [z, z, z]
        od_scale = jnp.float32(0.0)
    packed = jnp.stack([den] + planes, axis=-1)
    packed_g = gridmod.Grid3D(data=packed,
                              box_min=scene.density.box_min,
                              box_max=scene.density.box_max)
    return scene.replace(packed=packed_g, od_scale=od_scale)


def can_fuse_tables(scene: Scene) -> bool:
    """True when the unified march/setup pass can build its fused row
    table from this scene (quantized packed density + uint8 bound pyramid
    with ≤ 8 channels) — see integrator ``fused_fetch``."""
    return (scene.packed is not None
            and scene.bound.data.dtype == jnp.uint8
            and scene.bound.data.ndim == 4
            and scene.bound.data.shape[-1] <= 8)
