"""Scalar draw-for-draw numpy oracle of the reference's active kernel.

A per-pixel, per-sample transcription of ``__d_render_bounded_decomp``
(reference src/volumeRender_kernel.cu:1958-2318) and its helpers —
``Tr_spectral`` (:754-808), ``intersectBox``/``intersectSuperVolume``
(:654-680, 1626-1661), ``HGPhaseFunction``/``Frame`` (:557-619),
``background`` (:1258-1267), ``CudaRng`` (src/sampler.h:3-46) — at
*reference semantics*: full-resolution (max, min) bound texture,
``search_radius`` absolute segment clamps, unsegmented whole-chord shadow
march.  All arithmetic is float32 so the wavefront integrator in
``reference_march`` parity mode reproduces the same per-sample radiance up
to fp rounding (libm vs XLA transcendentals differ by ~1 ulp, which very
occasionally flips a boundary comparison and diverges a sample's draw
sequence — the parity test tolerates a small fraction of such samples).

Two deliberate deviations, both shared with the wavefront (see
config.RenderSettings.reference_march):

* The shadow direction is ``sun_dir`` itself; the reference computes
  ``normalize(sun_dir * 1e10 - pos)`` which equals ``sun_dir`` to 1 ulp
  (the f32 spacing at 1e10 is ~1024, so ``pos`` vanishes in the subtract).
* C++ leaves the evaluation order of ``phase.sample(frame, rng.next(),
  rng.next())`` unspecified; here (like the wavefront) the first draw is
  ``rnd0``.  Statistically irrelevant (both draws are uniform).
"""

from __future__ import annotations

import struct

import numpy as np

F = np.float32
M32 = 0xFFFFFFFF
M_PI = 3.14159265358979323846
# sun cone + disk constants (kernel.cu:1263, 1276)
SUN_COS_CONE = F(94.0 / np.sqrt(94.0 * 94.0 + 0.45 * 0.45))
HYPERION = F(0.066666666666666666667)


def _hash(seed: int) -> int:
    """Wang-style hash (src/sampler.h:3-11)."""
    seed = ((seed ^ 61) ^ (seed >> 16)) & M32
    seed = (seed * 9) & M32
    seed ^= seed >> 4
    seed = (seed * 0x27D4EB2D) & M32
    seed ^= seed >> 15
    return seed


class CudaRng:
    """src/sampler.h:30-46 (init burns one RngNext)."""

    __slots__ = ("x", "y")

    def __init__(self, px: int, py: int, frame: int):
        self.x = _hash(((px << 16) | py) & M32)
        self.y = _hash(frame & M32)
        self._next_u32()

    def _next_u32(self) -> int:
        x, y = self.x, self.y
        result = (x * 0x9E3779BB) & M32
        y ^= x
        x = (((x << 26) | (x >> 6)) ^ y ^ ((y << 9) & M32)) & M32
        y = ((x << 13) | (x >> 19)) & M32
        self.x, self.y = x, y
        return result

    def next(self) -> F:
        """[0,1) float bit trick (src/sampler.h:24-28); exact in f32."""
        bits = 0x3F800000 | (self._next_u32() >> 9)
        return F(struct.unpack("<f", struct.pack("<I", bits))[0] - 1.0)


class OracleScene:
    """Numpy snapshot of a repo Scene + per-pixel camera rays.

    Camera rays are taken from the repo's own ``generate_rays`` (bit-equal
    to what the wavefront spawns) so the oracle validates the integrator,
    not the camera (which has its own parity tests)."""

    def __init__(self, scene, cam, width: int, height: int,
                 search_radius: float = 0.05, max_depth: int = 800):
        import jax.numpy as jnp
        from cuda_volpath_tpu.render import camera as cammod

        self.width, self.height = width, height
        self.search_radius = F(search_radius)
        self.max_depth = max_depth
        px, py = jnp.meshgrid(jnp.arange(width), jnp.arange(height))
        o, d = cammod.generate_rays(cam, width, height, px, py)
        self.ray_o = np.asarray(o, np.float32)   # (H, W, 3)
        self.ray_d = np.asarray(d, np.float32)

        self.bmin = np.asarray(scene.density.box_min, np.float32)
        self.bmax = np.asarray(scene.density.box_max, np.float32)
        self.density_data = np.asarray(scene.density.data)  # (Nz,Ny,Nx) u8/f32
        bd = np.asarray(scene.bound.data)                   # (...,3) full-res
        assert bd.shape[:3] == self.density_data.shape, (
            "oracle needs a reference_bounds=True scene (full-res bound grid)")
        self.bound_data = bd
        self.env_image = np.asarray(scene.envmap.image, np.float32)
        self.sun_dir = np.asarray(scene.sun_dir, np.float32)
        self.sun_power = np.asarray(scene.sun_power, np.float32)
        self.sun_power_orig = np.asarray(scene.sun_power_original, np.float32)
        self.opacity = None
        if scene.packed is not None and scene.od_scale is not None \
                and float(scene.od_scale) > 0.0:
            # od lives (only) in the packed [density, od24] table now —
            # reconstruct the same 24-bit values the wavefront fetches
            pk = np.asarray(scene.packed.data).astype(np.float32)
            self.opacity = ((pk[..., 1] * 65536.0 + pk[..., 2] * 256.0
                             + pk[..., 3])
                            * np.float32(scene.od_scale)).astype(np.float32)
        elif float(np.abs(np.asarray(scene.opacity.data)).max()) > 0:
            self.opacity = np.asarray(scene.opacity.data, np.float32)

        self.density = F(scene.mat.density)
        self.brightness = F(scene.mat.brightness)
        self.albedo = np.asarray(scene.mat.albedo, np.float32)
        self.g = F(scene.mat.g)
        self.sigma_t = np.asarray(scene.mat.sigma_t, np.float32)


def _fetch_idx(sc: OracleScene, pos: np.ndarray):
    """Nearest-voxel index with clamp addressing (ops/grid.py:109-119 ≙
    tex3D point + clamp, kernel.cu:173-178)."""
    nz, ny, nx = sc.density_data.shape[:3]
    local = (pos - sc.bmin) / (sc.bmax - sc.bmin)
    dims = np.asarray([nx, ny, nz], np.float32)
    idxf = np.floor(local * dims)
    with np.errstate(invalid="ignore"):
        idx = np.clip(idxf.astype(np.int64), 0,
                      np.asarray([nx - 1, ny - 1, nz - 1]))
    return int(idx[2]), int(idx[1]), int(idx[0])


def _density_fetch(sc: OracleScene, pos: np.ndarray) -> F:
    """vol_sigma_t's raw texture fetch (kernel.cu:682-694), u8 normalized."""
    z, y, x = _fetch_idx(sc, pos)
    v = sc.density_data[z, y, x]
    if sc.density_data.dtype == np.uint8:
        return F(v) * F(1.0 / 255.0)
    return F(v)


def _bound_fetch(sc: OracleScene, pos: np.ndarray):
    """vol_bound_minmax (kernel.cu:1611-1624): point-sampled uchar2."""
    z, y, x = _fetch_idx(sc, pos)
    b = sc.bound_data[z, y, x]
    if sc.bound_data.dtype == np.uint8:
        return F(b[0]) * F(1.0 / 255.0), F(b[1]) * F(1.0 / 255.0)
    return F(b[0]), F(b[1])


def _opacity_fetch(sc: OracleScene, pos: np.ndarray) -> F:
    z, y, x = _fetch_idx(sc, pos)
    return F(sc.opacity[z, y, x])


def _isect(o, d, bmin, bmax):
    """intersectBox slab test (kernel.cu:654-680); returns raw t's."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = F(1.0) / d
        tbot = inv * (bmin - o)
        ttop = inv * (bmax - o)
    tmin = np.minimum(ttop, tbot)
    tmax = np.maximum(ttop, tbot)
    largest = F(tmin.max())
    smallest = F(tmax.min())
    hit = bool(smallest > largest) and bool(smallest >= F(1e-3))
    return hit, largest, smallest


def _eval_env(sc: OracleScene, d: np.ndarray) -> np.ndarray:
    """Envmap::eval_envmap (kernel.cu:956-973) via dir→uv (:882-895) and a
    point fetch (lighting/envmap.py:36-69)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        theta = F(np.arctan(d[2] / d[0])) + F(M_PI / 2)
    if d[0] < 0:
        theta = theta + F(M_PI)
    u = theta * F(1.0 / (2.0 * M_PI))
    v = F(np.arccos(np.clip(d[1], F(-1.0), F(1.0)))) * F(1.0 / M_PI)
    h, w = sc.env_image.shape[:2]
    ix = min(max(int(np.floor(u * F(w))), 0), w - 1)
    iy = min(max(int(np.floor(v * F(h))), 0), h - 1)
    return sc.env_image[iy, ix]


def _normalize(v: np.ndarray) -> np.ndarray:
    return v * (F(1.0) / F(np.sqrt(F((v * v).sum()))))


def _hg_eval(g: F, cos_theta: F) -> F:
    """HGPhaseFunction::evaluate (kernel.cu:600-603)."""
    return (F(1.0) - g * g) / (
        F(4.0 * M_PI) * F(np.power(F(1.0) + g * g - F(2.0) * g * cos_theta,
                                   F(1.5))))


def _hg_sample(g: F, fwd: np.ndarray, u0: F, u1: F) -> np.ndarray:
    """Frame + HGPhaseFunction::sample + call-site normalize
    (kernel.cu:557-612, 2300-2301; mirrors ops/phase.py exactly)."""
    # Frame(fwd) (kernel.cu:562-568)
    a = np.asarray([0, 1, 0], np.float32) if abs(fwd[0]) > 0.1 \
        else np.asarray([1, 0, 0], np.float32)
    t = _normalize(np.cross(a, fwd).astype(np.float32))
    b = np.cross(fwd, t).astype(np.float32)
    if abs(g) > 1e-6:
        s = F(2.0) * u0 - F(1.0)
        f = (F(1.0) - g * g) / (F(1.0) + g * s)
        cos_theta = (F(0.5) / g) * (F(1.0) + g * g - f * f)
        cos_theta = min(max(cos_theta, F(0.0)), F(1.0))
    else:
        cos_theta = F(2.0) * u0 - F(1.0)
    sin_theta = F(np.sqrt(max(F(0.0), F(1.0) - cos_theta * cos_theta)))
    phi = F(2.0 * M_PI) * u1
    local = np.asarray([F(np.cos(phi)) * sin_theta,
                        F(np.sin(phi)) * sin_theta, cos_theta], np.float32)
    world = t * local[0] + b * local[1] + fwd * local[2]
    return _normalize(world.astype(np.float32))


def _tr_spectral(sc: OracleScene, rng: CudaRng, start: np.ndarray,
                 inv_sigma: F, density_prime: F) -> np.ndarray:
    """Tr_spectral (kernel.cu:754-808): spectral delta tracking with one
    shared acceptance draw; shadow dir == sun_dir (see module docstring)."""
    d = sc.sun_dir
    hit, tn, tf = _isect(start, d, sc.bmin, sc.bmax)
    if not hit:
        return np.ones(3, np.float32)
    tn = max(tn, F(0.0))
    max_t = tf  # min(t_far, |start-end|≈1e10) (kernel.cu:775)
    dist = tn
    term = [False, False, False]
    while True:
        dist = dist + (-F(np.log(rng.next()))) * inv_sigma
        if dist >= max_t or (term[0] and term[1] and term[2]):
            break
        pos = start + d * dist
        e = rng.next()
        den = _density_fetch(sc, pos) * density_prime
        for ch in range(3):
            if not term[ch] and e < sc.sigma_t[ch] * den * inv_sigma:
                term[ch] = True
    return np.asarray([F(1.0) - F(t) for t in term], np.float32)


def trace_sample(sc: OracleScene, px: int, py: int, sample: int,
                 decomp: bool = True):
    """One (pixel, sample) path — ``__d_render_bounded_decomp``
    (kernel.cu:1958-2318) with SPECTRAL_TRACKING=1, SUN_LIGHT=1,
    PASSIVE_ENVMAP=1.  Returns (rgb, num_scatters) with the film transform
    (max(r,0) * brightness, kernel.cu:2306-2317) applied."""
    rng = CudaRng(px, py, sample)
    o = sc.ray_o[py, px].copy()
    d = sc.ray_d[py, px].copy()
    radiance = np.zeros(3, np.float32)
    throughput = np.ones(3, np.float32)
    sigma_t = sc.sigma_t
    sigma_s = (sigma_t * sc.albedo).astype(np.float32)
    max_st = F(sigma_t.max())
    min_st = F(sigma_t.min())
    ns = 0

    while ns < sc.max_depth:
        hit, tn_raw, tf_raw = _isect(o, d, sc.bmin, sc.bmax)
        if not hit:
            # background() (kernel.cu:1258-1267, 2024-2027)
            if ns == 0 and F(np.dot(d, sc.sun_dir)) > SUN_COS_CONE:
                radiance = radiance + sc.sun_power_orig * throughput
            else:
                radiance = radiance + _eval_env(sc, d) * throughput
            break
        # intersectSuperVolume (kernel.cu:1626-1661): clamp near to 0, far
        # to search_radius ABSOLUTE, bound fetch at entry, 1e-4 d_max floor
        t_near = max(tn_raw, F(0.0))
        t_far = min(tf_raw, sc.search_radius)
        dmax_raw, dmin = _bound_fetch(sc, o + d * t_near)
        dmax = max(F(1e-4), dmax_raw)
        use_decomp = decomp and dmin > F(0.0)

        dist = t_near
        pos = o + d * t_near
        # hyperion schedule (kernel.cu:2039-2043)
        s = min(max(F(ns - 5) * HYPERION, F(0.0)), F(1.0))
        g = (F(1.0) - s) * sc.g
        reduction = (F(1.0) - s) + s * (F(1.0) - sc.g)
        density_prime = reduction * sc.density
        sigma_t_prime = max_st * density_prime * dmax

        # decomposition control (kernel.cu:2047-2078)
        if use_decomp:
            sigma_c_prime = min_st * density_prime * dmin
            distc = dist - F(np.log(rng.next())) / max(sigma_c_prime,
                                                       F(1e-20))
            sigma_r_prime = max(sigma_t_prime - sigma_c_prime, F(1e-20))
            sigma_c = sigma_c_prime
            inv_sigma = F(1.0) / sigma_r_prime
        else:
            distc = F(1e20)
            sigma_c = F(0.0)
            inv_sigma = F(1.0) / sigma_t_prime
        inv_sigma_t = F(1.0) / sigma_t_prime

        # inner null-collision loop (kernel.cu:2082-2142)
        while True:
            dist = dist + (-F(np.log(rng.next()))) * inv_sigma
            if dist >= distc or dist >= t_far:
                pos = o + d * distc
                break
            pos = o + d * dist
            den = _density_fetch(sc, pos) * density_prime
            st_den = (sigma_t * den - sigma_c).astype(np.float32)
            ss_den = (sigma_s * den - sigma_c).astype(np.float32)
            sn_den = (sigma_t_prime - st_den).astype(np.float32)
            ps = F(np.abs(st_den * throughput).sum())
            pn = F(np.abs(sn_den * throughput).sum())
            c = ps + pn
            e = rng.next() * c
            if e < ps:
                throughput = (throughput * ss_den
                              * (inv_sigma_t * c / ps)).astype(np.float32)
                break
            throughput = (throughput * sn_den
                          * (inv_sigma_t * c / pn)).astype(np.float32)

        through = min(distc, dist) >= t_far
        if not through:
            ns += 1
        if through:
            # tracking restart (kernel.cu:2149-2155)
            o = o + d * t_far
            continue

        # direct lighting (kernel.cu:2163-2217), post-increment hyperion
        s2 = min(max(F(ns - 5) * HYPERION, F(0.0)), F(1.0))
        reduction2 = (F(1.0) - s2) + s2 * (F(1.0) - sc.g)
        density_prime2 = reduction2 * sc.density
        sigma_t_prime2 = max_st * density_prime2 * dmax
        inv_sigma2 = F(1.0) / sigma_t_prime2
        # phase.evaluate uses the SEGMENT's g (the NEE block's recomputed g
        # shadows the variable but `phase` was constructed earlier)
        ph = _hg_eval(g, F(np.dot(d, sc.sun_dir)))
        if sc.opacity is not None and sample > 10 and ns > 20:
            a = np.exp(-sigma_t * (density_prime2
                                   * _opacity_fetch(sc, pos))
                       ).astype(np.float32)
        else:
            a = _tr_spectral(sc, rng, pos, inv_sigma2, density_prime2)
        radiance = radiance + sc.sun_power * (throughput * ph * a)

        # scatter (kernel.cu:2300-2303)
        u0 = rng.next()
        u1 = rng.next()
        d = _hg_sample(g, d, u0, u1)
        o = pos.copy()

    rgb = (np.maximum(radiance, F(0.0)) * sc.brightness).astype(np.float32)
    return rgb, ns


def render_oracle(sc: OracleScene, spp: int, decomp: bool = True):
    """Full oracle render: returns (rgb[(spp,H,W,3)], heat[(spp,H,W)])."""
    h, w = sc.height, sc.width
    rgb = np.zeros((spp, h, w, 3), np.float32)
    heat = np.zeros((spp, h, w), np.int32)
    for s in range(spp):
        for y in range(h):
            for x in range(w):
                rgb[s, y, x], heat[s, y, x] = trace_sample(sc, x, y, s,
                                                           decomp=decomp)
    return rgb, heat
