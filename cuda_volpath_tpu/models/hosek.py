"""Hosek-Wilkie spectral sky model ("An Analytic Model for Full Spectral
Sky-Dome Radiance", Hosek & Wilkie 2012), including the v1.4 "alien world"
extension used by the reference renderer.

This is a from-scratch numpy implementation of the model's published
formulas, driven by the fitted coefficient tables in ``hosek_data.npz``
(extracted from the model's publicly distributed dataset; see
tools/extract_hosek_data.py).  It replaces the reference's vendored C
implementation (src/sunsky/hosek/ArHosekSkyModel.cpp) with vectorized
host-side math — the sky is baked once per sun move into an envmap, so this
never runs on-device.

Functional parity targets (reference file:line):
* quintic-Bezier config cooking over elevation^(1/3), bilinear in
  turbidity/albedo — ArHosekSkyModel.cpp:147-289
* sky radiance F(theta, gamma) — ArHosekSkyModel.cpp:291-304, 519-561
* alien-world state init (blackbody re-scaled sun) — :402-510
* solar radiance with limb darkening — :653-815
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

_DATA = None


def _data():
    global _DATA
    if _DATA is None:
        _DATA = np.load(Path(__file__).parent / "hosek_data.npz")
    return _DATA


TERRESTRIAL_SOLAR_RADIUS = (0.51 * np.pi / 180.0) / 2.0
# Fudge factor scaling Planck's law to the model's solar spectrum
# (ArHosekSkyModel.cpp:357; note C's `3.19992 * 10E-11` == 3.19992e-10).
BLACKBODY_SCALE = 3.19992e-10
# Solar spectrum at top of atmosphere per 40nm band from 320nm
# (Preetham data, ArHosekSkyModel.cpp:387-400).
ORIGINAL_SOLAR_RADIANCE = np.array([
    7500.0, 12500.0, 21127.5, 26760.5, 30663.7, 27825.0,
    25503.8, 25134.2, 23212.1, 21526.7, 19870.8])


@dataclasses.dataclass
class SkyState:
    configs: np.ndarray       # (11, 9)
    radiances: np.ndarray     # (11,)
    ecf_sun: np.ndarray       # (11,) emission correction, sun
    ecf_sky: np.ndarray       # (11,) emission correction, sky
    solar_radius: float
    turbidity: float
    elevation: float


def _bezier_weights(elevation: float) -> np.ndarray:
    """Quintic Bernstein weights in t = (elev / (π/2))^(1/3)."""
    t = np.power(max(elevation, 0.0) / (np.pi / 2.0), 1.0 / 3.0)
    return np.array([
        (1 - t) ** 5,
        5 * (1 - t) ** 4 * t,
        10 * (1 - t) ** 3 * t ** 2,
        10 * (1 - t) ** 2 * t ** 3,
        5 * (1 - t) * t ** 4,
        t ** 5,
    ])


def _cook(dataset: np.ndarray, turbidity: float, albedo: float,
          elevation: float) -> np.ndarray:
    """Blend the fitted dataset over elevation (Bezier), turbidity (linear)
    and ground albedo (linear).  ``dataset`` is (11, 2, 10, 6, ...) —
    wavelengths × albedo × turbidity × elevation-control-points × coeffs.
    Returns (11, ...)."""
    it = int(turbidity)
    rem = turbidity - it
    w = _bezier_weights(elevation)  # (6,)
    # contract elevation control points
    d = np.tensordot(dataset, w, axes=([3], [0]))  # (11, 2, 10, ...)
    lo = d[:, 0, it - 1] * (1 - albedo) + d[:, 1, it - 1] * albedo
    if it == 10:
        return (1 - rem) * lo
    hi = d[:, 0, it] * (1 - albedo) + d[:, 1, it] * albedo
    return (1 - rem) * lo + rem * hi


def _blackbody(temperature: float, lam_m: float) -> float:
    """Planck radiance (ArHosekSkyModel.cpp:363-376; c1 = 3.74177*10E-17)."""
    c1 = 3.74177e-16
    c2 = 0.0143878
    return (c1 / lam_m ** 5) / (np.exp(c2 / (lam_m * temperature)) - 1.0)


def alloc_init(solar_elevation: float, turbidity: float,
               albedo: float) -> SkyState:
    """Terrestrial state (ArHosekSkyModel.cpp:308-344)."""
    d = _data()
    return SkyState(
        configs=_cook(d["datasets"], turbidity, albedo, solar_elevation),
        radiances=_cook(d["datasets_rad"], turbidity, albedo, solar_elevation),
        ecf_sun=np.ones(11), ecf_sky=np.ones(11),
        solar_radius=TERRESTRIAL_SOLAR_RADIUS,
        turbidity=turbidity, elevation=solar_elevation)


def alienworld_alloc_init(solar_elevation: float, solar_intensity: float,
                          solar_temperature: float, turbidity: float,
                          albedo: float) -> SkyState:
    """Alien-world state (ArHosekSkyModel.cpp:402-510): rescale each band by
    the ratio of a blackbody spectrum to the model's solar spectrum, resize
    the solar disc to conserve energy, and counter-scale the sky."""
    st = alloc_init(solar_elevation, turbidity, albedo)
    wl = np.arange(11)
    owl = (320.0 + 40.0 * wl) * 1e-9
    nsr = np.array([_blackbody(solar_temperature, o) for o in owl]) \
        * BLACKBODY_SCALE
    ecf_sun = nsr / ORIGINAL_SOLAR_RADIANCE
    ratio = ecf_sun[2:11].sum() / 9.0
    solar_radius = (np.sqrt(solar_intensity) * TERRESTRIAL_SOLAR_RADIUS
                    / np.sqrt(ratio))
    ecf_sky = solar_intensity * ecf_sun / ratio
    return dataclasses.replace(st, ecf_sun=ecf_sun, ecf_sky=ecf_sky,
                               solar_radius=float(solar_radius))


def _radiance_internal(config: np.ndarray, theta, gamma):
    """The 9-parameter sky radiance distribution F (ArHosekSkyModel.cpp:
    291-304).  ``config`` is (..., 9); theta/gamma broadcastable arrays."""
    c = [config[..., i] for i in range(9)]
    cos_g = np.cos(gamma)
    cos_t = np.cos(theta)
    exp_m = np.exp(c[4] * gamma)
    ray_m = cos_g * cos_g
    mie_m = (1.0 + ray_m) / np.power(1.0 + c[8] * c[8] - 2.0 * c[8] * cos_g,
                                     1.5)
    zenith = np.sqrt(np.maximum(cos_t, 0.0))
    return ((1.0 + c[0] * np.exp(c[1] / (cos_t + 0.01)))
            * (c[2] + c[3] * exp_m + c[5] * ray_m + c[6] * mie_m
               + c[7] * zenith))


def radiance(st: SkyState, theta, gamma, wavelength: float):
    """Spectral sky radiance with linear wavelength interpolation between
    the 40nm bands (ArHosekSkyModel.cpp:519-561)."""
    x = (wavelength - 320.0) / 40.0
    low = int(x)
    if low < 0 or low >= 11:
        return np.zeros(np.broadcast(theta, gamma).shape)
    interp = x - low
    val_low = (_radiance_internal(st.configs[low], theta, gamma)
               * st.radiances[low] * st.ecf_sky[low])
    if interp < 1e-6:
        return val_low
    out = (1.0 - interp) * val_low
    if low + 1 < 11:
        out = out + interp * (_radiance_internal(st.configs[low + 1], theta,
                                                 gamma)
                              * st.radiances[low + 1] * st.ecf_sky[low + 1])
    return out


_PIECES = 45
_ORDER = 4


def _solar_sr_internal(st: SkyState, turb_idx: int, wl: int, elevation):
    """Piecewise-cubic direct solar radiance vs elevation
    (ArHosekSkyModel.cpp:656-685).  The 4 coefficients per piece are stored
    highest-degree-first."""
    solar = _data()["solar"]  # (11, 10, 45, 4)
    elevation = np.asarray(elevation, np.float64)
    pos = np.minimum((np.power(2.0 * np.maximum(elevation, 0.0) / np.pi,
                               1.0 / 3.0) * _PIECES).astype(int), 44)
    break_x = np.power(pos / _PIECES, 3.0) * (np.pi * 0.5)
    x = elevation - break_x
    coefs = solar[wl, turb_idx, pos]  # (..., 4), [x³, x², x¹, x⁰]
    res = ((coefs[..., 0] * x + coefs[..., 1]) * x + coefs[..., 2]) * x \
        + coefs[..., 3]
    return res * st.ecf_sun[wl]


def solar_radiance_direct(st: SkyState, wavelength: float, elevation, gamma):
    """Direct (disc) solar radiance incl. limb darkening
    (ArHosekSkyModel.cpp:687-789)."""
    turb_low = int(st.turbidity) - 1
    turb_frac = st.turbidity - (turb_low + 1)
    if turb_low == 9:
        turb_low, turb_frac = 8, 1.0
    wl_low = int((wavelength - 320.0) / 40.0)
    wl_frac = np.fmod(wavelength, 40.0) / 40.0
    if wl_low == 10:
        wl_low, wl_frac = 9, 1.0

    def sr(tb, wl):
        return _solar_sr_internal(st, tb, wl, elevation)

    direct = ((1 - turb_frac) * ((1 - wl_frac) * sr(turb_low, wl_low)
                                 + wl_frac * sr(turb_low, wl_low + 1))
              + turb_frac * ((1 - wl_frac) * sr(turb_low + 1, wl_low)
                             + wl_frac * sr(turb_low + 1, wl_low + 1)))

    limb = _data()["limb"]  # (11, 6)
    ld = (1 - wl_frac) * limb[wl_low] + wl_frac * limb[wl_low + 1]
    sol_rad_sin = np.sin(st.solar_radius)
    ar2 = 1.0 / (sol_rad_sin * sol_rad_sin)
    sin_g = np.sin(gamma)
    sc2 = np.maximum(1.0 - ar2 * sin_g * sin_g, 0.0)
    cosine = np.sqrt(sc2)
    darkening = sum(ld[i] * cosine ** i for i in range(6))
    return direct * darkening


def solar_radiance(st: SkyState, theta, gamma, wavelength: float):
    """Total radiance toward the solar disc: direct + inscattered
    (ArHosekSkyModel.cpp:791-815)."""
    return (solar_radiance_direct(st, wavelength, np.pi / 2.0 - theta, gamma)
            + radiance(st, theta, gamma, wavelength))
