"""Preetham analytic sun/sky model (Preetham et al., SIGGRAPH 99).

From-scratch vectorized numpy implementation of the reference's alternative
sky model behind the ``SkyModel<Impl>`` facade
(reference src/sunsky/sky_preetham.cpp:76-275, sky_preetham.h:31-138,
sunsky.h:6-25; the active build uses the Tungsten/Hosek impl instead,
src/volumeRender.cpp:266).  Same duck-typed API as ``models.skydome.Skydome``
so it drops into ``lighting.sunsky.bake(sky=...)``.

The coefficient tables are published constants: the CIE spectral
sensitivity curves and Table 2 of the Preetham paper (solar spectral
radiance + ozone / water-vapor attenuation coefficients), transcribed as
data (sky_preetham.cpp:20-74).
"""

from __future__ import annotations

import dataclasses

import numpy as np

# Sun-disc cone test shared with the device path (kernel.cu:1263).
SUN_COS_CONE = 94.0 / np.sqrt(94.0 ** 2 + 0.45 ** 2)

# CIE spectral sensitivity curves, 380-750nm at 10nm
# (sky_preetham.cpp:20-49: wavelength, x̄, ȳ, z̄).
CIE_TABLE = np.array([
    [380., 0.0002, 0.0000, 0.0007], [390., 0.0024, 0.0003, 0.0105],
    [400., 0.0191, 0.0020, 0.0860], [410., 0.0847, 0.0088, 0.3894],
    [420., 0.2045, 0.0214, 0.9725], [430., 0.3147, 0.0387, 1.5535],
    [440., 0.3837, 0.0621, 1.9673], [450., 0.3707, 0.0895, 1.9948],
    [460., 0.3023, 0.1282, 1.7454], [470., 0.1956, 0.1852, 1.3176],
    [480., 0.0805, 0.2536, 0.7721], [490., 0.0162, 0.3391, 0.4153],
    [500., 0.0038, 0.4608, 0.2185], [510., 0.0375, 0.6067, 0.1120],
    [520., 0.1177, 0.7618, 0.0607], [530., 0.2365, 0.8752, 0.0305],
    [540., 0.3768, 0.9620, 0.0137], [550., 0.5298, 0.9918, 0.0040],
    [560., 0.7052, 0.9973, 0.0000], [570., 0.8787, 0.9556, 0.0000],
    [580., 1.0142, 0.8689, 0.0000], [590., 1.1185, 0.7774, 0.0000],
    [600., 1.1240, 0.6583, 0.0000], [610., 1.0305, 0.5280, 0.0000],
    [620., 0.8563, 0.3981, 0.0000], [630., 0.6475, 0.2835, 0.0000],
    [640., 0.4316, 0.1798, 0.0000], [650., 0.2683, 0.1076, 0.0000],
    [660., 0.1526, 0.0603, 0.0000], [670., 0.0813, 0.0318, 0.0000],
    [680., 0.0409, 0.0159, 0.0000], [690., 0.0199, 0.0077, 0.0000],
    [700., 0.0096, 0.0037, 0.0000], [710., 0.0046, 0.0018, 0.0000],
    [720., 0.0022, 0.0008, 0.0000], [730., 0.0010, 0.0004, 0.0000],
    [740., 0.0005, 0.0002, 0.0000], [750., 0.0003, 0.0001, 0.0000]])

# Preetham paper Table 2 (sky_preetham.cpp:51-74): wavelength (µm), solar
# spectral radiance, k_o (ozone), k_wa (water vapor); -1 = not applicable.
SUN_TABLE = np.array([
    [0.38, 1655.9, -1, -1], [0.39, 1623.37, -1, -1],
    [0.40, 2112.75, -1, -1], [0.41, 2588.82, -1, -1],
    [0.42, 2582.91, -1, -1], [0.43, 2423.23, -1, -1],
    [0.44, 2676.05, -1, -1], [0.45, 2965.83, 0.003, -1],
    [0.46, 3054.54, 0.006, -1], [0.47, 3005.75, 0.009, -1],
    [0.48, 3066.37, 0.014, -1], [0.49, 2883.04, 0.021, -1],
    [0.50, 2871.21, 0.030, -1], [0.51, 2782.50, 0.040, -1],
    [0.52, 2710.06, 0.048, -1], [0.53, 2723.36, 0.063, -1],
    [0.54, 2636.13, 0.075, -1], [0.55, 2550.38, 0.085, -1],
    [0.56, 2506.02, 0.103, -1], [0.57, 2531.16, 0.120, -1],
    [0.58, 2535.59, 0.120, -1], [0.59, 2513.42, 0.115, -1],
    [0.60, 2463.15, 0.125, -1], [0.61, 2417.32, 0.120, -1],
    [0.62, 2368.53, 0.105, -1], [0.63, 2321.21, 0.090, -1],
    [0.64, 2282.77, 0.079, -1], [0.65, 2233.98, 0.067, -1],
    [0.66, 2197.02, 0.057, -1], [0.67, 2152.67, 0.048, -1],
    [0.68, 2109.79, 0.036, -1], [0.69, 2072.83, 0.028, 0.028],
    [0.70, 2024.04, 0.023, 0.023], [0.71, 1987.08, 0.018, 0.018],
    [0.72, 1942.72, 0.014, 0.014], [0.73, 1907.24, 0.011, 0.011],
    [0.74, 1862.89, 0.010, 0.010], [0.75, 1825.92, 0.009, 0.009]])

_XYZ2RGB = np.array([
    [3.2410, -1.5374, -0.4986],
    [-0.9692, 1.8760, 0.0416],
    [0.0556, -0.2040, 1.0570]])


def _xyz_to_rgb(xyz: np.ndarray) -> np.ndarray:
    """sky_preetham.cpp:12-18 (note: different matrix from the Tungsten
    path's — reproduced as-is)."""
    return xyz @ _XYZ2RGB.T


def _yxy_to_xyz(yxy: np.ndarray) -> np.ndarray:
    """(Y, x, y) chromaticity → XYZ (sky_preetham.cpp:7-10)."""
    Y, x, y = yxy[..., 0], yxy[..., 1], yxy[..., 2]
    ratio = Y / y
    return np.stack([x * ratio, Y, (1.0 - x - y) * ratio], axis=-1)


def _absorption(m: float, lam: np.ndarray, turbidity: float,
                k_o: np.ndarray, k_wa: np.ndarray) -> np.ndarray:
    """Direct-sunlight attenuation per wavelength (µm)
    (sky_preetham.cpp:175-196): Rayleigh air, aerosol, ozone, water vapor."""
    alpha = 1.3
    beta = 0.04608 * turbidity - 0.04586
    ell = 0.35
    w = 2.0
    rayleigh = np.exp(-0.008735 * m * lam ** -4.08)
    aerosol = np.exp(-beta * m * lam ** -alpha)
    ozone = np.where(k_o > 0.0, np.exp(-np.maximum(k_o, 0.0) * ell * m), 1.0)
    kwm = np.maximum(k_wa, 0.0) * w * m
    water = np.where(k_wa > 0.0,
                     np.exp(-0.2385 * kwm / (1.0 + 20.07 * kwm) ** 0.45),
                     1.0)
    return rayleigh * aerosol * ozone * water


@dataclasses.dataclass
class PreethamSunSky:
    """Analytic Preetham model state (sky_preetham.h:31-138 defaults:
    turbidity 2, overcast 0, up = +Y)."""

    theta: float = np.pi        # sun zenith angle (m_sun_theta)
    phi: float = 0.0            # sun azimuth (m_sun_phi)
    turbidity: float = 2.0
    overcast: float = 0.0

    def set_sun_angles(self, phi: float, theta: float):
        self.phi = phi
        self.theta = theta

    def sun_dir(self) -> np.ndarray:
        """preprocess's ONB swizzle (sky_preetham.cpp:146-157): local
        (cosφ sinθ, sinφ sinθ, cosθ) → world (y, z, x), i.e. the same
        +Y-up convention as models.skydome.Skydome."""
        st = np.sin(self.theta)
        return np.array([np.sin(self.phi) * st, np.cos(self.theta),
                         np.cos(self.phi) * st])

    def _coefficients(self):
        """Perez coefficients + zenith color (sky_preetham.cpp:98-141)."""
        t = self.turbidity
        c0 = np.array([0.1787 * t - 1.4630, -0.0193 * t - 0.2592,
                       -0.0167 * t - 0.2608])
        c1 = np.array([-0.3554 * t + 0.4275, -0.0665 * t + 0.0008,
                       -0.0950 * t + 0.0092])
        c2 = np.array([-0.0227 * t + 5.3251, -0.0004 * t + 0.2125,
                       -0.0079 * t + 0.2102])
        c3 = np.array([0.1206 * t - 2.5771, -0.0641 * t - 0.8989,
                       -0.0441 * t - 1.6537])
        c4 = np.array([-0.0670 * t + 0.3703, -0.0033 * t + 0.0452,
                       -0.0109 * t + 0.0529])

        th = self.theta
        th2, th3 = th * th, th * th * th
        xi = (4.0 / 9.0 - t / 120.0) * (np.pi - 2.0 * th)
        zenith = np.array([
            # paper is in kilocandelas — convert to candelas
            ((4.0453 * t - 4.9710) * np.tan(xi) - 0.2155 * t + 2.4192)
            * 1000.0,
            t * t * (0.00166 * th3 - 0.00375 * th2 + 0.00209 * th)
            + t * (-0.02903 * th3 + 0.06377 * th2 - 0.03202 * th + 0.00394)
            + (0.11693 * th3 - 0.21196 * th2 + 0.06052 * th + 0.25886),
            t * t * (0.00275 * th3 - 0.00610 * th2 + 0.00317 * th)
            + t * (-0.04214 * th3 + 0.08970 * th2 - 0.04153 * th + 0.00516)
            + (0.15346 * th3 - 0.26756 * th2 + 0.06670 * th + 0.26688)])

        cos_th = np.cos(th)
        divisor = (1.0 + c0 * np.exp(c1)) * (
            1.0 + c2 * np.exp(c3 * th) + c4 * cos_th * cos_th)
        inv_divisor = zenith / divisor
        return c0, c1, c2, c3, c4, inv_divisor

    def sun_color(self) -> np.ndarray:
        """Direct sun radiance in kcd/m² (sky_preetham.cpp:198-227)."""
        th = self.theta
        cos_th = np.cos(th)
        m = 1.0 / (cos_th + 0.15 * (93.885 - np.degrees(th)) ** -1.253)
        lam = SUN_TABLE[:, 0]
        # 1/cm² → 1/m², µm → nm (sky_preetham.cpp:209-211)
        results = SUN_TABLE[:, 1] * 10000.0 / 1000.0
        results = results * _absorption(m, lam, self.turbidity,
                                        SUN_TABLE[:, 2], SUN_TABLE[:, 3])
        xyz = (results[:, None] * CIE_TABLE[:, 1:4] * 10.0).sum(axis=0)
        return _xyz_to_rgb(683.0 * xyz) / 1000.0

    def sky_color(self, directions: np.ndarray, cel: bool = False
                  ) -> np.ndarray:
        """Sky radiance in kcd/m² for unit directions (..., 3)
        (sky_preetham.cpp:229-275); ``cel`` shows the explicit sun disc."""
        d = np.asarray(directions, np.float64)
        sun = self.sun_dir()
        c0, c1, c2, c3, c4, inv_divisor = self._coefficients()

        # below-horizon directions are reflected about up=+Y
        # (sky_preetham.cpp:244-249)
        dir_dot_up = d[..., 1]
        ray = d.copy()
        ray[..., 1] = np.abs(ray[..., 1])
        with np.errstate(divide="ignore"):
            inv_dir_dot_up = 1.0 / np.abs(dir_dot_up)

        gamma = np.clip(ray @ sun, -1.0, 1.0)
        acos_gamma = np.arccos(gamma)
        yxy = ((1.0 + c0 * np.exp(c1 * inv_dir_dot_up[..., None]))
               * (1.0 + c2 * np.exp(c3 * acos_gamma[..., None])
                  + c4 * (gamma * gamma)[..., None])) * inv_divisor
        sunlit = _xyz_to_rgb(_yxy_to_xyz(yxy)) * 1.0e-3

        if cel:
            in_sun = d @ sun > SUN_COS_CONE
            sunlit = np.where(in_sun[..., None], self.sun_color(), sunlit)
        if self.overcast >= 1.0:
            sunlit = np.zeros_like(sunlit)

        # CIE standard overcast sky (sky_preetham.cpp:267-272)
        Y = 15.0
        over = ((1.0 + 2.0 * np.abs(d[..., 1])) / 3.0 * Y)[..., None]
        over = np.broadcast_to(over, sunlit.shape)
        return sunlit + (over - sunlit) * self.overcast
