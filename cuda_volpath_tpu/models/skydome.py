"""Spectral skydome: Hosek-Wilkie sky integrated to RGB through the CIE
observer.

Re-implementation of the Tungsten-style facade the reference uses
(src/sunsky/sky_tungsten.cpp:433-504 ``Skydome`` + the Spectral namespace
:377-431): an alien-world Hosek state at 10 spectral samples over
360-830nm (only the first 7 fall inside the model's 320-720nm support),
integrated against re-binned CIE XYZ weights and converted to linear sRGB.

All evaluation is vectorized numpy over arbitrarily many directions — the
whole 1024×512 sky bake is a single call.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import hosek

NUM_SAMPLES = 10
NUM_SAMPLES_VALID = 7
CIE_MIN, CIE_MAX, CIE_SAMPLES = 360.0, 830.0, 471

XYZ_TO_RGB = np.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311]])

# Sun-disc cone test shared with the device path (kernel.cu:1263).
SUN_COS_CONE = 94.0 / np.sqrt(94.0 ** 2 + 0.45 ** 2)


def xyz_to_rgb(xyz: np.ndarray) -> np.ndarray:
    return xyz @ XYZ_TO_RGB.T


def spectral_xyz_weights(samples: int = NUM_SAMPLES):
    """Re-bin the 1nm CIE curves into ``samples`` buckets, normalized by the
    trapezoid integral of Y (sky_tungsten.cpp:407-429)."""
    cie = hosek._data()["cie_xyz"]  # (471, 3)
    delta = (CIE_MAX - CIE_MIN) / (samples - 1)
    lambdas = CIE_MIN + np.arange(samples) * delta
    weights = np.zeros((samples, 3))
    for i in range(CIE_SAMPLES):
        x = int(i / delta)
        u = i / delta - x
        weights[x] += (1.0 - u) * cie[i]
        if x + 1 < samples:  # the reference overruns here for i == 470
            weights[x + 1] += u * cie[i]
    ref = 0.5 * (cie[:-1, 1] + cie[1:, 1]).sum()
    return lambdas, weights / ref


@dataclasses.dataclass
class Skydome:
    """Sun/sky state (sky_tungsten.cpp:433-466 defaults: T=5777K sun,
    turbidity 2, intensity 100, ground albedo 0.2)."""

    temperature: float = 5777.0
    gamma_scale: float = 1.0
    turbidity: float = 2.0
    intensity: float = 100.0
    theta: float = 0.0
    phi: float = 0.0
    _state: hosek.SkyState | None = None
    _lambdas: np.ndarray | None = None
    _weights: np.ndarray | None = None

    def set_sun_angles(self, phi: float, theta: float):
        self.phi = phi
        self.theta = theta
        self._state = None

    def sun_dir(self) -> np.ndarray:
        st = np.sin(self.theta)
        return np.array([np.sin(self.phi) * st, np.cos(self.theta),
                         np.cos(self.phi) * st])

    def _prepare(self):
        if self._lambdas is None:
            self._lambdas, self._weights = spectral_xyz_weights()
        if self._state is None:
            sun = self.sun_dir()
            elevation = np.arcsin(np.clip(sun[1], -1.0, 1.0))
            self._state = hosek.alienworld_alloc_init(
                elevation, self.intensity, self.temperature, self.turbidity,
                0.2)
        return self._state

    def sky_color(self, directions: np.ndarray, cel: bool = False) -> np.ndarray:
        """RGB radiance for unit directions (..., 3)
        (sky_tungsten.cpp:468-485)."""
        st = self._prepare()
        sun = self.sun_dir()
        d = np.asarray(directions, np.float64)
        theta = np.arccos(np.clip(d[..., 1], -1.0, 1.0))
        cosg = np.clip(d @ sun, -1.0, 1.0)
        gamma = np.clip(np.arccos(cosg) * self.gamma_scale, 0.0, np.pi)

        xyz = np.zeros(d.shape[:-1] + (3,))
        for i in range(NUM_SAMPLES_VALID):
            r = hosek.radiance(st, theta, gamma, self._lambdas[i])
            xyz += self._weights[i] * r[..., None]
        rgb = xyz_to_rgb(xyz)
        if cel:
            in_sun = d @ sun > SUN_COS_CONE
            rgb = np.where(in_sun[..., None], self.sun_color(), rgb)
        return rgb

    def sun_color(self) -> np.ndarray:
        """RGB radiance of the solar disc center × intensity
        (sky_tungsten.cpp:487-502)."""
        st = self._prepare()
        theta = np.arccos(np.clip(self.sun_dir()[1], -1.0, 1.0))
        xyz = np.zeros(3)
        for i in range(NUM_SAMPLES_VALID):
            r = hosek.solar_radiance(st, np.asarray(theta), np.asarray(0.0),
                                     self._lambdas[i])
            xyz += self._weights[i] * r
        return xyz_to_rgb(xyz) * self.intensity
