"""Sky model validation.

When the reference checkout is present, its Hosek implementation is compiled
(in /tmp, from the read-only mount) as a ctypes oracle and compared to the
from-scratch numpy implementation; otherwise those tests skip and the
remaining sanity tests still pin down behavior.
"""

import ctypes
import subprocess
from pathlib import Path

import numpy as np
import pytest

from cuda_volpath_tpu.models import hosek
from cuda_volpath_tpu.models.skydome import Skydome, spectral_xyz_weights
from cuda_volpath_tpu.lighting import sunsky

REF = Path("/root/reference/src/sunsky/hosek")

WRAPPER = r"""
#include "ArHosekSkyModel.cpp"
extern "C" {
void* oracle_alien_init(double e, double i, double t, double tu, double a) {
    return arhosekskymodelstate_alienworld_alloc_init(e, i, t, tu, a);
}
double oracle_radiance(void* s, double th, double g, double wl) {
    return arhosekskymodel_radiance((ArHosekSkyModelState*)s, th, g, wl);
}
double oracle_solar(void* s, double th, double g, double wl) {
    return arhosekskymodel_solar_radiance((ArHosekSkyModelState*)s, th, g, wl);
}
double oracle_solar_radius(void* s) {
    return ((ArHosekSkyModelState*)s)->solar_radius;
}
}
"""


@pytest.fixture(scope="module")
def oracle():
    if not REF.exists():
        pytest.skip("reference checkout not available")
    so = Path("/tmp/volpath_test_hosek_oracle.so")
    if not so.exists():
        src = Path("/tmp/volpath_test_hosek_oracle.cpp")
        src.write_text(WRAPPER)
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", f"-I{REF}",
                        str(src), "-o", str(so)], check=True)
    lib = ctypes.CDLL(str(so))
    lib.oracle_alien_init.restype = ctypes.c_void_p
    lib.oracle_alien_init.argtypes = [ctypes.c_double] * 5
    for f in (lib.oracle_radiance, lib.oracle_solar):
        f.restype = ctypes.c_double
        f.argtypes = [ctypes.c_void_p] + [ctypes.c_double] * 3
    lib.oracle_solar_radius.restype = ctypes.c_double
    lib.oracle_solar_radius.argtypes = [ctypes.c_void_p]
    return lib


@pytest.mark.parametrize("elev,turb", [(0.95, 2.0), (0.1, 2.0), (1.3, 5.5)])
def test_hosek_matches_reference(oracle, elev, turb):
    args = (elev, 100.0, 5777.0, turb, 0.2)
    st_c = oracle.oracle_alien_init(*args)
    st_py = hosek.alienworld_alloc_init(*args)
    np.testing.assert_allclose(oracle.oracle_solar_radius(st_c),
                               st_py.solar_radius, rtol=1e-12)
    r = np.random.default_rng(7)
    for _ in range(50):
        theta = r.uniform(0, np.pi / 2 * 0.999)
        gamma = r.uniform(0, np.pi)
        wl = r.uniform(320, 720)
        c = oracle.oracle_radiance(st_c, theta, gamma, wl)
        p = float(hosek.radiance(st_py, theta, gamma, wl))
        np.testing.assert_allclose(p, c, rtol=1e-10, atol=1e-14)
    for _ in range(50):
        theta = r.uniform(0, np.pi / 2 * 0.999)
        gamma = r.uniform(0, 0.01)
        wl = r.uniform(321, 719)
        c = oracle.oracle_solar(st_c, theta, gamma, wl)
        p = float(hosek.solar_radiance(st_py, theta, gamma, wl))
        np.testing.assert_allclose(p, c, rtol=1e-10, atol=1e-14)


def test_spectral_weights():
    lambdas, weights = spectral_xyz_weights()
    assert lambdas[0] == 360.0 and abs(lambdas[-1] - 830.0) < 1e-9
    # Y weights integrate luminance: sum approximately 1 (trapezoid norm)
    assert abs(weights[:, 1].sum() - 1.0) < 0.01
    assert (weights >= 0).all()


def test_skydome_basic_properties():
    sky = Skydome()
    sky.set_sun_angles(np.pi, 0.1 * np.pi)  # default scene sun (x=.5, y=.2)
    sun = sky.sun_dir()
    np.testing.assert_allclose(np.linalg.norm(sun), 1.0, rtol=1e-9)
    assert sun[1] > 0.9  # high sun

    # sky color: positive-ish, brighter near the sun than opposite
    d_sun = sun
    d_opp = np.array([-sun[0], sun[1], -sun[2]])
    d_opp /= np.linalg.norm(d_opp)
    c_near = sky.sky_color(d_sun[None])[0]
    c_opp = sky.sky_color(d_opp[None])[0]
    assert c_near[1] > c_opp[1] > 0
    # solar disc massively brighter than sky
    assert sky.sun_color()[1] > 100 * c_near[1]


def test_sunsky_bake():
    img, sun_dir, sun_power = sunsky.bake(0.5, 0.2, width=128, height=64)
    assert img.shape == (64, 128, 3)
    assert np.isfinite(img).all()
    # ground rows constant
    assert np.allclose(img[40], img[50])
    # sky brighter than ground reflection
    assert img[:32].mean() > img[32:].mean()
    np.testing.assert_allclose(np.linalg.norm(sun_dir), 1.0, rtol=1e-6)
    assert (sun_power > 0).all()


def test_bake_direction_convention_matches_uv_to_dir():
    """The bake's pixel→direction map must match Envmap::uv_to_dir so that
    eval_dir fetches the right texel (volumeRender.cpp:308 comment)."""
    import jax.numpy as jnp
    from cuda_volpath_tpu.lighting import envmap as envmod
    h, w = 64, 128
    img, _, _ = sunsky.bake(0.3, 0.25, width=w, height=h)
    # pick a few upper-hemisphere texels, convert their uv to a direction,
    # evaluate: must return the same texel.
    for (j, i) in [(5, 7), (20, 100), (30, 64)]:
        u, v = (i) / w, (j) / h
        d = envmod.uv_to_dir(jnp.float32(u + 0.5 / w), jnp.float32(v + 0.5 / h))
        got = np.asarray(envmod.eval_dir(jnp.asarray(img), d[None]))[0]
        np.testing.assert_allclose(got, img[j, i], rtol=1e-4)
