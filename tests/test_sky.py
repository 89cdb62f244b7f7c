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


PREETHAM_REF = Path("/root/reference/src/sunsky")

# Minimal CUDA-free float3 shim so the reference's sky_preetham.cpp compiles
# with plain g++ as a ctypes oracle (its vecmath.h pulls in CUDA SDK types).
PREETHAM_SHIM = r"""
#pragma once
#include <cmath>
struct float3 { float x, y, z; };
inline float3 make_float3(float a) { return {a, a, a}; }
inline float3 make_float3(float x, float y, float z) { return {x, y, z}; }
inline float3 operator+(const float3&a,const float3&b){return {a.x+b.x,a.y+b.y,a.z+b.z};}
inline float3 operator-(const float3&a,const float3&b){return {a.x-b.x,a.y-b.y,a.z-b.z};}
inline float3 operator*(const float3&a,const float3&b){return {a.x*b.x,a.y*b.y,a.z*b.z};}
inline float3 operator*(const float3&a,float b){return {a.x*b,a.y*b,a.z*b};}
inline float3 operator*(float a,const float3&b){return {a*b.x,a*b.y,a*b.z};}
inline float3 operator/(const float3&a,const float3&b){return {a.x/b.x,a.y/b.y,a.z/b.z};}
inline float3 operator/(const float3&a,float b){return {a.x/b,a.y/b,a.z/b};}
inline float3 operator+(float a,const float3&b){return {a+b.x,a+b.y,a+b.z};}
inline float3 operator+(const float3&a,float b){return {a.x+b,a.y+b,a.z+b};}
inline float3 operator-(float a,const float3&b){return {a-b.x,a-b.y,a-b.z};}
inline float3 operator-(const float3&a,float b){return {a.x-b,a.y-b,a.z-b};}
inline float3 operator/(float a,const float3&b){return {a/b.x,a/b.y,a/b.z};}
inline float dot(const float3&a,const float3&b){return a.x*b.x+a.y*b.y+a.z*b.z;}
inline float3 lerp(const float3&a,const float3&b,float t){return a+(b-a)*t;}
inline float3 reflect(const float3&i,const float3&n){return i-n*(2.0f*dot(n,i));}
"""

PREETHAM_WRAPPER = r"""
#include "sky_preetham.cpp"
extern "C" {
void* preetham_create() { return new PreethamSunSky(); }
void preetham_set(void* p, float phi, float theta, float turb, float over) {
    auto* s = (PreethamSunSky*)p;
    s->setSunPhi(phi); s->setSunTheta(theta);
    s->setTurbidity(turb); s->setOvercast(over);
}
void preetham_sun_dir(void* p, float* out) {
    float3 d = ((PreethamSunSky*)p)->getSunDir();
    out[0]=d.x; out[1]=d.y; out[2]=d.z;
}
void preetham_sun_color(void* p, float* out) {
    float3 c = ((PreethamSunSky*)p)->sunColor();
    out[0]=c.x; out[1]=c.y; out[2]=c.z;
}
void preetham_sky_color(void* p, const float* d, int cel, float* out) {
    float3 c = ((PreethamSunSky*)p)->skyColor(
        make_float3(d[0], d[1], d[2]), cel != 0);
    out[0]=c.x; out[1]=c.y; out[2]=c.z;
}
}
"""


@pytest.fixture(scope="module")
def preetham_oracle():
    if not PREETHAM_REF.exists():
        pytest.skip("reference checkout not available")
    import shutil
    work = Path("/tmp/volpath_test_preetham")
    so = work / "oracle.so"
    if not so.exists():
        work.mkdir(exist_ok=True)
        # the reference sources #include "vecmath.h" relative to their own
        # directory, so they are staged next to the shim
        shutil.copy(PREETHAM_REF / "sky_preetham.cpp", work)
        shutil.copy(PREETHAM_REF / "sky_preetham.h", work)
        (work / "vecmath.h").write_text(PREETHAM_SHIM)
        (work / "wrapper.cpp").write_text(PREETHAM_WRAPPER)
        subprocess.run(["g++", "-O2", "-shared", "-fPIC",
                        str(work / "wrapper.cpp"), "-o", str(so)],
                       check=True, cwd=work)
    lib = ctypes.CDLL(str(so))
    lib.preetham_create.restype = ctypes.c_void_p
    lib.preetham_set.argtypes = [ctypes.c_void_p] + [ctypes.c_float] * 4
    fp = ctypes.POINTER(ctypes.c_float)
    lib.preetham_sun_dir.argtypes = [ctypes.c_void_p, fp]
    lib.preetham_sun_color.argtypes = [ctypes.c_void_p, fp]
    lib.preetham_sky_color.argtypes = [ctypes.c_void_p, fp,
                                       ctypes.c_int, fp]
    return lib


@pytest.mark.parametrize("phi,theta,turb,over", [
    (3.14, 0.3, 2.0, 0.0),
    (1.0, 0.9, 2.0, 0.0),
    (5.0, 1.2, 4.5, 0.0),
    (2.2, 0.5, 2.0, 0.4),
])
def test_preetham_matches_reference(preetham_oracle, phi, theta, turb, over):
    from cuda_volpath_tpu.models.sky_preetham import PreethamSunSky

    lib = preetham_oracle
    p = ctypes.c_void_p(lib.preetham_create())
    lib.preetham_set(p, phi, theta, turb, over)
    sky = PreethamSunSky(turbidity=turb, overcast=over)
    sky.set_sun_angles(phi, theta)

    buf = (ctypes.c_float * 3)()
    lib.preetham_sun_dir(p, buf)
    np.testing.assert_allclose(sky.sun_dir(), np.asarray(buf[:]),
                               rtol=1e-5, atol=1e-6)
    lib.preetham_sun_color(p, buf)
    np.testing.assert_allclose(sky.sun_color(), np.asarray(buf[:]),
                               rtol=2e-4, atol=1e-5)

    r = np.random.default_rng(11)
    dirs = r.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    mine = sky.sky_color(dirs, cel=True)
    for i, d in enumerate(dirs):
        dv = (ctypes.c_float * 3)(*d.astype(np.float32))
        lib.preetham_sky_color(p, dv, 1, buf)
        np.testing.assert_allclose(
            mine[i], np.asarray(buf[:]), rtol=2e-3, atol=2e-4,
            err_msg=f"dir {d}")


def test_preetham_in_sunsky_facade():
    """PreethamSunSky drops into the bake facade like the reference's
    SkyModel<PreethamSunSky> alternative (sunsky.h:6-25)."""
    from cuda_volpath_tpu.models.sky_preetham import PreethamSunSky

    img, sun_dir, sun_power = sunsky.bake(0.5, 0.2, sky=PreethamSunSky())
    assert img.shape == (512, 1024, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all() or img.min() > -1e-3  # XYZ→RGB can clip slightly
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
