"""Golden statistics regression test (SURVEY §4: golden-image RMSE at fixed
seed/spp).

Exact bitwise goldens are fragile across XLA versions, so the locked
quantities are per-channel image means and the mean heat at a fixed
(scene, seed, spp) — tight enough to catch estimator regressions (wrong
weights, draw-order bugs, lost contributions) while surviving compiler
rounding.  Regenerate with tests/test_golden.py --print after an
*intentional* estimator change.
"""

import numpy as np

from cuda_volpath_tpu.config import Param, RenderSettings
from cuda_volpath_tpu.render import camera as cammod
from cuda_volpath_tpu.render import film as filmmod
from cuda_volpath_tpu.render import integrator
from cuda_volpath_tpu import scenes

# Locked on 2026-08-16 (XLA-CPU, reference-parity RNG; defaults =
# decomposition tracking + BINARY Tr_spectral shadows).
GOLDEN_MEAN = np.array([0.34556392, 0.44381145, 0.59030646], np.float32)
GOLDEN_HEAT = 1.05078125


def _render_fixed():
    scene, cam, _ = scenes.gaussian_blob(16, Param(density=12.0, g=0.4))
    settings = RenderSettings(precompute_opacity=False, steps_per_launch=4)
    return integrator.render(scene, cam, settings, 8, 8, 16, pool=512)


def test_golden_stats():
    fm = _render_fixed()
    mean = np.asarray(filmmod.image(fm)).mean(axis=(0, 1))
    ht = float(np.asarray(filmmod.heat(fm)).mean())
    np.testing.assert_allclose(mean, GOLDEN_MEAN, rtol=2e-3,
                               err_msg="estimator mean drifted — if the "
                               "change is intentional, regenerate goldens")
    np.testing.assert_allclose(ht, GOLDEN_HEAT, rtol=2e-3)


if __name__ == "__main__":
    fm = _render_fixed()
    print("GOLDEN_MEAN =",
          repr(np.asarray(filmmod.image(fm)).mean(axis=(0, 1))))
    print("GOLDEN_HEAT =", float(np.asarray(filmmod.heat(fm)).mean()))
