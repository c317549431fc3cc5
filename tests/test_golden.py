"""Golden-image regression tests (SURVEY.md §4 item 2): fixed sampler
streams, low-res renders compared against committed fixtures.  Guards
against silent estimator/sampler/geometry regressions between rounds."""

import os

import numpy as np
import pytest

from gnxraytracer_tpu.models.integrators import path, volpath, whitted
from gnxraytracer_tpu.ops import samplers
from gnxraytracer_tpu.scene import presets

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def check(name, img, rtol=2e-3, atol=2e-4):
    # Regenerate fixtures after a deliberate estimator change with:
    #   GOLDEN_REGEN=1 pytest tests/test_golden.py
    # (then re-run tests/test_reference_parity.py — the oracle goldens are
    # the ground truth that guards against regenerating in a broken state).
    path_ = os.path.join(GOLDEN, name)
    if os.environ.get("GOLDEN_REGEN"):
        np.save(path_, img)
        return
    ref = np.load(path_)
    np.testing.assert_allclose(img, ref, rtol=rtol, atol=atol,
                               err_msg=f"golden drift: {name}")


class TestGolden:
    def test_cornell_path_sobol(self):
        scene, cam = presets.cornell_box(width=32, height=32)
        cfg = path.make_config(scene, 32, 32, spp=16, max_depth=5, spp_chunk=16)
        s = samplers.make_sobol_sampler(16)
        check("cornell_path_sobol_32.npy",
              np.asarray(path.render(scene, cam, s, cfg)))

    def test_cornell_whitted_halton(self):
        scene, cam = presets.cornell_box(width=32, height=32)
        cfg = path.make_config(scene, 32, 32, spp=8, max_depth=5, spp_chunk=8)
        s = samplers.make_halton_sampler(8, 32, 32)
        check("cornell_whitted_halton_32.npy",
              np.asarray(whitted.render(scene, cam, s, cfg)))

    def test_volpath(self):
        scene, cam = presets.volumetric_cornell(24, 24,
                                                use_reference_volume=False)
        cfg = path.make_config(scene, 24, 24, spp=8, max_depth=6, spp_chunk=8)
        s = samplers.make_random_sampler(8, seed=5)
        check("volpath_24.npy", np.asarray(volpath.render(scene, cam, s, cfg)))
