"""Multi-host helpers: range splitting and slab/sample-mode rendering
(single-process semantics; real multi-host differs only in process ids)."""

import numpy as np

from gnxraytracer_tpu.models.integrators import path
from gnxraytracer_tpu.ops import samplers
from gnxraytracer_tpu.parallel import multihost
from gnxraytracer_tpu.scene import presets


class TestRanges:
    def test_sample_split_covers_all(self):
        spans = [multihost.sample_range_for_host(100, pid, 8) for pid in range(8)]
        covered = []
        for start, count in spans:
            covered.extend(range(start, start + count))
        assert sorted(covered) == list(range(100))

    def test_row_split_covers_all(self):
        spans = [multihost.row_range_for_host(37, pid, 4) for pid in range(4)]
        covered = []
        for start, count in spans:
            covered.extend(range(start, start + count))
        assert sorted(covered) == list(range(37))

    def test_init_is_noop_single_host(self):
        multihost.init()  # must not block or raise without a coordinator


class TestSlabRender:
    def test_row_slab_matches_full_render(self):
        scene, cam = presets.cornell_box(width=8, height=8)
        cfg = path.make_config(scene, 8, 8, spp=4, max_depth=2, spp_chunk=4)
        s = samplers.make_sobol_sampler(4)
        slab, rows = multihost.render_multihost(scene, cam, s, cfg, mode="rows")
        full = np.asarray(path.render(scene, cam, s, cfg))
        assert slab.shape == (rows, 8, 3)
        np.testing.assert_allclose(slab, full[:rows], atol=1e-5)
