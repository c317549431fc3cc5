"""Pallas intersection kernel vs the XLA path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from gnxraytracer_tpu.ops import intersect
from gnxraytracer_tpu.ops import pallas_intersect as pi


def scene_and_rays(n_tris=30, n_rays=500, seed=0):
    rs = np.random.RandomState(seed)
    tris = (rs.randn(n_tris, 1, 3) * 3 + rs.randn(n_tris, 3, 3) * 0.5).astype(np.float32)
    verts = tris.reshape(-1, 3)
    idx = np.arange(n_tris * 3).reshape(n_tris, 3).astype(np.int32)
    o = rs.randn(n_rays, 3).astype(np.float32) * 4
    d = rs.randn(n_rays, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return verts, idx, o, d


class TestPallasIntersect:
    def test_matches_reference_path(self):
        verts, idx, o, d = scene_and_rays()
        soa = pi.tri_soa_from_mesh(verts, idx)
        tm = jnp.full(len(o), 1e30, jnp.float32)
        h1 = pi.pallas_closest_hit(jnp.asarray(o), jnp.asarray(d), tm, soa,
                                   interpret=True)
        h2 = intersect.closest_triangle_hit(jnp.asarray(o), jnp.asarray(d), tm,
                                            jnp.asarray(verts), jnp.asarray(idx))
        np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
        both = np.asarray(h1.hit)
        np.testing.assert_allclose(np.asarray(h1.t)[both],
                                   np.asarray(h2.t)[both], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(h1.tri)[both],
                                      np.asarray(h2.tri)[both])

    def test_padding_lane_handling(self):
        # n not a multiple of BLOCK: padded lanes must not pollute results
        verts, idx, o, d = scene_and_rays(n_rays=77, seed=3)
        soa = pi.tri_soa_from_mesh(verts, idx)
        tm = jnp.full(77, 1e30, jnp.float32)
        h = pi.pallas_closest_hit(jnp.asarray(o), jnp.asarray(d), tm, soa,
                                  interpret=True)
        assert h.hit.shape == (77,)
        h2 = intersect.closest_triangle_hit(jnp.asarray(o), jnp.asarray(d), tm,
                                            jnp.asarray(verts), jnp.asarray(idx))
        np.testing.assert_array_equal(np.asarray(h.hit), np.asarray(h2.hit))

    def test_tmax_respected(self):
        verts, idx, o, d = scene_and_rays(seed=5)
        soa = pi.tri_soa_from_mesh(verts, idx)
        near = pi.pallas_closest_hit(jnp.asarray(o), jnp.asarray(d),
                                     jnp.full(len(o), 2.0, jnp.float32), soa,
                                     interpret=True)
        nt = np.asarray(near.t)[np.asarray(near.hit)]
        assert np.all(nt <= 2.0)
