"""Ray differentials + EWA filtering tests (reference core/Camera.cpp
GenerateRayDifferential, core/Interaction.cpp:65-114, core/MIPMap.h:259)."""

import numpy as np

import jax.numpy as jnp

from gnxraytracer_tpu.ops import texture as tex
from gnxraytracer_tpu.ops import trace
from gnxraytracer_tpu.scene import camera as cam


def _camera(w=64, h=64):
    return cam.make_perspective_camera(w, h, eye=(0, 0, 5), look=(0, 0, 0))


class TestRayDifferentials:
    def test_rx_matches_one_pixel_offset(self):
        c = _camera()
        pf = jnp.asarray([[10.5, 20.5], [32.0, 32.0]], jnp.float32)
        t_u = jnp.zeros((2,))
        l_u = jnp.zeros((2, 2))
        o, d, t, rd = cam.generate_ray_differentials(c, pf, t_u, l_u)
        o1, d1, _ = cam.generate_rays(c, pf + jnp.asarray([1.0, 0.0]), t_u, l_u)
        np.testing.assert_allclose(np.asarray(rd.rx_d), np.asarray(d1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rd.rx_o), np.asarray(o1), atol=1e-6)

    def test_scale_differentials(self):
        c = _camera()
        pf = jnp.asarray([[10.0, 10.0]], jnp.float32)
        o, d, t, rd = cam.generate_ray_differentials(c, pf, jnp.zeros((1,)),
                                                     jnp.zeros((1, 2)))
        rd2 = cam.scale_differentials(o, d, rd, 0.5)
        np.testing.assert_allclose(
            np.asarray(rd2.rx_d - d), 0.5 * np.asarray(rd.rx_d - d), atol=1e-7
        )

    def test_compute_differentials_analytic_plane(self):
        """Orthogonal rays onto the z=0 plane with unit uv chart: the uv
        footprint equals the ray offset."""
        n_l = 4
        p = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (n_l, 3)),
                        jnp.float32) * jnp.asarray([1.0, 1.0, 0.0])
        n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n_l, 3))
        dpdu = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n_l, 3))
        dpdv = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n_l, 3))
        delta = 0.01
        rd = cam.RayDifferentials(
            rx_o=p + jnp.asarray([delta, 0.0, 1.0]),
            rx_d=jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n_l, 3)),
            ry_o=p + jnp.asarray([0.0, delta, 1.0]),
            ry_d=jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n_l, 3)),
        )
        duvdx, duvdy = trace.compute_differentials(p, n, dpdu, dpdv, rd)
        np.testing.assert_allclose(np.asarray(duvdx), [[delta, 0.0]] * n_l,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(duvdy), [[0.0, delta]] * n_l,
                                   atol=1e-6)

    def test_parallel_aux_ray_zeroes(self):
        """Auxiliary ray parallel to the plane -> differentials zeroed
        (the reference's isinf/goto-fail path)."""
        p = jnp.zeros((1, 3))
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        dpdu = jnp.asarray([[1.0, 0.0, 0.0]])
        dpdv = jnp.asarray([[0.0, 1.0, 0.0]])
        rd = cam.RayDifferentials(
            rx_o=jnp.asarray([[0.1, 0.0, 1.0]]),
            rx_d=jnp.asarray([[1.0, 0.0, 0.0]]),  # parallel to plane
            ry_o=jnp.asarray([[0.0, 0.1, 1.0]]),
            ry_d=jnp.asarray([[0.0, 0.0, -1.0]]),
        )
        duvdx, duvdy = trace.compute_differentials(p, n, dpdu, dpdv, rd)
        np.testing.assert_allclose(np.asarray(duvdx), 0.0, atol=1e-6)
        assert abs(float(duvdy[0, 1]) - 0.1) < 1e-5

    def test_triangle_dpduv_unit_chart(self):
        """Default UV chart (0,0),(1,0),(1,1): dpdu/dpdv span the edges."""
        from gnxraytracer_tpu.models.integrators import path
        from gnxraytracer_tpu.scene import presets

        scene, _ = presets.cornell_box(width=8, height=8)
        cfg = path.make_config(scene, 8, 8, spp=1)
        o = jnp.asarray([[0.0, 0.0, 0.0]])
        d = jnp.asarray([[0.0, -1.0, 0.0]])
        h = trace.scene_intersect(scene, cfg, o, d, jnp.full((1,), 1e9))
        dpdu, dpdv = trace.triangle_dpduv(scene, h)
        dpdu, dpdv = np.asarray(dpdu), np.asarray(dpdv)
        assert np.isfinite(dpdu).all() and np.isfinite(dpdv).all()
        assert np.linalg.norm(dpdu) > 0 and np.linalg.norm(dpdv) > 0


class TestEWA:
    def _atlas(self, base=32):
        # horizontal gradient texture
        img = np.linspace(0, 1, base)[None, :, None] * np.ones((base, 1, 3))
        return tex.build_texture_atlas([img], base_size=base)

    def test_constant_region_exact(self):
        atlas, offs, sizes = tex.build_texture_atlas(
            [np.full((32, 32, 3), 0.7)], base_size=32
        )
        uv = jnp.asarray([[0.5, 0.5], [0.2, 0.8]])
        tid = jnp.zeros((2,), jnp.int32)
        d0 = jnp.full((2, 2), 0.02)
        d1 = jnp.asarray([[0.01, -0.01], [0.0, 0.02]])
        out = np.asarray(tex.ewa_lookup(atlas, offs, sizes, tid, uv, d0, d1,
                                        window=6))
        np.testing.assert_allclose(out, 0.7, atol=1e-3)

    def test_isotropic_matches_bilinear_scale(self):
        atlas, offs, sizes = self._atlas()
        uv = jnp.asarray([[0.5, 0.5]])
        tid = jnp.zeros((1,), jnp.int32)
        tiny = jnp.asarray([[1.0 / 64, 0.0]])
        tiny2 = jnp.asarray([[0.0, 1.0 / 64]])
        ewa = np.asarray(tex.ewa_lookup(atlas, offs, sizes, tid, uv, tiny,
                                        tiny2, window=6))
        bil = np.asarray(tex.bilinear_lookup(atlas, offs, sizes, tid, uv, 0))
        np.testing.assert_allclose(ewa, bil, atol=0.06)

    def test_anisotropic_footprint_averages_gradient(self):
        """A footprint long along the gradient axis averages toward the
        mid value; long across it stays near the point sample."""
        atlas, offs, sizes = self._atlas()
        uv = jnp.asarray([[0.25, 0.5]])
        tid = jnp.zeros((1,), jnp.int32)
        along = np.asarray(tex.ewa_lookup(
            atlas, offs, sizes, tid, uv,
            jnp.asarray([[0.2, 0.0]]), jnp.asarray([[0.0, 0.01]]), window=8,
        ))[0, 0]
        across = np.asarray(tex.ewa_lookup(
            atlas, offs, sizes, tid, uv,
            jnp.asarray([[0.0, 0.2]]), jnp.asarray([[0.01, 0.0]]), window=8,
        ))[0, 0]
        # gradient at u=0.25 is 0.25; the along-footprint should blur more
        assert abs(across - 0.25) < 0.08
        assert np.isfinite(along)

    def test_eccentricity_clamp_finite(self):
        atlas, offs, sizes = self._atlas()
        uv = jnp.asarray([[0.5, 0.5]])
        tid = jnp.zeros((1,), jnp.int32)
        out = np.asarray(tex.ewa_lookup(
            atlas, offs, sizes, tid, uv,
            jnp.asarray([[0.5, 0.0]]), jnp.asarray([[0.0, 1e-5]]), window=8,
        ))
        assert np.isfinite(out).all()
