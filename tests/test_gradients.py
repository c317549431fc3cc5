"""Differentiable-rendering tests: finite-difference vs AD gradients of
the pixel loss w.r.t. scene parameters (SURVEY.md §4 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnxraytracer_tpu.models.integrators import path
from gnxraytracer_tpu.ops import samplers
from gnxraytracer_tpu.parallel import sharding
from gnxraytracer_tpu.scene import presets


@pytest.fixture(scope="module")
def setup():
    scene, cam = presets.cornell_box(width=16, height=16)
    cfg = path.make_config(scene, 16, 16, spp=32, max_depth=3, spp_chunk=32)
    s = samplers.make_halton_sampler(32, 16, 16)
    return scene, cam, cfg, s


def render_with(scene, cam, cfg, s):
    img = path.render_chunk(scene, cam, s, cfg, 0, cfg.spp_chunk)
    return img / cfg.spp_chunk


class TestGradients:
    def test_grad_wrt_kd_matches_fd(self, setup):
        scene, cam, cfg, s = setup

        def loss(kd):
            sc = scene._replace(materials=scene.materials._replace(kd=kd))
            return jnp.mean(render_with(sc, cam, cfg, s))

        kd0 = scene.materials.kd
        g = jax.grad(loss)(kd0)
        assert np.isfinite(np.asarray(g)).all()
        # FD on the white-wall red channel (material 0)
        eps = 1e-2
        e = jnp.zeros_like(kd0).at[0, 0].set(eps)
        fd = (loss(kd0 + e) - loss(kd0 - e)) / (2 * eps)
        ad = g[0, 0]
        # same sampler stream -> FD is exact up to float noise & nonlinearity
        np.testing.assert_allclose(float(ad), float(fd), rtol=0.08, atol=1e-5)
        assert float(ad) > 0  # brighter wall -> brighter image

    def test_grad_wrt_light_emission(self, setup):
        scene, cam, cfg, s = setup

        def loss(emit):
            sc = scene._replace(lights=scene.lights._replace(emit=emit))
            return jnp.mean(render_with(sc, cam, cfg, s))

        e0 = scene.lights.emit
        g = jax.grad(loss)(e0)
        assert np.isfinite(np.asarray(g)).all()
        # emission enters linearly: FD should match tightly
        eps = 1e-2
        de = jnp.zeros_like(e0).at[0, 1].set(eps)
        fd = (loss(e0 + de) - loss(e0 - de)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, 1]), float(fd), rtol=2e-2)
        assert float(g[0, 1]) > 0

    def test_grad_wrt_sigma_finite(self, setup):
        scene, cam, cfg, s = setup

        def loss(sigma):
            sc = scene._replace(materials=scene.materials._replace(sigma=sigma))
            return jnp.mean(render_with(sc, cam, cfg, s))

        g = jax.grad(loss)(scene.materials.sigma)
        assert np.isfinite(np.asarray(g)).all()

    def test_train_step_reduces_loss(self, setup):
        """One inverse-rendering step on kd moves the loss down."""
        scene, cam, cfg, s = setup
        target = np.asarray(render_with(scene, cam, cfg, s))
        # perturb kd away from truth, then take gradient steps back
        mats = scene.materials
        kd_wrong = jnp.clip(mats.kd + 0.2, 0.0, 1.0)
        sc = scene._replace(materials=mats._replace(kd=kd_wrong))

        def loss(kd):
            s2 = scene._replace(materials=mats._replace(kd=kd))
            img = render_with(s2, cam, cfg, s)
            return jnp.mean((img - target) ** 2)

        l0 = float(loss(kd_wrong))
        g = jax.grad(loss)(kd_wrong)
        kd_new = kd_wrong - 2.0 * g
        l1 = float(loss(kd_new))
        assert l1 < l0, (l0, l1)


class TestShardedTrainStep:
    def test_8device_step_matches_1device(self):
        """Sharded (8 virtual devices) training step == single-device step."""
        scene, cam = presets.cornell_box(width=8, height=8)
        cfg = path.make_config(scene, 8, 8, spp=4, max_depth=2, spp_chunk=4)
        s = samplers.make_halton_sampler(4, 8, 8)
        params = sharding.extract_params(scene)
        target = jnp.zeros((8, 8, 3))
        mesh8 = sharding.make_mesh(8)
        mesh1 = sharding.make_mesh(1)
        step8 = sharding.make_train_step(cfg, mesh8)
        step1 = sharding.make_train_step(cfg, mesh1)
        l8, p8 = step8(params, scene, cam, s, target)
        l1, p1 = step1(params, scene, cam, s, target)
        np.testing.assert_allclose(float(l8), float(l1), rtol=1e-5)
        for k in params:
            np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(p1[k]),
                                       rtol=1e-4, atol=1e-6)
