"""Instancing tests: instanced intersection must match the same geometry
explicitly flattened into world space (TransformedPrimitive semantics,
reference core/Primitive.cpp:80-101)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gnxraytracer_tpu.ops import instancing as inst
from gnxraytracer_tpu.ops import intersect


def _unit_quad():
    """Two triangles spanning [0,1]^2 in the z=0 plane."""
    v = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    t = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, t


def _mats():
    def translate(x, y, z):
        m = np.eye(4)
        m[:3, 3] = [x, y, z]
        return m

    def rot_x(a):
        c, s = np.cos(a), np.sin(a)
        m = np.eye(4)
        m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
        return m

    def scale(s):
        return np.diag([s, s, s, 1.0])

    return [
        translate(0, 0, -1.0),
        translate(2.5, 0, -2.0) @ rot_x(0.3),
        translate(-2.0, 0.5, -3.0) @ scale(2.0),
    ]


def _flatten(v, t, mats):
    """Explicitly transformed copies — the ground truth scene."""
    vs, ts = [], []
    off = 0
    for m in mats:
        vw = v @ m[:3, :3].T + m[:3, 3]
        vs.append(vw.astype(np.float32))
        ts.append(t + off)
        off += len(v)
    return np.concatenate(vs), np.concatenate(ts)


class TestInstancedIntersect:
    def setup_method(self):
        self.v, self.t = _unit_quad()
        self.mats = _mats()
        self.table = inst.make_instances(self.mats)
        self.fv, self.ft = _flatten(self.v, self.t, self.mats)
        rng = np.random.default_rng(0)
        n = 512
        self.o = jnp.asarray(
            rng.uniform(-1, 3, (n, 3)) * [1, 1, 0] + [0, 0, 2.0], jnp.float32
        )
        tgt = rng.uniform(-2, 3, (n, 3)) * [1, 1, 0] + [0.3, 0.3, -2.5]
        d = tgt - np.asarray(self.o)
        self.d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                             jnp.float32)
        self.tmax = jnp.full((n,), 1e9, jnp.float32)

    def test_matches_flattened_scene(self):
        hi = inst.instanced_closest_hit(
            jnp.asarray(self.v), jnp.asarray(self.t), self.table,
            self.o, self.d, self.tmax,
        )
        hf = intersect.closest_triangle_hit(
            self.o, self.d, self.tmax, jnp.asarray(self.fv), jnp.asarray(self.ft)
        )
        np.testing.assert_array_equal(np.asarray(hi.hit), np.asarray(hf.hit))
        m = np.asarray(hf.hit)
        np.testing.assert_allclose(
            np.asarray(hi.t)[m], np.asarray(hf.t)[m], rtol=2e-4, atol=1e-4
        )
        # instance id consistent with flattened triangle id
        want_inst = np.asarray(hf.tri)[m] // 2
        np.testing.assert_array_equal(np.asarray(hi.inst)[m], want_inst)

    def test_any_hit_matches(self):
        occ_i = inst.instanced_any_hit(
            jnp.asarray(self.v), jnp.asarray(self.t), self.table,
            self.o, self.d, self.tmax,
        )
        occ_f = intersect.any_triangle_hit(
            self.o, self.d, self.tmax, jnp.asarray(self.fv), jnp.asarray(self.ft)
        )
        np.testing.assert_array_equal(np.asarray(occ_i), np.asarray(occ_f))

    def test_world_geometry_transform_back(self):
        hi = inst.instanced_closest_hit(
            jnp.asarray(self.v), jnp.asarray(self.t), self.table,
            self.o, self.d, self.tmax,
        )
        p_w, ng_w = inst.instance_hit_geometry(
            jnp.asarray(self.v), jnp.asarray(self.t), self.table, hi
        )
        m = np.asarray(hi.hit)
        # hit point lies on the ray at parameter t
        want = np.asarray(self.o) + np.asarray(hi.t)[:, None] * np.asarray(self.d)
        np.testing.assert_allclose(np.asarray(p_w)[m], want[m], atol=2e-3)
        # normals unit and orthogonal to the instanced plane
        nw = np.asarray(ng_w)[m]
        np.testing.assert_allclose(np.linalg.norm(nw, axis=-1), 1.0, atol=1e-5)
        # instance 0 is an untransformed-orientation quad -> normal ±z
        i0 = np.asarray(hi.inst)[m] == 0
        if i0.any():
            np.testing.assert_allclose(np.abs(nw[i0][:, 2]), 1.0, atol=1e-5)

    def test_animated_instances_interpolate(self):
        m0 = [np.eye(4)]
        m1 = [np.eye(4)]
        m1[0][0, 3] = 2.0  # slides +2 in x over the shutter
        at = inst.make_animated_instances(m0, m1)
        n = 3
        o = jnp.asarray([[0.5, 0.5, 1.0], [1.5, 0.5, 1.0], [2.5, 0.5, 1.0]],
                        jnp.float32)
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))
        tmax = jnp.full((n,), 1e9)
        # at time 0 only the first ray hits; at time 1 the quad moved +2
        h0 = inst.instanced_closest_hit(jnp.asarray(self.v), jnp.asarray(self.t),
                                        at, o, d, tmax, time=jnp.zeros((n,)))
        h1 = inst.instanced_closest_hit(jnp.asarray(self.v), jnp.asarray(self.t),
                                        at, o, d, tmax, time=jnp.ones((n,)))
        assert list(np.asarray(h0.hit)) == [True, False, False]
        assert list(np.asarray(h1.hit)) == [False, False, True]
        # mid-shutter: quad spans x in [1, 2]
        hm = inst.instanced_closest_hit(jnp.asarray(self.v), jnp.asarray(self.t),
                                        at, o, d, tmax,
                                        time=jnp.full((n,), 0.5))
        assert list(np.asarray(hm.hit)) == [False, True, False]


class TestInstancedRender:
    """VERDICT r1 item 5: instancing must be reachable from SceneBuilder and
    render identically to the flattened equivalent through the full path
    integrator (image-level lift of the op tests above)."""

    def _render(self, flatten, w=48, h=48, spp=8):
        from gnxraytracer_tpu.models.integrators import path
        from gnxraytracer_tpu.ops import samplers
        from gnxraytracer_tpu.scene import presets

        scene, cam = presets.cornell_instanced(w, h, flatten=flatten)
        cfg = path.make_config(scene, w, h, spp=spp, max_depth=4,
                               spp_chunk=spp)
        s = samplers.make_halton_sampler(spp, w, h)
        return np.asarray(path.render(scene, cam, s, cfg))

    @pytest.mark.slow
    def test_instanced_matches_flattened(self):
        inst_img = self._render(flatten=False)
        flat_img = self._render(flatten=True)
        assert np.isfinite(inst_img).all()
        # identical sample streams; the only difference is object-space vs
        # world-space intersection floats, which can flip rare edge lanes.
        diff = np.abs(inst_img - flat_img)
        frac_off = (diff.max(axis=-1) > 1e-3).mean()
        assert frac_off < 0.01, f"{frac_off:.4f} of pixels differ"
        np.testing.assert_allclose(inst_img.mean(), flat_img.mean(), rtol=5e-3)

    @pytest.mark.slow
    def test_instanced_visible(self):
        img = self._render(flatten=False)
        base_scene_img = None
        from gnxraytracer_tpu.models.integrators import path
        from gnxraytracer_tpu.ops import samplers
        from gnxraytracer_tpu.scene import presets

        scene, cam = presets.cornell_instanced(48, 48, flatten=False, n_inst=3)
        # drop the instances: render plain cornell for contrast
        scene0, _ = presets.cornell_box(width=48, height=48)
        cfg0 = path.make_config(scene0, 48, 48, spp=8, max_depth=4, spp_chunk=8)
        s = samplers.make_halton_sampler(8, 48, 48)
        base_scene_img = np.asarray(path.render(scene0, cam, s, cfg0))
        # the instanced boxes occlude floor light -> images must differ a lot
        assert np.abs(img - base_scene_img).mean() > 0.01
