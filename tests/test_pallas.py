"""Pallas intersection kernel vs the XLA path (interpret mode on CPU)."""

import functools

import jax.numpy as jnp
import pytest
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


class TestPacketBVH:
    """Packet (shared-cursor) Pallas BVH traversal vs the XLA walks
    (interpret mode — Mosaic compile is unavailable on the tunnel)."""

    def _scene(self, n_tris, seed):
        from test_bvh import random_scene
        return random_scene(n_tris, seed)

    @pytest.mark.parametrize("n_tris,n_rays,seed", [(60, 700, 1), (800, 1500, 3)])
    def test_matches_stackless(self, n_tris, n_rays, seed):
        from test_bvh import random_rays, random_scene
        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops.pallas_bvh import packet_closest_hit_trihit

        verts, idx = random_scene(n_tris, seed)
        o, d = random_rays(n_rays, seed + 5)
        tree = bvh_mod.build_bvh(verts, idx)
        t_max = jnp.full(n_rays, 1e30, jnp.float32)
        ph = packet_closest_hit_trihit(tree, jnp.asarray(o), jnp.asarray(d),
                                       t_max)
        ref = bvh_mod.bvh_closest_hit_stackless(tree, jnp.asarray(o),
                                                jnp.asarray(d), t_max)
        hp, hr = np.asarray(ph.hit), np.asarray(ref.hit)
        assert (hp != hr).sum() <= max(1, n_rays // 200)
        both = hp & hr
        if both.any():
            np.testing.assert_allclose(np.asarray(ph.t)[both],
                                       np.asarray(ref.t)[both],
                                       rtol=1e-4, atol=1e-5)

    def test_tmax_respected(self):
        from test_bvh import random_rays, random_scene
        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops.pallas_bvh import packet_closest_hit_trihit

        verts, idx = random_scene(100, 7)
        o, d = random_rays(300, 8)
        tree = bvh_mod.build_bvh(verts, idx)
        near = packet_closest_hit_trihit(tree, jnp.asarray(o), jnp.asarray(d),
                                         jnp.full(300, 0.5, jnp.float32))
        nh, nt = np.asarray(near.hit), np.asarray(near.t)
        assert np.all(nt[nh] <= 0.5)

    def test_padding_lanes_inert(self):
        """N not a multiple of the 1024-ray block: padded lanes must not
        corrupt real results."""
        from test_bvh import random_rays, random_scene
        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops.pallas_bvh import packet_closest_hit_trihit

        verts, idx = random_scene(60, 13)
        o, d = random_rays(1025, 14)
        tree = bvh_mod.build_bvh(verts, idx)
        t_max = jnp.full(1025, 1e30, jnp.float32)
        full = packet_closest_hit_trihit(tree, jnp.asarray(o), jnp.asarray(d),
                                         t_max)
        head = packet_closest_hit_trihit(tree, jnp.asarray(o[:1000]),
                                         jnp.asarray(d[:1000]),
                                         jnp.full(1000, 1e30, jnp.float32))
        np.testing.assert_array_equal(np.asarray(full.hit)[:1000],
                                      np.asarray(head.hit))


class TestPallasProductionWrapper:
    def test_sorted_wrapper_matches_xla_packet(self):
        """packet_closest_hit_pallas (coherence sort + kernel + unsort) must
        agree with the XLA packet walk lane-for-lane."""
        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        verts, idx, o, d = scene_and_rays(n_tris=120, n_rays=700, seed=7)
        bvh = bvh_mod.build_bvh(verts, idx)
        hp = pb.packet_closest_hit_pallas(bvh, jnp.asarray(o), jnp.asarray(d),
                                          1e30, interpret=True)
        hx = bvh_mod.packet_closest_hit_xla(bvh, jnp.asarray(o),
                                            jnp.asarray(d), 1e30)
        np.testing.assert_array_equal(np.asarray(hp.hit), np.asarray(hx.hit))
        both = np.asarray(hp.hit)
        np.testing.assert_allclose(np.asarray(hp.t)[both],
                                   np.asarray(hx.t)[both], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(hp.tri)[both],
                                      np.asarray(hx.tri)[both])

    def test_pack_is_traceable(self):
        """pack_bvh_for_pallas must be jnp-traceable so production
        scene_intersect can call it under jit."""
        import jax

        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        verts, idx, _, _ = scene_and_rays(n_tris=40)
        bvh = bvh_mod.build_bvh(verts, idx)
        jax.jit(pb.pack_bvh_for_pallas)(bvh)  # must not raise

    def test_any_hit_wrapper_matches_brute(self):
        """packet_any_hit_pallas (shadow-ray occlusion) must agree with the
        brute-force any-hit; sorted and unsorted paths."""
        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops import intersect
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        verts, idx, o, d = scene_and_rays(n_tris=150, n_rays=900, seed=11)
        bvh = bvh_mod.build_bvh(verts, idx)
        tmax = jnp.full(900, 1e30, jnp.float32)
        brute = np.asarray(intersect.any_triangle_hit(
            jnp.asarray(o), jnp.asarray(d), tmax, jnp.asarray(verts),
            jnp.asarray(idx)))
        for sort in (True, False):
            occ = np.asarray(pb.packet_any_hit_pallas(
                bvh, jnp.asarray(o), jnp.asarray(d), tmax, sort=sort,
                interpret=True))
            # epsilon-grazing rays may differ; require near-exact agreement
            assert (occ != brute).sum() <= 4

    def test_any_hit_respects_tmax(self):
        """Occlusion must not report hits beyond t_max (shadow ray to a
        light in front of the blocker)."""
        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        verts, idx, o, d = scene_and_rays(n_tris=80, n_rays=600, seed=3)
        bvh = bvh_mod.build_bvh(verts, idx)
        far = np.asarray(pb.packet_any_hit_pallas(
            bvh, jnp.asarray(o), jnp.asarray(d),
            jnp.full(600, 1e30, jnp.float32), interpret=True))
        near = np.asarray(pb.packet_any_hit_pallas(
            bvh, jnp.asarray(o), jnp.asarray(d),
            jnp.full(600, 1e-4, jnp.float32), interpret=True))
        assert not near.any()
        assert far.sum() > 0


class TestTreelets:
    """Two-level (treelet) Pallas traversal for meshes over the VMEM cap:
    the tree is cut into <= cap-prim subtrees and the kernel runs a
    (ray-block, treelet) grid carrying best-hit state in the resident
    output blocks."""

    def _cut(self, n_tris=900, cap=128, seed=21):
        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        verts, idx, o, d = scene_and_rays(n_tris=n_tris, n_rays=1100,
                                          seed=seed)
        tree = bvh_mod.build_bvh(verts, idx)
        tl = pb.build_treelets(
            np.asarray(tree.offset), np.asarray(tree.n_prims),
            np.asarray(tree.axis), np.asarray(tree.bounds_lo),
            np.asarray(tree.bounds_hi), np.asarray(tree.prim_idx),
            np.asarray(tree.leaf_soa), np.asarray(tree.first8),
            np.asarray(tree.miss8), cap=cap)
        return tree, tl, o, d

    def test_closest_matches_xla_packet(self):
        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        tree, tl, o, d = self._cut()
        assert tl.nodes.shape[0] >= 4  # the cut actually split the tree
        tmax = jnp.full(1100, 1e30, jnp.float32)
        t, tri, u, v = pb.treelet_closest_hit(tl, jnp.asarray(o),
                                              jnp.asarray(d), tmax,
                                              interpret=True)
        hx = bvh_mod.packet_closest_hit_xla(tree, jnp.asarray(o),
                                            jnp.asarray(d), tmax)
        np.testing.assert_array_equal(np.asarray(tri >= 0),
                                      np.asarray(hx.hit))
        both = np.asarray(tri >= 0)
        np.testing.assert_allclose(np.asarray(t)[both],
                                   np.asarray(hx.t)[both], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(tri)[both],
                                      np.asarray(hx.tri)[both])

    def test_any_hit_matches_brute(self):
        from gnxraytracer_tpu.ops import intersect
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        tree, tl, o, d = self._cut(seed=5)
        tmax = jnp.full(1100, 1e30, jnp.float32)
        occ = np.asarray(pb.treelet_any_hit(tl, jnp.asarray(o),
                                            jnp.asarray(d), tmax,
                                            interpret=True))
        verts_t = tree.leaf_soa  # brute from original arrays instead:
        # use the packet XLA any-hit as the oracle (itself brute-checked)
        from gnxraytracer_tpu.ops import bvh as bvh_mod

        ox = np.asarray(bvh_mod.packet_any_hit_xla(tree, jnp.asarray(o),
                                                   jnp.asarray(d), tmax))
        assert (occ != ox).sum() <= 4

    def test_tmax_respected(self):
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        tree, tl, o, d = self._cut(seed=9)
        near = np.asarray(pb.treelet_any_hit(
            tl, jnp.asarray(o), jnp.asarray(d),
            jnp.full(1100, 1e-4, jnp.float32), interpret=True))
        assert not near.any()

    def test_dead_lanes_skip(self):
        """t_max <= 0 lanes must return no hit through the treelet path."""
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        tree, tl, o, d = self._cut(seed=13)
        tm = jnp.full(1100, 1e30, jnp.float32).at[::2].set(0.0)
        t, tri, u, v = pb.treelet_closest_hit(tl, jnp.asarray(o),
                                              jnp.asarray(d), tm,
                                              interpret=True)
        assert not (np.asarray(tri)[::2] >= 0).any()


class TestWatertightLeaf:
    """VERDICT r2 item 7: the Pallas leaf test must be watertight — same
    algorithm (permute/shear/zero-snap, shape/Triangle.cpp:153-168) as the
    XLA path, so the two production modes cannot disagree at shared mesh
    edges.  The round-1 FMA-leak repro: rays aimed exactly at the shared
    diagonal of a two-triangle quad leaked 97/500 under plain
    Moller-Trumbore."""

    def _edge_targets(self, n=500):
        verts = np.asarray([
            [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
            [1.0, 1.0, 0.0]], np.float32)
        tris = np.asarray([[0, 1, 2], [1, 3, 2]], np.int32)
        rs = np.random.RandomState(1)
        s = rs.rand(n).astype(np.float32)
        targets = np.stack([s, 1 - s, np.zeros_like(s)], -1)
        o = np.broadcast_to(np.asarray([0.3, 0.3, 5.0], np.float32), (n, 3))
        d = targets - o
        d = d / np.linalg.norm(d, axis=1, keepdims=True)
        return verts, tris, jnp.asarray(o), jnp.asarray(d)

    def test_shared_edge_no_leak_closest(self):
        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        verts, tris, o, d = self._edge_targets()
        tree = bvh_mod.build_bvh(verts, tris)
        th = pb.packet_closest_hit_pallas(tree, o, d, 1e30, interpret=True)
        assert bool(np.asarray(th.hit).all()), (
            f"{int((~np.asarray(th.hit)).sum())}/500 rays leaked through "
            "the shared edge")

    def test_shared_edge_no_leak_anyhit(self):
        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        verts, tris, o, d = self._edge_targets()
        tree = bvh_mod.build_bvh(verts, tris)
        occ = pb.packet_any_hit_pallas(tree, o, d, 1e30, interpret=True)
        assert bool(np.asarray(occ).all())

    def test_hit_set_matches_xla_watertight(self):
        """Identical hit sets Pallas-vs-XLA on the shared-edge repro AND a
        random soup (both paths now share _watertight_one)."""
        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops import intersect
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        verts, tris, o, d = self._edge_targets()
        tree = bvh_mod.build_bvh(verts, tris)
        th = pb.packet_closest_hit_pallas(tree, o, d, 1e30, interpret=True)
        ref = intersect.closest_triangle_hit(
            o, d, jnp.full(500, 1e30, jnp.float32),
            jnp.asarray(verts), jnp.asarray(tris))
        np.testing.assert_array_equal(np.asarray(th.hit), np.asarray(ref.hit))
        both = np.asarray(th.hit) & np.asarray(ref.hit)
        np.testing.assert_allclose(np.asarray(th.t)[both],
                                   np.asarray(ref.t)[both], rtol=1e-5)


class TestCpackInterleave:
    def test_cpk2_matches_cpk1(self):
        """The CPACK>=2 cursor-interleave machinery in the binary packet
        kernel ships with CPACK=1 in production (measured slower
        end-to-end, PERF.md r3) but must not rot (ADVICE r3): run the
        un-jitted wrapper with the module global patched to 2 and demand
        bit-identical results vs the default."""
        from gnxraytracer_tpu.ops import bvh as bvh_mod
        from gnxraytracer_tpu.ops import pallas_bvh as pb

        verts, idx, o, d = scene_and_rays(n_tris=150, n_rays=2500, seed=11)
        tree = bvh_mod.build_bvh(verts, idx)
        tables = pb.pack_bvh_for_pallas(tree)
        t_max = jnp.full(2500, 1e30, jnp.float32)
        o, d = jnp.asarray(o), jnp.asarray(d)

        base = pb.packet_closest_hit(*tables, o, d, t_max, interpret=True)
        assert pb.CPACK == 1, "production default changed; retune this test"
        old, old_mk = pb.CPACK, pb._make_kernel
        try:
            # CPACK is a source-edit constant: the wrapper reads the
            # module global for its block shapes but _make_kernel's cpk
            # default was bound at def time, so BOTH must be patched (a
            # half-patch writes only the first sub-block's outputs)
            pb.CPACK = 2
            pb._make_kernel = functools.partial(old_mk, cpk=2)
            # un-jitted call: the jit cache does not key on the module
            # global, so the patched value must bypass it
            two = pb.packet_closest_hit.__wrapped__(
                *tables, o, d, t_max, interpret=True)
        finally:
            pb.CPACK, pb._make_kernel = old, old_mk
        for a, b in zip(base, two):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
