"""BVH build + traversal vs brute-force linear intersection on random
scenes (SURVEY.md §4: 'BVH traversal vs. linear all-primitives
intersection on random scenes')."""

import jax.numpy as jnp
import numpy as np
import pytest

from gnxraytracer_tpu.ops import bvh as bvh_mod
from gnxraytracer_tpu.ops import intersect


def random_scene(n_tris, seed=0, spread=5.0):
    rs = np.random.RandomState(seed)
    centers = rs.randn(n_tris, 1, 3) * spread
    tris = centers + rs.randn(n_tris, 3, 3) * 0.4
    verts = tris.reshape(-1, 3).astype(np.float32)
    idx = np.arange(n_tris * 3).reshape(n_tris, 3).astype(np.int32)
    return verts, idx


def random_rays(n, seed=1, spread=8.0):
    rs = np.random.RandomState(seed)
    o = rs.randn(n, 3).astype(np.float32) * spread
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


class TestBVHBuild:
    def test_structure_valid(self):
        verts, idx = random_scene(200)
        arrs = bvh_mod.build_bvh_numpy(verts, idx)
        lo, hi, off, npr, ax, order = arrs
        # every triangle appears exactly once in the order
        got = sorted(x for x in order.tolist() if x >= 0)
        assert got == list(range(200))
        # leaves have 1..LEAF bound, interiors 0
        assert npr.max() <= 8  # SAH may keep up to 2*leaf_size
        # root bounds contain everything
        assert np.all(lo[0] <= verts.min(0) + 1e-4)
        assert np.all(hi[0] >= verts.max(0) - 1e-4)

    def test_single_triangle(self):
        verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        idx = np.asarray([[0, 1, 2]], np.int32)
        arrs = bvh_mod.build_bvh_numpy(verts, idx)
        assert arrs[3][0] == 1  # root is a leaf with 1 prim


class TestBVHTraversal:
    @pytest.mark.parametrize("n_tris,n_rays,seed", [(50, 200, 0), (500, 300, 2)])
    def test_matches_bruteforce(self, n_tris, n_rays, seed):
        verts, idx = random_scene(n_tris, seed)
        o, d = random_rays(n_rays, seed + 10)
        vj, ij = jnp.asarray(verts), jnp.asarray(idx)
        t_max = jnp.full(n_rays, 1e30, jnp.float32)
        brute = intersect.closest_triangle_hit(jnp.asarray(o), jnp.asarray(d),
                                               t_max, vj, ij)
        tree = bvh_mod.build_bvh(verts, idx)
        fast = bvh_mod.bvh_closest_hit(tree, vj, ij, jnp.asarray(o),
                                       jnp.asarray(d), t_max)
        bh, fh = np.asarray(brute.hit), np.asarray(fast.hit)
        bt, ft = np.asarray(brute.t), np.asarray(fast.t)
        # watertight (brute) vs MT (leaf) may disagree on exact-edge rays
        mismatch = (bh != fh).sum()
        assert mismatch <= max(1, n_rays // 100), f"{mismatch} hit mismatches"
        both = bh & fh
        np.testing.assert_allclose(bt[both], ft[both], rtol=1e-3, atol=1e-4)

    def test_blocked_bruteforce_matches(self):
        # T=2000 routes through the 128-wide blocked brute force
        verts, idx = random_scene(2000, 9)
        o, d = random_rays(256, 10)
        vj, ij = jnp.asarray(verts), jnp.asarray(idx)
        t_max = jnp.full(256, 1e30, jnp.float32)
        from gnxraytracer_tpu.ops.intersect import (
            closest_triangle_hit, closest_triangle_hit_blocked,
            ray_triangles_watertight)

        blocked = closest_triangle_hit_blocked(jnp.asarray(o), jnp.asarray(d),
                                               t_max, vj, ij)
        tree = bvh_mod.build_bvh(verts, idx)
        fast = bvh_mod.bvh_closest_hit(tree, vj, ij, jnp.asarray(o),
                                       jnp.asarray(d), t_max)
        bh, fh = np.asarray(blocked.hit), np.asarray(fast.hit)
        assert (bh != fh).sum() <= 3
        both = bh & fh
        np.testing.assert_allclose(np.asarray(blocked.t)[both],
                                   np.asarray(fast.t)[both], rtol=1e-3)

    def test_any_hit_matches(self):
        verts, idx = random_scene(300, 4)
        o, d = random_rays(400, 5)
        vj, ij = jnp.asarray(verts), jnp.asarray(idx)
        t_max = jnp.full(400, 1e30, jnp.float32)
        brute = np.asarray(intersect.any_triangle_hit(
            jnp.asarray(o), jnp.asarray(d), t_max, vj, ij))
        tree = bvh_mod.build_bvh(verts, idx)
        fast = np.asarray(bvh_mod.bvh_any_hit(tree, vj, ij, jnp.asarray(o),
                                              jnp.asarray(d), t_max))
        assert (brute != fast).sum() <= 4

    @pytest.mark.slow
    def test_lbvh_matches_bruteforce(self):
        """On-device LBVH (morton + Karras linking) traversal parity."""
        from gnxraytracer_tpu.ops import lbvh

        verts, idx = random_scene(800, 11)
        o, d = random_rays(300, 12)
        tree = lbvh.build_lbvh(verts, idx)
        vj, ij = jnp.asarray(verts), jnp.asarray(idx)
        t_max = jnp.full(300, 1e30, jnp.float32)
        fast = bvh_mod.bvh_closest_hit(tree, vj, ij, jnp.asarray(o),
                                       jnp.asarray(d), t_max)
        brute = intersect.closest_triangle_hit(jnp.asarray(o), jnp.asarray(d),
                                               t_max, vj, ij)
        bh, fh = np.asarray(brute.hit), np.asarray(fast.hit)
        assert (bh != fh).sum() <= 3
        both = bh & fh
        np.testing.assert_allclose(np.asarray(brute.t)[both],
                                   np.asarray(fast.t)[both], rtol=1e-3)

    def test_tmax_limits_hits(self):
        verts, idx = random_scene(100, 7)
        o, d = random_rays(100, 8)
        tree = bvh_mod.build_bvh(verts, idx)
        vj, ij = jnp.asarray(verts), jnp.asarray(idx)
        far = bvh_mod.bvh_closest_hit(tree, vj, ij, jnp.asarray(o),
                                      jnp.asarray(d), jnp.full(100, 1e30, jnp.float32))
        near = bvh_mod.bvh_closest_hit(tree, vj, ij, jnp.asarray(o),
                                       jnp.asarray(d), jnp.full(100, 0.5, jnp.float32))
        nh, nt = np.asarray(near.hit), np.asarray(near.t)
        assert nh.sum() <= np.asarray(far.hit).sum()
        assert np.all(nt[nh] <= 0.5)


class TestStacklessTraversal:
    """Threaded miss-link traversal (bvh_closest_hit_stackless): cursor-only
    automaton must agree with both the stack walk and brute force."""

    @pytest.mark.parametrize("n_tris,n_rays,seed", [(50, 200, 0), (500, 300, 2),
                                                    (2000, 256, 9)])
    def test_matches_bruteforce(self, n_tris, n_rays, seed):
        verts, idx = random_scene(n_tris, seed)
        o, d = random_rays(n_rays, seed + 10)
        vj, ij = jnp.asarray(verts), jnp.asarray(idx)
        t_max = jnp.full(n_rays, 1e30, jnp.float32)
        brute = intersect.closest_triangle_hit(jnp.asarray(o), jnp.asarray(d),
                                               t_max, vj, ij)
        tree = bvh_mod.build_bvh(verts, idx)
        fast = bvh_mod.bvh_closest_hit_stackless(tree, jnp.asarray(o),
                                                 jnp.asarray(d), t_max)
        bh, fh = np.asarray(brute.hit), np.asarray(fast.hit)
        bt, ft = np.asarray(brute.t), np.asarray(fast.t)
        mismatch = (bh != fh).sum()
        assert mismatch <= max(1, n_rays // 100), f"{mismatch} hit mismatches"
        both = bh & fh
        np.testing.assert_allclose(bt[both], ft[both], rtol=1e-3, atol=1e-4)
        # same triangle found where ts agree (not on shared edges)
        close = both & (np.abs(bt - ft) < 1e-5)
        if close.sum() > 0:
            agree = (np.asarray(brute.tri)[close] == np.asarray(fast.tri)[close])
            assert agree.mean() > 0.98

    def test_matches_stack_walk(self):
        verts, idx = random_scene(700, 21)
        o, d = random_rays(500, 22)
        vj, ij = jnp.asarray(verts), jnp.asarray(idx)
        t_max = jnp.full(500, 1e30, jnp.float32)
        tree = bvh_mod.build_bvh(verts, idx)
        a = bvh_mod.bvh_closest_hit(tree, vj, ij, jnp.asarray(o),
                                    jnp.asarray(d), t_max)
        b = bvh_mod.bvh_closest_hit_stackless(tree, jnp.asarray(o),
                                              jnp.asarray(d), t_max)
        np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
        both = np.asarray(a.hit)
        np.testing.assert_allclose(np.asarray(a.t)[both],
                                   np.asarray(b.t)[both], rtol=1e-5)

    def test_any_hit_matches(self):
        verts, idx = random_scene(300, 4)
        o, d = random_rays(400, 5)
        vj, ij = jnp.asarray(verts), jnp.asarray(idx)
        t_max = jnp.full(400, 1e30, jnp.float32)
        brute = np.asarray(intersect.any_triangle_hit(
            jnp.asarray(o), jnp.asarray(d), t_max, vj, ij))
        tree = bvh_mod.build_bvh(verts, idx)
        fast = np.asarray(bvh_mod.bvh_any_hit_stackless(
            tree, jnp.asarray(o), jnp.asarray(d), t_max))
        assert (brute != fast).sum() <= 4

    def test_tmax_limits_hits(self):
        verts, idx = random_scene(100, 7)
        o, d = random_rays(100, 8)
        tree = bvh_mod.build_bvh(verts, idx)
        near = bvh_mod.bvh_closest_hit_stackless(
            tree, jnp.asarray(o), jnp.asarray(d),
            jnp.full(100, 0.5, jnp.float32))
        nh, nt = np.asarray(near.hit), np.asarray(near.t)
        assert np.all(nt[nh] <= 0.5)

    def test_miss_links_valid(self):
        verts, idx = random_scene(200)
        tree = bvh_mod.build_bvh(verts, idx)
        miss = np.asarray(tree.miss)
        off = np.asarray(tree.offset)
        npr = np.asarray(tree.n_prims)
        nn = len(miss)
        assert miss[0] == -1
        # every miss link points to a later node in DFS order (skip = forward)
        nodes = np.arange(nn)
        valid = miss >= 0
        assert np.all(miss[valid] > nodes[valid])
        # walking hit-everywhere visits every node exactly once
        cursor, seen = 0, 0
        while cursor >= 0 and seen <= nn:
            seen += 1
            cursor = cursor + 1 if npr[cursor] == 0 else miss[cursor]
        assert seen == nn
        assert off is not None  # silence lint; off checked via walk above


class TestPacketTraversalXLA:
    """XLA packet traversal (shared cursor per ray block) vs brute force."""

    @pytest.mark.parametrize("sort", [True, False])
    def test_matches_bruteforce(self, sort):
        verts, idx = random_scene(800, 3)
        o, d = random_rays(3000, 7)
        tree = bvh_mod.build_bvh(verts, idx)
        tmax = jnp.full(3000, 1e30, jnp.float32)
        brute = intersect.closest_triangle_hit(
            jnp.asarray(o), jnp.asarray(d), tmax, jnp.asarray(verts),
            jnp.asarray(idx))
        pk = bvh_mod.packet_closest_hit_xla(tree, jnp.asarray(o),
                                            jnp.asarray(d), tmax, sort=sort)
        bh, fh = np.asarray(brute.hit), np.asarray(pk.hit)
        assert (bh != fh).sum() <= 5
        both = bh & fh
        np.testing.assert_allclose(np.asarray(brute.t)[both],
                                   np.asarray(pk.t)[both], rtol=1e-3,
                                   atol=1e-4)

    @pytest.mark.parametrize("sort", [True, False])
    def test_any_hit(self, sort):
        verts, idx = random_scene(400, 6)
        o, d = random_rays(2000, 9)
        tree = bvh_mod.build_bvh(verts, idx)
        tmax = jnp.full(2000, 1e30, jnp.float32)
        brute = np.asarray(intersect.any_triangle_hit(
            jnp.asarray(o), jnp.asarray(d), tmax, jnp.asarray(verts),
            jnp.asarray(idx)))
        pk = np.asarray(bvh_mod.packet_any_hit_xla(
            tree, jnp.asarray(o), jnp.asarray(d), tmax, sort=sort))
        assert (brute != pk).sum() <= 4

    def test_ragged_n(self):
        """N not a multiple of the packet size."""
        verts, idx = random_scene(100, 11)
        o, d = random_rays(777, 12)
        tree = bvh_mod.build_bvh(verts, idx)
        tmax = jnp.full(777, 1e30, jnp.float32)
        pk = bvh_mod.packet_closest_hit_xla(tree, jnp.asarray(o),
                                            jnp.asarray(d), tmax)
        brute = intersect.closest_triangle_hit(
            jnp.asarray(o), jnp.asarray(d), tmax, jnp.asarray(verts),
            jnp.asarray(idx))
        assert (np.asarray(pk.hit) != np.asarray(brute.hit)).sum() <= 2

    def test_sort_perm_roundtrip(self):
        o, d = random_rays(513, 3)
        perm, inv = bvh_mod.ray_sort_perm(jnp.asarray(o), jnp.asarray(d),
                                          jnp.asarray([-8.0, -8, -8]),
                                          jnp.asarray([8.0, 8, 8]))
        p = np.asarray(perm)
        assert sorted(p.tolist()) == list(range(513))
        np.testing.assert_array_equal(np.asarray(perm)[np.asarray(inv)],
                                      np.arange(513))


class TestOctantLinks:
    """Per-octant front-to-back threading (bvh.first8/miss8): each octant's
    (first, miss) tables must encode a complete DFS of the same tree with
    the near child (split-axis sign per the reference's dirIsNeg test,
    BVHAccel.cpp:678-690) visited first."""

    def test_walk_visits_every_node_once(self):
        verts, idx = random_scene(300, 3)
        tree = bvh_mod.build_bvh(verts, idx)
        first8 = np.asarray(tree.first8)
        miss8 = np.asarray(tree.miss8)
        npr = np.asarray(tree.n_prims)
        nn = len(npr)
        for o in range(8):
            seen = np.zeros(nn, bool)
            cur, steps = 0, 0
            while cur >= 0:
                assert not seen[cur], f"octant {o}: node {cur} revisited"
                seen[cur] = True
                cur = first8[o, cur] if npr[cur] == 0 else miss8[o, cur]
                steps += 1
                assert steps <= 2 * nn
            # the never-pruning walk (always descend at inner nodes) is the
            # full Euler tour: it must visit every node exactly once
            assert seen.all(), f"octant {o}: {np.count_nonzero(~seen)} unreached"
        # near-child-first: for octant 0 (all directions positive) the
        # first child of an inner node is the left child (node+1)
        inner = npr == 0
        off = np.asarray(tree.offset)
        ax = np.asarray(tree.axis)
        ids = np.nonzero(inner)[0]
        np.testing.assert_array_equal(first8[0, ids], ids + 1)
        # octant 7 (all negative): first child is the right child
        np.testing.assert_array_equal(first8[7, ids], off[ids])
        # mixed octant: depends on split axis sign bit
        o = 0b010  # y negative
        want = np.where(ax[ids] == 1, off[ids], ids + 1)
        np.testing.assert_array_equal(first8[o, ids], want)

    def test_full_walk_is_permutation_of_nodes(self):
        verts, idx = random_scene(120, 9)
        tree = bvh_mod.build_bvh(verts, idx)
        first8 = np.asarray(tree.first8)
        miss8 = np.asarray(tree.miss8)
        npr = np.asarray(tree.n_prims)
        nn = len(npr)
        for o in (0, 3, 5, 7):
            # simulate a never-pruning packet walk: enter every inner node
            order = []
            cur = 0
            while cur >= 0 and len(order) <= 2 * nn:
                order.append(cur)
                cur = first8[o, cur] if npr[cur] == 0 else miss8[o, cur]
            assert sorted(order) == list(range(nn))


@pytest.mark.slow
def test_scene_builder_lbvh_mode():
    """SceneBuilder.build(bvh="lbvh") selects the on-device LBVH builder
    (VERDICT r2 weak #6: it was library-only) and the resulting tree
    traverses identically to the SAH tree through the production packet
    walk."""
    import numpy as np

    from gnxraytracer_tpu.ops import bvh as bvh_mod
    from gnxraytracer_tpu.scene.scene import SceneBuilder

    rng = np.random.default_rng(3)
    v = (rng.random((300, 3), np.float32) * 4 - 2).astype(np.float32)
    t = rng.integers(0, 300, (200, 3)).astype(np.int32)

    def build(mode):
        b = SceneBuilder()
        m = b.add_matte((0.5, 0.5, 0.5))
        b.add_mesh(v, t, m)
        b.add_skybox_light()
        return b.build(bvh=mode)

    s_lbvh = build("lbvh")
    s_sah = build(True)
    assert s_lbvh.bvh is not None

    n = 256
    o = jnp.asarray(rng.random((n, 3), np.float32) * 6 - 3)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    h1 = bvh_mod.packet_closest_hit_xla(s_lbvh.bvh, o, d, 1e30)
    h2 = bvh_mod.packet_closest_hit_xla(s_sah.bvh, o, d, 1e30)
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    both = np.asarray(h1.hit)
    np.testing.assert_allclose(np.asarray(h1.t)[both], np.asarray(h2.t)[both],
                               rtol=1e-4)
