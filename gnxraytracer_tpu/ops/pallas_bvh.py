"""Pallas TPU kernel: packet (shared-cursor) BVH traversal.

The reference's per-ray stack walk (/root/reference/accelerator/
BVHAccel.cpp:653-729) is a divergent gather machine — the worst shape for
a vector core.  Two TPU-native replacements exist in this codebase:

  * ops/bvh.bvh_closest_hit_stackless — XLA-level lockstep walk with
    per-lane cursors (per-step per-lane node *gathers*).
  * this kernel — *packet* traversal: one grid program owns a block of
    rays resident in VMEM; the whole block walks the threaded (miss-link)
    BVH behind a single SCALAR cursor.  A node is visited if ANY ray in
    the block wants it (vector slab test -> scalar any-reduce), so every
    memory access is a scalar-indexed row read — no gathers at all — and
    every arithmetic op is a dense (SUB, 128) vector op at full VPU
    utilization.  Classic packet tracing economics: coherent packets
    (primary rays, shadow rays to one light, sorted wavefronts) visit
    nearly the per-ray-optimal node set; fully divergent packets degrade
    toward visiting the union of per-ray node sets.

Data layout (see pack_bvh_for_pallas): nodes (NN, 8) f32 bounds rows,
meta8 (K_oct, NN, 2) i32 per-octant threaded links (flattened for the
kernel; octant selected by a scalar base offset from a per-block SMEM
input), leafs (Tp, 16) f32 triangle rows, tid (Tp, 2) i32.

Two hard-won Mosaic constraints (both measured on v5e, PERF.md round 2):
  * narrow BLOCKED specs lane-pad to 128 (a (1, NN, 2) meta block costs
    NN*128*4 B of VMEM) — tables must be FULL-ARRAY VMEM residents;
  * PrefetchScalarGridSpec de-pipelines the outputs (full (NB*8, 128)
    arrays get S(1) VMEM allocations -> scoped OOM) — per-block scalars
    travel as a tiny SMEM input under a plain grid instead.

Meshes whose tables exceed VMEM run the treelet path (build_treelets /
treelet_closest_hit): K chained kernel launches over <=16k-prim subtrees.

Compiled and benchmarked on real TPU (v5e) — production
scene_intersect/scene_occluded dispatch here when bvh_mode == "pallas".
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import INFINITY

SUB = 8          # sublanes
LANE = 128       # lanes
BLOCK = SUB * LANE  # rays per grid program
LEAF_SIZE = 4    # must match ops/bvh.LEAF_SIZE
MAX_STEPS = 65536


def pack_bvh_for_pallas(bvh):
    """Pack the ops/bvh.BVH arrays into the dense tables the kernel reads
    with scalar row indices.

    nodes (NN, 8) f32  : lo.xyz hi.xyz pad pad
    meta8 (K, NN, 2) i32: per-octant threaded links —
        col 0: leaf -> -(prim_start + 1); inner -> FIRST child in this
               octant's near-first order (bvh.first8; node 0 is the root so
               first-child ids are always >= 1, keeping leaf-ness in the
               sign).
        col 1: miss link for this octant (bvh.miss8).
        K = 8 when the tree carries octant links, else 1 (single fixed
        order: first child = node+1, the depth-first layout).
    leafs (Tp, 16) f32 : p0 p1 p2 (9 floats) + pad
    tid   (Tp, 2)  i32 : triangle id + pad

    The kernel holds the FLATTENED (K*NN, 2) meta8 in VMEM and selects the
    block's octant with a scalar base offset (per-octant meta is only
    8 B/node, so full residency of all 8 orders is cheap).
    """
    # Pure jnp (traceable): callable inside jit, where XLA hoists the pack
    # as loop-invariant — so production scene_intersect can call it per cast.
    lo = bvh.bounds_lo.astype(jnp.float32)
    hi = bvh.bounds_hi.astype(jnp.float32)
    off = bvh.offset.astype(jnp.int32)
    npr = bvh.n_prims.astype(jnp.int32)
    prim = bvh.prim_idx.astype(jnp.int32)
    soa = bvh.leaf_soa.astype(jnp.float32)
    nn = off.shape[0]

    # Mosaic has no scalar bitcast (tpu.bitcast wants vectors), so int
    # metadata lives in its own i32 tables instead of f32-punned columns.
    nodes = jnp.concatenate([lo, hi, jnp.zeros((nn, 2), jnp.float32)], axis=1)
    leaf_code = -(off + 1)
    if bvh.first8 is not None:
        first = jnp.where((npr > 0)[None, :], leaf_code[None, :],
                          bvh.first8.astype(jnp.int32))
        meta8 = jnp.stack([first, bvh.miss8.astype(jnp.int32)], axis=-1)
    else:
        seq = jnp.arange(nn, dtype=jnp.int32) + 1
        meta8 = jnp.stack([jnp.where(npr > 0, leaf_code, seq),
                           bvh.miss.astype(jnp.int32)], axis=1)[None]

    tp = prim.shape[0]
    leafs = jnp.concatenate([soa, jnp.zeros((tp, 7), jnp.float32)], axis=1)
    tid = jnp.stack([prim, jnp.zeros((tp,), jnp.int32)], axis=1)

    return nodes, meta8, leafs, tid


def _make_kernel(nn):
    """Closest-hit kernel over a threaded tree of nn nodes.  All tables are
    FULL-ARRAY VMEM residents — blocked table specs with a trailing dim of
    8/16 get lane-padded to 128 by Mosaic (measured: 21.65 MB scoped VMEM
    for a 1.3 MB table set), so per-octant selection is a scalar base
    offset into the flattened (K_oct*NN, 2) meta table instead of a
    per-program block fetch."""

    def kernel(nodes_ref, meta_ref, leafs_ref, tid_ref, oct_ref, ox, oy, oz,
               dx, dy, dz, tmax_ref, t_out, tri_out, u_out, v_out):
        base = oct_ref[pl.program_id(0), 0] * nn
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]

        def safe_inv(v):
            tiny = jnp.where(v < 0, -1e-20, 1e-20)
            return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)

        inv_x, inv_y, inv_z = safe_inv(d_x), safe_inv(d_y), safe_inv(d_z)

        t_best0 = tmax_ref[:]
        tri0 = jnp.full((SUB, LANE), -1, jnp.int32)
        uv0 = jnp.zeros((SUB, LANE), jnp.float32)

        def cond(c):
            cursor, step = c[0], c[1]
            return (cursor >= 0) & (step < MAX_STEPS)

        def body(c):
            cursor, step, t_best, tri_b, u_b, v_b = c
            row = nodes_ref[cursor, :]              # (8,) scalar row read
            lo_x, lo_y, lo_z = row[0], row[1], row[2]
            hi_x, hi_y, hi_z = row[3], row[4], row[5]
            col6 = meta_ref[base + cursor, 0]  # leaf -(start+1) | first child
            miss = meta_ref[base + cursor, 1]

            # vector slab test, scalar bounds broadcast over the ray block
            tx0 = (lo_x - o_x) * inv_x
            tx1 = (hi_x - o_x) * inv_x
            ty0 = (lo_y - o_y) * inv_y
            ty1 = (hi_y - o_y) * inv_y
            tz0 = (lo_z - o_z) * inv_z
            tz1 = (hi_z - o_z) * inv_z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.maximum(tz0, tz1)) * (1.0 + 2.0 * 7.2e-7)
            # t_best > 0 is the live-lane term: dead lanes carry t_max = 0
            # (integrator convention) and would otherwise still "want" every
            # origin-containing node (tn < 0); with it an all-dead block
            # really does terminate at the root in one step (ADVICE r2)
            want = (tn <= tf) & (tf > 0) & (tn < t_best) & (t_best > 0)
            any_want = jnp.any(want)

            is_leaf = col6 < 0

            def do_leaf(args):
                t_best, tri_b, u_b, v_b = args
                start = -col6 - 1

                def leaf_iter(k, inner):
                    t_best, tri_b, u_b, v_b = inner
                    lr = leafs_ref[start + k, :]
                    tid = tid_ref[start + k, 0]
                    p0x, p0y, p0z = lr[0], lr[1], lr[2]
                    p1x, p1y, p1z = lr[3], lr[4], lr[5]
                    p2x, p2y, p2z = lr[6], lr[7], lr[8]
                    # Moller-Trumbore, scalar triangle vs vector rays
                    e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
                    e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
                    pvx = d_y * e2z - d_z * e2y
                    pvy = d_z * e2x - d_x * e2z
                    pvz = d_x * e2y - d_y * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    ok = jnp.abs(det) > 1e-12
                    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
                    tvx, tvy, tvz = o_x - p0x, o_y - p0y, o_z - p0z
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    v = (d_x * qvx + d_y * qvy + d_z * qvz) * inv
                    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
                    valid = (ok & (tid >= 0) & (u >= 0) & (v >= 0)
                             & (u + v <= 1) & (t > 1e-5) & (t < t_best))
                    t_best = jnp.where(valid, t, t_best)
                    tri_b = jnp.where(valid, tid, tri_b)
                    u_b = jnp.where(valid, u, u_b)
                    v_b = jnp.where(valid, v, v_b)
                    return t_best, tri_b, u_b, v_b

                return jax.lax.fori_loop(0, LEAF_SIZE, leaf_iter,
                                         (t_best, tri_b, u_b, v_b))

            t_best, tri_b, u_b, v_b = jax.lax.cond(
                any_want & is_leaf, do_leaf, lambda a: a,
                (t_best, tri_b, u_b, v_b))

            descend = any_want & ~is_leaf
            cursor = jnp.where(descend, col6, miss)  # near child first
            return cursor, step + 1, t_best, tri_b, u_b, v_b

        init = (jnp.int32(0), jnp.int32(0), t_best0, tri0, uv0, uv0)
        _, _, t_best, tri_b, u_b, v_b = jax.lax.while_loop(cond, body, init)

        t_out[:] = t_best
        tri_out[:] = tri_b
        u_out[:] = u_b
        v_out[:] = v_b

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def packet_closest_hit(nodes, meta8, leafs, tid, o, d, t_max, *, interpret=True):
    """Closest hit for N rays via packet traversal.  N padded to BLOCK.

    meta8 is (K, NN, 2) per-octant threaded links (K = 8 ordered / 1 fixed,
    pack_bvh_for_pallas); it is flattened to (K*NN, 2) and each grid
    program indexes its block's octant via a scalar base offset (the
    scalar-prefetch oct table) — per-octant meta is small (8 B/node), and
    full-array residency avoids Mosaic's lane padding of narrow blocked
    specs (see _make_kernel).

    Returns (t, tri, u, v): t == t_max & tri == -1 where no hit.
    """
    n = o.shape[0]
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    nb = n_pad // BLOCK
    nn = meta8.shape[1]

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,) + x.shape[1:], fill, x.dtype)])

    shape2 = (nb * SUB, LANE)
    ox = pad(o[:, 0]).reshape(shape2)
    oy = pad(o[:, 1]).reshape(shape2)
    oz = pad(o[:, 2]).reshape(shape2)
    dx = pad(d[:, 0], 1.0).reshape(shape2)
    dy = pad(d[:, 1], 1.0).reshape(shape2)
    dz = pad(d[:, 2], 1.0).reshape(shape2)
    tm = pad(jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32),
             -1.0).reshape(shape2)

    # block-representative octant (blocks are octant-pure after the
    # caller's coherence sort; a mixed block gets a valid but suboptimally
    # ordered DFS — correctness never depends on the octant choice)
    d0 = d[jnp.minimum(jnp.arange(nb, dtype=jnp.int32) * BLOCK, n - 1)]
    oct_b = ((d0[:, 0] < 0).astype(jnp.int32)
             | ((d0[:, 1] < 0).astype(jnp.int32) << 1)
             | ((d0[:, 2] < 0).astype(jnp.int32) << 2))
    if meta8.shape[0] == 1:
        oct_b = jnp.zeros_like(oct_b)
    oct_b = oct_b[:, None]  # SMEM scalars must be 2D

    ray_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    # whole (NB, 1) table in SMEM (blocks must tile (8,128) or equal
    # the array; a few KB of SMEM is fine), indexed by program_id
    oct_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    t, tri, u, v = pl.pallas_call(
        _make_kernel(nn),
        grid=(nb,),
        in_specs=[table_spec] * 4 + [oct_spec] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.int32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
        ],
        interpret=interpret,
    )(nodes, meta8.reshape(-1, 2), leafs, tid, oct_b,
      ox, oy, oz, dx, dy, dz, tm)

    return (t.reshape(-1)[:n], tri.reshape(-1)[:n],
            u.reshape(-1)[:n], v.reshape(-1)[:n])


def packet_closest_hit_trihit(bvh, o, d, t_max, *, interpret=True):
    """Adapter returning ops/intersect.TriHit (like bvh_closest_hit)."""
    from .intersect import TriHit

    nodes, meta, leafs, tid = pack_bvh_for_pallas(bvh)
    t, tri, u, v = packet_closest_hit(nodes, meta, leafs, tid, o, d, t_max,
                                      interpret=interpret)
    hit = tri >= 0
    b = jnp.stack([1.0 - u - v, u, v], axis=-1)
    return TriHit(hit=hit, t=jnp.where(hit, t, INFINITY),
                  tri=jnp.maximum(tri, 0), b=b)


# ---------------------------------------------------------------------------
# Treelet decomposition: Pallas packet traversal for meshes whose tables
# exceed VMEM (> PALLAS_MAX_TRIS).  The SAH tree is cut into K subtrees of
# <= cap prims each; the kernel runs a (ray-block, treelet) grid with the
# treelet axis innermost, so each ray block's best-hit state stays resident
# in VMEM across all K treelet walks (matmul-style output revisiting) and
# each program's tables are one treelet — small enough for VMEM + double
# buffering.  Subtree locality means most blocks kill most treelets at the
# treelet root in one step.  This is the TPU analogue of two-level
# (TLAS/BLAS) traversal.
# ---------------------------------------------------------------------------

TREELET_CAP = 16384  # prims per treelet: tables ~1.8 MB -> 2x-buffered fits


class TreeletPack(NamedTuple):
    nodes: jnp.ndarray  # (K, NNmax, 8) f32: lo.xyz hi.xyz pad pad
    meta8: jnp.ndarray  # (K, 8, NNmax, 2) i32: per-octant links, local ids
    leafs: jnp.ndarray  # (K, Tmax, 16) f32
    tid: jnp.ndarray    # (K, Tmax, 2) i32


def build_treelets(off, npr, axis, lo, hi, prim_idx, leaf_soa, first8, miss8,
                   cap=TREELET_CAP):
    """Host-side (numpy) treelet cut + per-treelet table packing.

    The depth-first layout makes every subtree a contiguous node range and
    (because leaves emit prims in DFS order) a contiguous leaf-row range,
    so each treelet is a rebased slice of the global tables: node links
    shift by the subtree start; miss links that exit the subtree become -1
    (the treelet walk ends; the next treelet continues the hit search).
    """
    nn = len(off)
    # subtree prim/node counts, vectorized per BFS level (the per-node
    # Python reverse pass was O(nn) interpreter work at every build —
    # ~500k iterations for a 1M-tri mesh; ADVICE r2)
    frontier = np.array([0], dtype=np.int64)
    levels = []
    while len(frontier):
        levels.append(frontier)
        inner_f = frontier[npr[frontier] == 0]
        frontier = np.concatenate([inner_f + 1, off[inner_f]])
    pcount = np.where(npr > 0, npr, 0).astype(np.int64)
    ncount = np.ones(nn, np.int64)
    for lvl in reversed(levels[:-1]):
        inner_l = lvl[npr[lvl] == 0]
        l, r = inner_l + 1, off[inner_l]
        pcount[inner_l] = pcount[l] + pcount[r]
        ncount[inner_l] = 1 + ncount[l] + ncount[r]

    roots = []
    stack = [0]
    while stack:
        node = stack.pop()
        if pcount[node] <= cap or npr[node] > 0:
            roots.append(node)
        else:
            stack.append(off[node])
            stack.append(node + 1)
    roots.sort()

    n_rows = leaf_soa.shape[0]
    slices = []
    for r in roots:
        e = r + ncount[r]
        leaf_off = off[r:e][npr[r:e] > 0]
        row_lo = int(leaf_off.min())
        # + LEAF_SIZE margin: the kernel reads LEAF_SIZE rows per leaf and
        # may spill past a short leaf into the next rows (harmless extra
        # triangle tests, same as the global walk)
        row_hi = min(int(leaf_off.max()) + LEAF_SIZE, n_rows)
        slices.append((r, e, row_lo, row_hi))

    k_t = len(slices)
    nn_max = max(e - r for r, e, _, _ in slices)
    # + LEAF_SIZE: the kernel's fixed-size leaf loop reads up to
    # LEAF_SIZE-1 rows past the last leaf's start; when the treelet whose
    # last leaf is clamped at the global table end also defines
    # t_max_rows, those reads would land out of bounds (ADVICE r2).  The
    # pad rows carry tid = -1, which the leaf test rejects.
    t_max_rows = max(rh - rl for _, _, rl, rh in slices) + LEAF_SIZE

    nodes_t = np.zeros((k_t, nn_max, 8), np.float32)
    meta_t = np.full((k_t, 8, nn_max, 2), -1, np.int32)
    leafs_t = np.zeros((k_t, t_max_rows, 16), np.float32)
    tid_t = np.full((k_t, t_max_rows, 2), -1, np.int32)

    for kk, (r, e, rl, rh) in enumerate(slices):
        m = e - r
        nodes_t[kk, :m, 0:3] = lo[r:e]
        nodes_t[kk, :m, 3:6] = hi[r:e]
        leaf_local = npr[r:e] > 0
        leaf_code = -(off[r:e] - rl + 1)
        for o in range(8):
            f = first8[o, r:e] - r
            ms = miss8[o, r:e]
            ms = np.where((ms >= r) & (ms < e), ms - r, -1)
            meta_t[kk, o, :m, 0] = np.where(leaf_local, leaf_code, f)
            meta_t[kk, o, :m, 1] = ms
        rows = rh - rl
        leafs_t[kk, :rows, :9] = leaf_soa[rl:rh]
        tid_t[kk, :rows, 0] = prim_idx[rl:rh]

    return TreeletPack(jnp.asarray(nodes_t), jnp.asarray(meta_t),
                       jnp.asarray(leafs_t), jnp.asarray(tid_t))


def treelet_closest_hit(tl: TreeletPack, o, d, t_max, *, interpret=True):
    """Closest hit over K treelets as a lax.scan over the treelet axis.

    One pallas_call instance per cast SITE regardless of K: the round-2
    Python loop inlined K kernels per cast into the integrator program
    (~50 Mosaic instances for the 105k-tri mesh across bounce widths),
    which is what actually killed the on-chip compile (BENCH_r02
    mesh_error) — each instance is a separate Mosaic compile through the
    remote-compile tunnel.  scan's body is traced once; each runtime
    iteration dynamic-slices one treelet's tables out of HBM (≈1.8 MB)
    and the kernel's full-array VMEM residency (the layout proven to
    compile on chip, see _make_kernel) copies them in.  The running best
    t feeds the next treelet's t_max, so earlier treelets prune later
    walks; blocks that miss a treelet's root exit in one step."""
    n = o.shape[0]
    t0 = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    init = (t0, jnp.full((n,), -1, jnp.int32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))

    def step(carry, tables):
        t, tri, u, v = carry
        nodes, meta8, leafs, tid = tables
        tk, trik, uk, vk = packet_closest_hit(nodes, meta8, leafs, tid,
                                              o, d, t, interpret=interpret)
        imp = trik >= 0  # hit strictly inside the carried t -> improvement
        return (jnp.where(imp, tk, t), jnp.where(imp, trik, tri),
                jnp.where(imp, uk, u), jnp.where(imp, vk, v)), None

    (t, tri, u, v), _ = jax.lax.scan(
        step, init, (tl.nodes, tl.meta8, tl.leafs, tl.tid))
    return t, tri, u, v


def treelet_any_hit(tl: TreeletPack, o, d, t_max, *, interpret=True):
    """Occlusion over K treelets (lax.scan, one kernel instance — see
    treelet_closest_hit); already-occluded lanes get t_max = 0 so later
    treelet walks skip them (dead-lane term in the kernel's want test)."""
    n = o.shape[0]
    t = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)

    def step(occ, tables):
        nodes, meta8, leafs, tid = tables
        occ_k = packet_any_hit(nodes, meta8, leafs, tid, o, d,
                               jnp.where(occ, 0.0, t), interpret=interpret)
        return occ | occ_k, None

    occ, _ = jax.lax.scan(step, jnp.zeros((n,), bool),
                          (tl.nodes, tl.meta8, tl.leafs, tl.tid))
    return occ


def _make_any_kernel(nn):
    """Occlusion kernel: like _make_kernel but terminates the whole block
    as soon as every ray is occluded or t-limited (the packet analogue of
    IntersectP's early return, accelerator/BVHAccel.cpp:736-795)."""

    def kernel(nodes_ref, meta_ref, leafs_ref, tid_ref, oct_ref, ox, oy, oz,
               dx, dy, dz, tmax_ref, occ_out):
        base = oct_ref[pl.program_id(0), 0] * nn
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]

        def safe_inv(v):
            tiny = jnp.where(v < 0, -1e-20, 1e-20)
            return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)

        inv_x, inv_y, inv_z = safe_inv(d_x), safe_inv(d_y), safe_inv(d_z)
        tm = tmax_ref[:]
        occ0 = jnp.zeros((SUB, LANE), jnp.int32)

        def cond(c):
            cursor, step = c[0], c[1]
            return (cursor >= 0) & (step < MAX_STEPS)

        def body(c):
            cursor, step, occ = c
            row = nodes_ref[cursor, :]
            lo_x, lo_y, lo_z = row[0], row[1], row[2]
            hi_x, hi_y, hi_z = row[3], row[4], row[5]
            col6 = meta_ref[base + cursor, 0]
            miss = meta_ref[base + cursor, 1]

            tx0 = (lo_x - o_x) * inv_x
            tx1 = (hi_x - o_x) * inv_x
            ty0 = (lo_y - o_y) * inv_y
            ty1 = (hi_y - o_y) * inv_y
            tz0 = (lo_z - o_z) * inv_z
            tz1 = (hi_z - o_z) * inv_z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.maximum(tz0, tz1)) * (1.0 + 2.0 * 7.2e-7)
            live = (occ == 0) & (tm > 0)
            want = (tn <= tf) & (tf > 0) & (tn < tm) & live
            any_want = jnp.any(want)
            is_leaf = col6 < 0

            def do_leaf(occ):
                start = -col6 - 1

                def leaf_iter(k, occ):
                    lr = leafs_ref[start + k, :]
                    tid = tid_ref[start + k, 0]
                    p0x, p0y, p0z = lr[0], lr[1], lr[2]
                    p1x, p1y, p1z = lr[3], lr[4], lr[5]
                    p2x, p2y, p2z = lr[6], lr[7], lr[8]
                    e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
                    e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
                    pvx = d_y * e2z - d_z * e2y
                    pvy = d_z * e2x - d_x * e2z
                    pvz = d_x * e2y - d_y * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    ok = jnp.abs(det) > 1e-12
                    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
                    tvx, tvy, tvz = o_x - p0x, o_y - p0y, o_z - p0z
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    v = (d_x * qvx + d_y * qvy + d_z * qvz) * inv
                    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
                    hit = (ok & (tid >= 0) & (u >= 0) & (v >= 0)
                           & (u + v <= 1) & (t > 1e-5) & (t < tm))
                    return jnp.where(hit, 1, occ)

                return jax.lax.fori_loop(0, LEAF_SIZE, leaf_iter, occ)

            occ = jax.lax.cond(any_want & is_leaf, do_leaf, lambda x: x, occ)
            all_done = jnp.all((occ == 1) | (tm <= 0))
            descend = any_want & ~is_leaf
            cursor = jnp.where(all_done, -1, jnp.where(descend, col6, miss))
            return cursor, step + 1, occ

        _, _, occ = jax.lax.while_loop(cond, body,
                                       (jnp.int32(0), jnp.int32(0), occ0))
        occ_out[:] = occ

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def packet_any_hit(nodes, meta8, leafs, tid, o, d, t_max, *, interpret=True):
    """Occlusion for N rays via the packet kernel; returns bool (N,)."""
    n = o.shape[0]
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    nb = n_pad // BLOCK
    nn = meta8.shape[1]

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,) + x.shape[1:], fill, x.dtype)])

    shape2 = (nb * SUB, LANE)
    ox = pad(o[:, 0]).reshape(shape2)
    oy = pad(o[:, 1]).reshape(shape2)
    oz = pad(o[:, 2]).reshape(shape2)
    dx = pad(d[:, 0], 1.0).reshape(shape2)
    dy = pad(d[:, 1], 1.0).reshape(shape2)
    dz = pad(d[:, 2], 1.0).reshape(shape2)
    tm = pad(jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32),
             -1.0).reshape(shape2)

    d0 = d[jnp.minimum(jnp.arange(nb, dtype=jnp.int32) * BLOCK, n - 1)]
    oct_b = ((d0[:, 0] < 0).astype(jnp.int32)
             | ((d0[:, 1] < 0).astype(jnp.int32) << 1)
             | ((d0[:, 2] < 0).astype(jnp.int32) << 2))
    if meta8.shape[0] == 1:
        oct_b = jnp.zeros_like(oct_b)
    oct_b = oct_b[:, None]  # SMEM scalars must be 2D

    ray_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    # whole (NB, 1) table in SMEM (blocks must tile (8,128) or equal
    # the array; a few KB of SMEM is fine), indexed by program_id
    oct_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    occ = pl.pallas_call(
        _make_any_kernel(nn),
        grid=(nb,),
        in_specs=[table_spec] * 4 + [oct_spec] + [ray_spec] * 7,
        out_specs=[ray_spec],
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.int32)],
        interpret=interpret,
    )(nodes, meta8.reshape(-1, 2), leafs, tid, oct_b,
      ox, oy, oz, dx, dy, dz, tm)[0]

    return occ.reshape(-1)[:n] > 0


def packet_any_hit_pallas(bvh, o, d, t_max, sort=True, interpret=False):
    """Production Pallas occlusion query (shadow rays): coherence sort +
    VMEM packet kernel with whole-block early-out.  Mirrors
    ops/bvh.packet_any_hit_xla."""
    from .bvh import ray_sort_perm

    n = o.shape[0]
    t_max = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    if sort:
        perm, inv = ray_sort_perm(o, d, bvh.bounds_lo[0], bvh.bounds_hi[0],
                                  t_max=t_max)
        o, d, t_max = o[perm], d[perm], t_max[perm]
    if bvh.treelets is not None:
        occ = treelet_any_hit(bvh.treelets, o, d, t_max, interpret=interpret)
    else:
        nodes, meta8, leafs, tid = pack_bvh_for_pallas(bvh)
        occ = packet_any_hit(nodes, meta8, leafs, tid, o, d, t_max,
                             interpret=interpret)
    if sort:
        occ = occ[inv]
    return occ


# Above this table budget Mosaic fails to place the packed tables in VMEM
# alongside the ray blocks and double buffers (measured on v5e: 51,200 tris
# / 4.9 MB of tables compiles and runs; 80,000 tris / 7.7 MB gets an HTTP
# 500 from the compile service).  Production falls back to the XLA packet
# walk (tables in HBM) beyond this; HBM-resident tables via pltpu.ANY +
# per-node DMA are the future path for giant meshes.
PALLAS_MAX_TRIS = 50_000


def packet_closest_hit_pallas(bvh, o, d, t_max, sort=True, interpret=False):
    """Production Pallas closest hit: same coherence sort as
    ops/bvh.packet_closest_hit_xla (octant + origin-morton,
    bvh.ray_sort_perm) in front of the VMEM packet kernel.  Measured on a
    real v5e (5k-tri blob, 1M rays): 82 ms coherent vs 454 ms for the XLA
    packet walk — the per-step scalar row reads beat XLA's (NB,)-gathers
    by keeping the whole walk in VMEM.  Returns TriHit."""
    from .bvh import ray_sort_perm
    from .intersect import TriHit

    n = o.shape[0]
    t_max = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    if sort:
        perm, inv = ray_sort_perm(o, d, bvh.bounds_lo[0], bvh.bounds_hi[0],
                                  t_max=t_max)
        o, d, t_max = o[perm], d[perm], t_max[perm]
    if bvh.treelets is not None:
        t, tri, u, v = treelet_closest_hit(bvh.treelets, o, d, t_max,
                                           interpret=interpret)
    else:
        nodes, meta, leafs, tid = pack_bvh_for_pallas(bvh)
        t, tri, u, v = packet_closest_hit(nodes, meta, leafs, tid, o, d,
                                          t_max, interpret=interpret)
    if sort:
        t, tri, u, v = t[inv], tri[inv], u[inv], v[inv]
    hit = tri >= 0
    b = jnp.stack([1.0 - u - v, u, v], axis=-1)
    return TriHit(hit=hit, t=jnp.where(hit, t, INFINITY),
                  tri=jnp.maximum(tri, 0), b=b)
