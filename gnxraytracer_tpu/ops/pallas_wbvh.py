"""Pallas TPU kernel: WIDE (BVH4) packet traversal with a scalar stack.

Round-4 redesign of the ops/pallas_bvh threaded packet walk.  The r3
roofline (PERF.md) showed the binary walk is bound by its per-step serial
scalar<->vector chain: one node visit = row load -> 6 vector-register
extracts (0.25-1 us EACH) -> slab -> ONE any-reduce (~3 us) -> cursor
select, ~1.9 us/step x ~1.4k steps/block.  This kernel restructures the
walk so that chain is paid once per ROUND instead of once per node:

  * WIDE NODES: a BVH4 node stores its <=4 children's bounds; children are
    slab-tested at the PARENT, so no step is ever spent visiting a node
    that fails its own box test (the binary walk pays a full step per
    miss).  Collapsing the SAH tree two levels at a time halves visited
    entities again (accelerator/BVHAccel.cpp:653-729 is the per-ray
    binary analogue being replaced).
  * SCALAR STACK, MULTI-POP: the block's traversal state is a stack of
    wide-node ids in SMEM (scalar memory — push/pop are plain scalar
    stores/loads, nothing like the reference's per-ray 64-deep stack in
    HBM).  Each round pops up to WP nodes and tests all WP*4 child slots
    together: the slot tests are independent, so their vector work and
    reduces pipeline.
  * ONE SYNC PER ROUND: per-slot "any ray wants it" is computed WITHOUT a
    per-slot scalar sync: lane-reduce each (8,128) want to (8,1), concat
    to (8, WP*4), column-sum, and fold into a single packed bitmask with
    one weighted sum -> ONE vector->scalar transfer authorizes every
    push/leaf decision of the round.
  * SCALAR BOUNDS LOADS: child bounds come from direct scalar VMEM loads
    (wb_ref[node, col]) — the pipelining-friendly access the r3
    microbench measured at ~57-450 ns — never from vector-register
    extracts.
  * LEAF QUEUE: leaf slots are pushed to a second SMEM queue; each round
    pops up to WLQ leaf rows and runs the same statically-unrolled
    watertight tests as the binary kernel (ops/pallas_bvh._leaf_tests,
    shape/Triangle.cpp:71-300 semantics) branchlessly under a validity
    mask.

Ordering: per-octant near-first child order is precomputed at build
(collapse_bvh4's worder table, the wide generalization of the binary
first8/miss8 threading) and pushes go far-to-near so LIFO pops visit near
subtrees first — early t_best tightening still prunes far subtrees.

Tables per treelet (<=16k prims) total <1 MB, comfortably VMEM-resident;
meshes above the cap run the same lax.scan-over-treelets chain as the
binary path (one kernel instance per cast site).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import INFINITY
from .pallas_bvh import LEAF_SIZE, _leaf_tests, _shear_frame

SUB = 16        # sublanes per ray block (2048 rays: fixed per-round cost
                # amortizes over more rays; swept on chip, PERF.md r4)
LANE = 128
BLOCK = SUB * LANE

WP = 8          # wide-node pops per round (WP*4 slot tests batched)
WLQ = 8         # leaf rows tested per round
ILEAF = False   # inline leaf tests at the parent (pl.when) vs leaf queue
STACK = 1024    # SMEM node-stack entries (4 KB)
LSTACK = 1024   # SMEM leaf-queue entries (4 KB)
# LIFO multi-pop keeps the frontier near-DFS, but a pathological block can
# still grow it; above HIGH_WATER rounds pop only 1 node (pure DFS drains,
# bound HIGH_WATER + 3*depth << STACK)
HIGH_WATER = STACK - 256
# a round can push up to WP*4 leaves but pops only WLQ; above L_HIGH_WATER
# node pops pause so the queue drains (bound L_HIGH_WATER + WP*4 < LSTACK)
L_HIGH_WATER = LSTACK - 128
MAX_ROUNDS = 65536


# ---------------------------------------------------------------------------
# Host build: binary SAH arrays -> BVH4 tables
# ---------------------------------------------------------------------------

class WideBVH(NamedTuple):
    wbounds: np.ndarray  # (NW, 32) f32: [lox0..3 loy0..3 loz0..3 hix0..3
    #                       hiy0..3 hiz0..3 pad*8]; empty slot: +BIG/-BIG
    wtarg: np.ndarray    # (NW, 4) i32: >=0 wide child; <0 leaf row code
    #                       -(leaf_row/LEAF_SIZE + 1); empty: 0
    worder: np.ndarray   # (8, NW) i32 packed per-octant near-first perm:
    #                       bits 2j..2j+1 slot of j-th nearest, bits 8..10
    #                       valid-slot count


BIG = np.float32(3.0e38)


def collapse_bvh4(off, npr, axis, lo, hi, root=0, row_base=0):
    """Collapse the binary DFS subtree at `root` into BVH4 arrays.

    off/npr/axis/lo/hi: the global binary arrays (ops/bvh layout: interior
    node n has children n+1 and off[n]; leaf n covers LEAF_SIZE-aligned
    rows starting at off[n]).  row_base rebases leaf-row codes (treelets).

    Wide node = one binary interior node n whose slots are n's
    grandchildren where a child is interior, or the child itself where it
    is a leaf (2..4 slots).  Slot order is [left-expansion..., right-
    expansion...]; per-octant near-first permutations follow the split
    axes exactly like the binary near-child rule (octant bit set on the
    split axis -> upper child first, accelerator/BVHAccel.cpp:678-690).
    """
    off = np.asarray(off, np.int64)
    npr = np.asarray(npr, np.int64)
    axis = np.asarray(axis, np.int64)

    def leaf_code(b):
        return -int((off[b] - row_base) // LEAF_SIZE + 1)

    if npr[root] > 0:
        # degenerate: the subtree is a single leaf -> one wide node, 1 slot
        wb = np.full((1, 32), 0.0, np.float32)
        wb[0, 0:24:4] = [lo[root, 0], lo[root, 1], lo[root, 2],
                         hi[root, 0], hi[root, 1], hi[root, 2]]
        wt = np.zeros((1, 4), np.int32)
        wt[0, 0] = leaf_code(root)
        wo = np.full((8, 1), (1 << 8), np.int32)  # cnt=1, perm=[0]
        return WideBVH(wb, wt, wo)

    wide_id = {root: 0}
    worklist = [root]
    entries = []  # (slots [(bin, half, sub)], (a0, aL, aR))
    while worklist:
        n = worklist.pop()
        l, r = n + 1, int(off[n])
        slots = []
        haxes = [int(axis[n]), -1, -1]
        for h, c in ((0, l), (1, r)):
            if npr[c] == 0:
                haxes[1 + h] = int(axis[c])
                slots.append((c + 1, h, 0))
                slots.append((int(off[c]), h, 1))
            else:
                slots.append((c, h, -1))
        for b, _h, _s in slots:
            if npr[b] == 0 and b not in wide_id:
                wide_id[b] = len(wide_id)
                worklist.append(b)
        entries.append((n, slots, haxes))
    # entries were appended in worklist order == wide id order? worklist is
    # a LIFO; ids were assigned at DISCOVERY.  Rebuild in id order:
    by_node = {n: (slots, haxes) for n, slots, haxes in entries}
    nw = len(wide_id)
    wb = np.zeros((nw, 32), np.float32)
    wb[:, 0:12] = BIG      # lo of empty slots -> +BIG
    wb[:, 12:24] = -BIG    # hi -> -BIG
    wt = np.zeros((nw, 4), np.int32)
    wo = np.zeros((8, nw), np.int32)
    for n, w in wide_id.items():
        slots, (a0, a_l, a_r) = by_node[n]
        for k, (b, _h, _s) in enumerate(slots):
            wb[w, 0 + k] = lo[b, 0]
            wb[w, 4 + k] = lo[b, 1]
            wb[w, 8 + k] = lo[b, 2]
            wb[w, 12 + k] = hi[b, 0]
            wb[w, 16 + k] = hi[b, 1]
            wb[w, 20 + k] = hi[b, 2]
            wt[w, k] = leaf_code(b) if npr[b] > 0 else wide_id[b]
        halves = [[k for k, (_b, h, _s) in enumerate(slots) if h == 0],
                  [k for k, (_b, h, _s) in enumerate(slots) if h == 1]]
        for o in range(8):
            horder = (1, 0) if (o >> a0) & 1 else (0, 1)
            perm = []
            for h in horder:
                ks = halves[h]
                if len(ks) == 2:
                    ah = a_l if h == 0 else a_r
                    perm += [ks[1], ks[0]] if (o >> ah) & 1 else ks
                else:
                    perm += ks
            packed = len(perm) << 8
            for j, s in enumerate(perm):
                packed |= s << (2 * j)
            wo[o, w] = packed
    return WideBVH(wb, wt, wo)


class WideTreeletPack(NamedTuple):
    wbounds: jnp.ndarray  # (K, NWmax, 32) f32
    wtarg: jnp.ndarray    # (K, NWmax, 4) i32
    worder: jnp.ndarray   # (K, 8, NWmax) i32
    leafs: jnp.ndarray    # (K, Lmax, LEAF_SIZE*9) f32
    tid: jnp.ndarray      # (K, Lmax, LEAF_SIZE) i32
    # Quantized node records (kernel v3): word k in 0..5 packs the four
    # slots' uint8-quantized component k ([lox loy loz hix hiy hiz],
    # byte s = slot s) against the treelet frame; words 6/7 pack the four
    # slot targets as int16 pairs.  9 scalar loads/node (vs 29 unpacked);
    # quantization rounds lo down / hi up, so boxes only ever GROW —
    # traversal may visit a few extra nodes, hits are identical.
    qbounds: jnp.ndarray = None  # (K, NWmax, 8) i32
    qframe: jnp.ndarray = None   # (K, 1, 8) f32: [lo.xyz, scale.xyz, 0, 0]


def treelet_slices(off, npr, cap):
    """Cut the binary DFS tree into <=cap-prim subtrees; returns a list of
    (root, end, leaf_row_lo, leaf_row_hi).  Shared by the binary treelet
    pack (ops/pallas_bvh.build_treelets) and the wide pack."""
    nn = len(off)
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
            stack.append(int(off[node]))
            stack.append(node + 1)
    roots.sort()
    slices = []
    for r in roots:
        e = r + int(ncount[r])
        leaf_off = off[r:e][npr[r:e] > 0]
        row_lo = int(leaf_off.min())
        row_hi = int(leaf_off.max()) + LEAF_SIZE
        slices.append((r, e, row_lo, row_hi))
    return slices


def build_wide_treelets(off, npr, axis, lo, hi, prim_idx, leaf_soa,
                        cap=16384):
    """Treelet-cut BVH4 tables (host, numpy).  Small trees give K=1."""
    off = np.asarray(off, np.int64)
    npr = np.asarray(npr, np.int64)
    slices = treelet_slices(off, npr, cap)
    wides = [collapse_bvh4(off, npr, axis, lo, hi, root=r, row_base=rl)
             for (r, _e, rl, _rh) in slices]
    k_t = len(slices)
    nw_max = max(w.wbounds.shape[0] for w in wides)
    l_max = max(rh - rl for (_r, _e, rl, rh) in slices) // LEAF_SIZE

    wb = np.zeros((k_t, nw_max, 32), np.float32)
    wb[:, :, 0:12] = BIG
    wb[:, :, 12:24] = -BIG
    wt = np.zeros((k_t, nw_max, 4), np.int32)
    wo = np.zeros((k_t, 8, nw_max), np.int32)  # cnt=0 -> untouched pad node
    leafs = np.zeros((k_t, l_max, LEAF_SIZE * 9), np.float32)
    tid = np.full((k_t, l_max, LEAF_SIZE), -1, np.int32)
    prim_idx = np.asarray(prim_idx)
    leaf_soa = np.asarray(leaf_soa)
    qb = np.zeros((k_t, nw_max, 8), np.int32)
    qf = np.zeros((k_t, 1, 8), np.float32)
    for kk, ((_r, _e, rl, rh), w) in enumerate(zip(slices, wides)):
        m = w.wbounds.shape[0]
        wb[kk, :m] = w.wbounds
        wt[kk, :m] = w.wtarg
        wo[kk, :, :m] = w.worder
        nl = (rh - rl) // LEAF_SIZE
        leafs[kk, :nl] = leaf_soa[rl:rh].reshape(nl, LEAF_SIZE * 9)
        tid[kk, :nl] = prim_idx[rl:rh].reshape(nl, LEAF_SIZE)
        qbk, qfk = _quantize_wide(w)
        qb[kk, :qbk.shape[0]] = qbk
        qf[kk] = qfk
    return WideTreeletPack(jnp.asarray(wb), jnp.asarray(wt), jnp.asarray(wo),
                           jnp.asarray(leafs), jnp.asarray(tid),
                           jnp.asarray(qb), jnp.asarray(qf))


def _quantize_wide(w: WideBVH, nw_pad=None):
    """uint8-quantize a treelet's slot bounds against its own frame and
    pack them + int16 targets into (NW, 8) i32 records (see
    WideTreeletPack.qbounds)."""
    wb, wt = w.wbounds, w.wtarg
    nw = wb.shape[0] if nw_pad is None else nw_pad
    valid = wb[:, 0:4] < BIG / 2  # (nw0, 4) real slots
    lo_cols = wb[:, 0:12].reshape(-1, 3, 4)
    hi_cols = wb[:, 12:24].reshape(-1, 3, 4)
    f_lo = np.array([lo_cols[:, k][valid].min() if valid.any() else 0.0
                     for k in range(3)], np.float32)
    f_hi = np.array([hi_cols[:, k][valid].max() if valid.any() else 1.0
                     for k in range(3)], np.float32)
    scale = np.maximum((f_hi - f_lo) / 255.0, 1e-12).astype(np.float32)
    qb = np.zeros((nw, 8), np.int32)
    for k in range(3):  # lo components: round DOWN
        b = np.where(valid, wb[:, 4 * k:4 * k + 4], f_lo[k])
        q = np.floor((b - f_lo[k]) / scale[k])
        q = np.clip(np.where(valid, q, 255), 0, 255).astype(np.int64)
        qb[:q.shape[0], k] = (q[:, 0] | (q[:, 1] << 8) | (q[:, 2] << 16)
                              | (q[:, 3] << 24)).astype(np.int64).astype(
                                  np.uint32).view(np.int32)
    for k in range(3):  # hi components: round UP
        b = np.where(valid, wb[:, 12 + 4 * k:16 + 4 * k], f_lo[k])
        q = np.ceil((b - f_lo[k]) / scale[k])
        q = np.clip(np.where(valid, q, 0), 0, 255).astype(np.int64)
        qb[:q.shape[0], 3 + k] = (q[:, 0] | (q[:, 1] << 8) | (q[:, 2] << 16)
                                  | (q[:, 3] << 24)).astype(np.int64).astype(
                                      np.uint32).view(np.int32)
    assert np.abs(wt).max(initial=0) < 32767, "targets overflow int16 pack"
    t16 = wt.astype(np.int64) & 0xFFFF
    qb[:wt.shape[0], 6] = (t16[:, 0] | (t16[:, 1] << 16)).astype(
        np.uint32).view(np.int32)
    qb[:wt.shape[0], 7] = (t16[:, 2] | (t16[:, 3] << 16)).astype(
        np.uint32).view(np.int32)
    qf = np.zeros((1, 8), np.float32)
    qf[0, 0:3] = f_lo
    qf[0, 3:6] = scale
    return qb, qf


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _safe_inv(v):
    tiny = jnp.where(v < 0, -1e-20, 1e-20)
    return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)


def _slot_want(wb_ref, nid, s, o, inv, t_best):
    """Vector slab test of slot s of wide node nid against the block.
    Bounds are direct scalar VMEM loads (never vector-register extracts).
    Same test as ops/pallas_bvh._slab_want incl. the live-lane t_best>0
    term (dead lanes carry t_max = 0)."""
    lox = wb_ref[nid, 0 + s]
    loy = wb_ref[nid, 4 + s]
    loz = wb_ref[nid, 8 + s]
    hix = wb_ref[nid, 12 + s]
    hiy = wb_ref[nid, 16 + s]
    hiz = wb_ref[nid, 20 + s]
    return _slab6(lox, loy, loz, hix, hiy, hiz, o, inv, t_best)


def _slab6(lox, loy, loz, hix, hiy, hiz, o, inv, t_best):
    o_x, o_y, o_z = o
    inv_x, inv_y, inv_z = inv
    tx0 = (lox - o_x) * inv_x
    tx1 = (hix - o_x) * inv_x
    ty0 = (loy - o_y) * inv_y
    ty1 = (hiy - o_y) * inv_y
    tz0 = (loz - o_z) * inv_z
    tz1 = (hiz - o_z) * inv_z
    tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                 jnp.minimum(ty0, ty1)),
                     jnp.minimum(tz0, tz1))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                 jnp.maximum(ty0, ty1)),
                     jnp.maximum(tz0, tz1)) * (1.0 + 2.0 * 7.2e-7)
    return (tn <= tf) & (tf > 0) & (tn < t_best) & (t_best > 0)


def _make_wide_kernel(nw, occlusion=False, wp=WP, wlq=WLQ, sub=SUB,
                      quant=False, debug=False, ileaf=ILEAF):
    """Wide packet kernel factory; nw = node count (worder row stride).

    Round structure (v2): best-hit state lives in VMEM scratch refs so the
    while_loop carries only three scalars; the leaf phase and the node
    phase are each gated by lax.cond, so a round with nothing to do on one
    side pays nothing for it — in particular leaf-drain rounds skip the
    node phase's vector->scalar sync entirely.  All per-slot want bits
    (plus the live-lane flag) pack into 28-bit groups -> ONE weighted-sum
    sync per node round for wp <= 6."""
    n_slots = wp * 4
    GW = 28  # bits per pack group (int32-exact weights; multiple of 4)
    n_groups = (n_slots + 1 + GW - 1) // GW

    def kernel(wb_ref, wt_ref, wo_ref, leafs_ref, tid_ref, oct_ref,
               ox, oy, oz, dx, dy, dz, tmax_ref,
               out0, out1, out2, out3, stack_ref, lstack_ref,
               t_ref, tri_ref, u_ref, v_ref, occ_ref):
        # wo_ref is the flattened (8*NW, 1) per-octant order table.
        # quant: wb_ref is the packed (NW, 8) i32 record table and wt_ref
        # the (1, 8) f32 frame (see WideTreeletPack.qbounds).
        pid = pl.program_id(0)
        if quant:
            qf_lo = [wt_ref[0, k] for k in range(3)]
            qf_sc = [wt_ref[0, 3 + k] for k in range(3)]
        o = (ox[:, :], oy[:, :], oz[:, :])
        d_x, d_y, d_z = dx[:, :], dy[:, :], dz[:, :]
        inv = (_safe_inv(d_x), _safe_inv(d_y), _safe_inv(d_z))
        frame = _shear_frame(d_x, d_y, d_z)
        obase = oct_ref[pid, 0] * nw
        tm0 = tmax_ref[:, :]

        wvec = (jnp.int32(1) << jax.lax.broadcasted_iota(
            jnp.int32, (1, GW), 1))

        t_ref[:, :] = tm0
        tri_ref[:, :] = jnp.full((sub, LANE), -1, jnp.int32)
        u_ref[:, :] = jnp.zeros((sub, LANE), jnp.float32)
        v_ref[:, :] = jnp.zeros((sub, LANE), jnp.float32)
        occ_ref[:, :] = jnp.zeros((sub, LANE), jnp.int32)

        def live_t_now():
            if occlusion:
                return jnp.where(occ_ref[:, :] == 0, tm0, 0.0)
            return t_ref[:, :]

        def leaf_phase(lsp):
            lpops = []
            for j in range(wlq):
                idx = lsp - 1 - j
                ok = idx >= 0
                li = lstack_ref[jnp.maximum(idx, 0)]
                lpops.append((jnp.maximum(li, 0), ok))
            nlpop = lpops[0][1].astype(jnp.int32)
            for j in range(1, wlq):
                nlpop = nlpop + lpops[j][1].astype(jnp.int32)

            live_t = live_t_now()
            if occlusion:
                occ = occ_ref[:, :]
                for li, ok in lpops:
                    lr = leafs_ref[li, :]
                    tr = tid_ref[li, :]
                    for tid_s, t, _u, _v, geo in _leaf_tests(
                            lr, tr, o[0], o[1], o[2], frame, live_t):
                        occ = jnp.where(ok & geo & (t < live_t), 1, occ)
                occ_ref[:, :] = occ
            else:
                t_best = live_t
                tri_b, u_b, v_b = tri_ref[:, :], u_ref[:, :], v_ref[:, :]
                for li, ok in lpops:
                    lr = leafs_ref[li, :]
                    tr = tid_ref[li, :]
                    for tid_s, t, u, v, geo in _leaf_tests(
                            lr, tr, o[0], o[1], o[2], frame, t_best):
                        valid = ok & geo & (t < t_best)
                        t_best = jnp.where(valid, t, t_best)
                        tri_b = jnp.where(valid, tid_s, tri_b)
                        u_b = jnp.where(valid, u, u_b)
                        v_b = jnp.where(valid, v, v_b)
                t_ref[:, :] = t_best
                tri_ref[:, :] = tri_b
                u_ref[:, :] = u_b
                v_ref[:, :] = v_b
            return lsp - nlpop

        def node_phase(args):
            sp, lsp = args
            pops = []
            for j in range(wp):
                idx = sp - 1 - j
                ok = (idx >= 0) & ((j == 0) | (sp <= HIGH_WATER))
                nid = stack_ref[jnp.maximum(idx, 0)]
                pops.append((jnp.maximum(nid, 0), ok))
            npop = pops[0][1].astype(jnp.int32)
            for j in range(1, wp):
                npop = npop + pops[j][1].astype(jnp.int32)
            sp = sp - npop

            live_t = live_t_now()
            cols = []
            ntg = {}
            for p, (nid, _ok) in enumerate(pops):
                if quant:
                    qw = [wb_ref[nid, k] for k in range(6)]
                    t01 = wb_ref[nid, 6]
                    t23 = wb_ref[nid, 7]
                    ntg[p] = [(t01 << 16) >> 16, t01 >> 16,
                              (t23 << 16) >> 16, t23 >> 16]
                for sl in range(4):
                    if quant:
                        b6 = [qf_lo[k % 3] + ((qw[k] >> (8 * sl)) & 255)
                              .astype(jnp.float32) * qf_sc[k % 3]
                              for k in range(6)]
                        w = _slab6(*b6, o, inv, live_t)
                    else:
                        w = _slot_want(wb_ref, nid, sl, o, inv, live_t)
                    cols.append(jnp.any(w, axis=1, keepdims=True)
                                .astype(jnp.float32))
            # extra column: any live lane at all (occlusion early-out)
            cols.append(jnp.any(live_t > 0, axis=1, keepdims=True)
                        .astype(jnp.float32))
            gbits = []
            for g in range(n_groups):
                gcols = cols[GW * g:GW * (g + 1)]
                mat = jnp.concatenate(gcols, axis=1)
                colsum = jnp.sum(mat, axis=0, keepdims=True)
                gbits.append(jnp.sum(
                    jnp.where(colsum > 0, wvec[:, :len(gcols)], 0)))

            lg, lb = divmod(n_slots, GW)
            any_live = ((gbits[lg] >> lb) & 1) == 1

            for p, (nid, ok) in enumerate(pops):
                order = wo_ref[obase + nid, 0]
                cnt = (order >> 8) & 15
                # static-minor scalar loads (Mosaic cannot index the minor
                # dim dynamically); traced slot s selects among them
                tg = ntg[p] if quant else [wt_ref[nid, k] for k in range(4)]
                bits_p = gbits[(4 * p) // GW] >> ((4 * p) % GW)
                for j in range(3, -1, -1):  # far to near
                    sl = (order >> (2 * j)) & 3
                    wanted = ((bits_p >> sl) & 1) == 1
                    act = ok & (j < cnt) & wanted & any_live
                    tgt = jnp.where(
                        sl == 0, tg[0],
                        jnp.where(sl == 1, tg[1],
                                  jnp.where(sl == 2, tg[2], tg[3])))
                    is_leaf = tgt < 0
                    push_n = act & ~is_leaf
                    push_l = act & is_leaf
                    cur_sp = jnp.minimum(sp, STACK - 1)
                    cur_lsp = jnp.minimum(lsp, LSTACK - 1)

                    @pl.when(push_n)
                    def _(tgt=tgt, cur_sp=cur_sp):
                        stack_ref[cur_sp] = tgt

                    if ileaf:
                        # inline leaf test at the parent: no queue, no
                        # leaf rounds — the branch only executes when the
                        # leaf is actually wanted
                        @pl.when(push_l)
                        def _(tgt=tgt):
                            li = jnp.maximum(-tgt - 1, 0)
                            lr = leafs_ref[li, :]
                            tr = tid_ref[li, :]
                            if occlusion:
                                lt = jnp.where(occ_ref[:, :] == 0, tm0, 0.0)
                                occ2 = occ_ref[:, :]
                                for tid_s, t, _u, _v, geo in _leaf_tests(
                                        lr, tr, o[0], o[1], o[2], frame,
                                        lt):
                                    occ2 = jnp.where(geo & (t < lt), 1,
                                                     occ2)
                                occ_ref[:, :] = occ2
                            else:
                                tb = t_ref[:, :]
                                trb = tri_ref[:, :]
                                ub2 = u_ref[:, :]
                                vb2 = v_ref[:, :]
                                for tid_s, t, uu, vv, geo in _leaf_tests(
                                        lr, tr, o[0], o[1], o[2], frame,
                                        tb):
                                    ok2 = geo & (t < tb)
                                    tb = jnp.where(ok2, t, tb)
                                    trb = jnp.where(ok2, tid_s, trb)
                                    ub2 = jnp.where(ok2, uu, ub2)
                                    vb2 = jnp.where(ok2, vv, vb2)
                                t_ref[:, :] = tb
                                tri_ref[:, :] = trb
                                u_ref[:, :] = ub2
                                v_ref[:, :] = vb2
                    else:
                        @pl.when(push_l)
                        def _(tgt=tgt, cur_lsp=cur_lsp):
                            lstack_ref[cur_lsp] = -tgt - 1

                        lsp = lsp + push_l.astype(jnp.int32)

                    sp = sp + push_n.astype(jnp.int32)

            if occlusion:
                # whole-block early-out: every lane occluded/dead
                sp = jnp.where(any_live, sp, 0)
                lsp = jnp.where(any_live, lsp, 0)
            return sp, lsp

        def round_body(c):
            sp, lsp, step, nlr, nnr = c
            nlr = nlr + (lsp > 0).astype(jnp.int32)
            lsp = jax.lax.cond(lsp > 0, leaf_phase, lambda x: x, lsp)
            # leaf-drain throttle: above L_HIGH_WATER only leaves run, so
            # the queue cannot overflow (a node round adds <= wp*4)
            do_node = (sp > 0) & (lsp <= L_HIGH_WATER)
            nnr = nnr + do_node.astype(jnp.int32)
            sp, lsp = jax.lax.cond(do_node, node_phase, lambda a: a,
                                   (sp, lsp))
            return sp, lsp, step + 1, nlr, nnr

        def cond(c):
            sp, lsp = c[0], c[1]
            return ((sp > 0) | (lsp > 0)) & (c[2] < MAX_ROUNDS)

        stack_ref[0] = 0
        _sp, _lsp, steps, nlr, nnr = jax.lax.while_loop(
            cond, round_body,
            (jnp.int32(1), jnp.int32(0), jnp.int32(0), jnp.int32(0),
             jnp.int32(0)))
        if debug:
            # diagnostic outputs: u <- total rounds, v <- node rounds,
            # t <- leaf rounds (per block, broadcast)
            u_ref[:, :] = jnp.full((sub, LANE), steps, jnp.int32)\
                .astype(jnp.float32)
            v_ref[:, :] = jnp.full((sub, LANE), nnr, jnp.int32)\
                .astype(jnp.float32)
            t_ref[:, :] = jnp.full((sub, LANE), nlr, jnp.int32)\
                .astype(jnp.float32)
        if occlusion:
            out0[:, :] = occ_ref[:, :]
            out1[:, :] = t_ref[:, :]
            out2[:, :] = u_ref[:, :]
            out3[:, :] = v_ref[:, :]
        else:
            out0[:, :] = t_ref[:, :]
            out1[:, :] = tri_ref[:, :]
            out2[:, :] = u_ref[:, :]
            out3[:, :] = v_ref[:, :]

    return kernel


def _block_octants(d, nb, n, sub):
    d0 = d[jnp.minimum(jnp.arange(nb, dtype=jnp.int32) * (sub * LANE),
                       n - 1)]
    oct_b = ((d0[:, 0] < 0).astype(jnp.int32)
             | ((d0[:, 1] < 0).astype(jnp.int32) << 1)
             | ((d0[:, 2] < 0).astype(jnp.int32) << 2))
    return oct_b[:, None]  # SMEM scalars must be 2D


def _pad_rays(o, d, t_max, n, n_pad, nb, sub):
    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,) + x.shape[1:], fill, x.dtype)])

    shape2 = (nb * sub, LANE)
    ox = pad(o[:, 0]).reshape(shape2)
    oy = pad(o[:, 1]).reshape(shape2)
    oz = pad(o[:, 2]).reshape(shape2)
    dx = pad(d[:, 0], 1.0).reshape(shape2)
    dy = pad(d[:, 1], 1.0).reshape(shape2)
    dz = pad(d[:, 2], 1.0).reshape(shape2)
    tm = pad(jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32),
             -1.0).reshape(shape2)
    return ox, oy, oz, dx, dy, dz, tm, shape2


@functools.partial(jax.jit,
                   static_argnames=("interpret", "wp", "wlq", "sub",
                                    "quant", "debug", "ileaf"))
def wide_closest_hit(wb, wt, wo, leafs, tid, o, d, t_max, *, interpret=True,
                     wp=WP, wlq=WLQ, sub=SUB, quant=False, debug=False,
                     ileaf=ILEAF):
    """Closest hit for N rays via the wide packet kernel.  With quant,
    wb/wt are the packed (NW,8) i32 records / (1,8) f32 frame.
    Returns (t, tri, u, v): tri == -1 where no hit."""
    n = o.shape[0]
    blk = sub * LANE
    n_pad = ((n + blk - 1) // blk) * blk
    nb = n_pad // blk
    nw = wb.shape[0]
    ox, oy, oz, dx, dy, dz, tm, shape2 = _pad_rays(o, d, t_max, n, n_pad,
                                                   nb, sub)
    oct_b = _block_octants(d, nb, n, sub)

    ray_spec = pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    oct_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    t, tri, u, v = pl.pallas_call(
        _make_wide_kernel(nw, wp=wp, wlq=wlq, sub=sub, quant=quant,
                          debug=debug, ileaf=ileaf),
        grid=(nb,),
        in_specs=[table_spec] * 5 + [oct_spec] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.int32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((LSTACK,), jnp.int32),
                        pltpu.VMEM((sub, LANE), jnp.float32),
                        pltpu.VMEM((sub, LANE), jnp.int32),
                        pltpu.VMEM((sub, LANE), jnp.float32),
                        pltpu.VMEM((sub, LANE), jnp.float32),
                        pltpu.VMEM((sub, LANE), jnp.int32)],
        interpret=interpret,
    )(wb, wt, wo.reshape(-1, 1), leafs, tid, oct_b,
      ox, oy, oz, dx, dy, dz, tm)
    return (t.reshape(-1)[:n], tri.reshape(-1)[:n],
            u.reshape(-1)[:n], v.reshape(-1)[:n])


@functools.partial(jax.jit,
                   static_argnames=("interpret", "wp", "wlq", "sub",
                                    "quant", "ileaf"))
def wide_any_hit(wb, wt, wo, leafs, tid, o, d, t_max, *, interpret=True,
                 wp=WP, wlq=WLQ, sub=SUB, quant=False, ileaf=ILEAF):
    """Occlusion for N rays via the wide packet kernel; returns bool (N,)."""
    n = o.shape[0]
    blk = sub * LANE
    n_pad = ((n + blk - 1) // blk) * blk
    nb = n_pad // blk
    nw = wb.shape[0]
    ox, oy, oz, dx, dy, dz, tm, shape2 = _pad_rays(o, d, t_max, n, n_pad,
                                                   nb, sub)
    oct_b = _block_octants(d, nb, n, sub)

    ray_spec = pl.BlockSpec((sub, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    oct_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    occ = pl.pallas_call(
        _make_wide_kernel(nw, occlusion=True, wp=wp, wlq=wlq, sub=sub,
                          quant=quant, ileaf=ileaf),
        grid=(nb,),
        in_specs=[table_spec] * 5 + [oct_spec] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct(shape2, jnp.int32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((LSTACK,), jnp.int32),
                        pltpu.VMEM((sub, LANE), jnp.float32),
                        pltpu.VMEM((sub, LANE), jnp.int32),
                        pltpu.VMEM((sub, LANE), jnp.float32),
                        pltpu.VMEM((sub, LANE), jnp.float32),
                        pltpu.VMEM((sub, LANE), jnp.int32)],
        interpret=interpret,
    )(wb, wt, wo.reshape(-1, 1), leafs, tid, oct_b,
      ox, oy, oz, dx, dy, dz, tm)[0]
    return occ.reshape(-1)[:n] > 0


# ---------------------------------------------------------------------------
# Treelet chaining (lax.scan — one kernel instance per cast site)
# ---------------------------------------------------------------------------

def _tl_tables(tl: WideTreeletPack, quant):
    if quant and tl.qbounds is not None:
        return tl.qbounds, tl.qframe
    return tl.wbounds, tl.wtarg


def wtreelet_closest_hit(tl: WideTreeletPack, o, d, t_max, *,
                         interpret=True, wp=WP, wlq=WLQ, sub=SUB,
                         quant=False, ileaf=ILEAF):
    n = o.shape[0]
    quant = quant and tl.qbounds is not None
    wbs, wts = _tl_tables(tl, quant)
    t0 = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    if tl.wbounds.shape[0] == 1:
        return wide_closest_hit(wbs[0], wts[0], tl.worder[0],
                                tl.leafs[0], tl.tid[0], o, d, t0,
                                interpret=interpret, wp=wp, wlq=wlq, sub=sub,
                                quant=quant, ileaf=ileaf)
    init = (t0, jnp.full((n,), -1, jnp.int32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))

    def step(carry, tables):
        t, tri, u, v = carry
        wb, wt, wo, leafs, tid = tables
        tk, trik, uk, vk = wide_closest_hit(wb, wt, wo, leafs, tid,
                                            o, d, t, interpret=interpret,
                                            wp=wp, wlq=wlq, sub=sub,
                                            quant=quant, ileaf=ileaf)
        imp = trik >= 0
        return (jnp.where(imp, tk, t), jnp.where(imp, trik, tri),
                jnp.where(imp, uk, u), jnp.where(imp, vk, v)), None

    (t, tri, u, v), _ = jax.lax.scan(
        step, init, (wbs, wts, tl.worder, tl.leafs, tl.tid))
    return t, tri, u, v


def wtreelet_any_hit(tl: WideTreeletPack, o, d, t_max, *, interpret=True,
                     wp=WP, wlq=WLQ, sub=SUB, quant=False, ileaf=ILEAF):
    n = o.shape[0]
    quant = quant and tl.qbounds is not None
    wbs, wts = _tl_tables(tl, quant)
    t = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    if tl.wbounds.shape[0] == 1:
        return wide_any_hit(wbs[0], wts[0], tl.worder[0],
                            tl.leafs[0], tl.tid[0], o, d, t,
                            interpret=interpret, wp=wp, wlq=wlq, sub=sub,
                            quant=quant, ileaf=ileaf)

    def step(occ, tables):
        wb, wt, wo, leafs, tid = tables
        occ_k = wide_any_hit(wb, wt, wo, leafs, tid, o, d,
                             jnp.where(occ, 0.0, t), interpret=interpret,
                             wp=wp, wlq=wlq, sub=sub, quant=quant,
                             ileaf=ileaf)
        return occ | occ_k, None

    occ, _ = jax.lax.scan(step, jnp.zeros((n,), bool),
                          (wbs, wts, tl.worder, tl.leafs, tl.tid))
    return occ


# ---------------------------------------------------------------------------
# Production entry points (coherence sort + kernel; TriHit interface)
# ---------------------------------------------------------------------------

def _env_wp():
    import os
    return int(os.environ.get("GNX_WBVH_WP", WP))


def _env_wlq():
    import os
    return int(os.environ.get("GNX_WBVH_WLQ", WLQ))


def _env_sub():
    import os
    return int(os.environ.get("GNX_WBVH_SUB", SUB))


def _env_quant():
    import os
    return os.environ.get("GNX_WBVH_Q", "1") != "0"


def _env_ileaf():
    import os
    return os.environ.get("GNX_WBVH_ILEAF", "1" if ILEAF else "0") != "0"


def wide_closest_hit_pallas(bvh, o, d, t_max, sort=True, interpret=False,
                            sort_key="oct_morton"):
    """Production wide-BVH closest hit; mirrors
    ops/pallas_bvh._packet_closest_hit_pallas_1.

    The coherence permutation is applied as ONE packed (N, 8) row gather
    (and the inverse as one (N, 4) row gather) instead of 7 + 4 per-array
    element gathers: TPU gathers pay per ROW, so packing the ray record
    into one row cuts the permute traffic's fixed cost ~7x (PERF.md r3
    measured sort+gather at ~0.36 s per 1M-ray cast; argsort itself is
    ~26 ms)."""
    from .bvh import ray_sort_perm
    from .intersect import TriHit

    n = o.shape[0]
    t_max = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    if sort:
        perm, inv = ray_sort_perm(o, d, bvh.bounds_lo[0], bvh.bounds_hi[0],
                                  t_max=t_max, key_mode=sort_key)
        packed = jnp.concatenate([o, d, t_max[:, None]], axis=1)[perm]
        o, d, t_max = packed[:, 0:3], packed[:, 3:6], packed[:, 6]
    t, tri, u, v = wtreelet_closest_hit(bvh.wtreelets, o, d, t_max,
                                        interpret=interpret,
                                        wp=_env_wp(), wlq=_env_wlq(),
                                        sub=_env_sub(), quant=_env_quant(),
                                        ileaf=_env_ileaf())
    if sort:
        outp = jnp.stack([t, tri.astype(jnp.float32), u, v], axis=1)[inv]
        t, u, v = outp[:, 0], outp[:, 2], outp[:, 3]
        tri = outp[:, 1].astype(jnp.int32)
    hit = tri >= 0
    b = jnp.stack([1.0 - u - v, u, v], axis=-1)
    return TriHit(hit=hit, t=jnp.where(hit, t, INFINITY),
                  tri=jnp.maximum(tri, 0), b=b)


def wide_any_hit_pallas(bvh, o, d, t_max, sort=True, interpret=False,
                        sort_key="oct_morton"):
    """Production wide-BVH occlusion query (packed-row permutes — see
    wide_closest_hit_pallas)."""
    from .bvh import ray_sort_perm

    n = o.shape[0]
    t_max = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    if sort:
        perm, inv = ray_sort_perm(o, d, bvh.bounds_lo[0], bvh.bounds_hi[0],
                                  t_max=t_max, key_mode=sort_key)
        packed = jnp.concatenate([o, d, t_max[:, None]], axis=1)[perm]
        o, d, t_max = packed[:, 0:3], packed[:, 3:6], packed[:, 6]
    occ = wtreelet_any_hit(bvh.wtreelets, o, d, t_max, interpret=interpret,
                           wp=_env_wp(), wlq=_env_wlq(), sub=_env_sub(),
                           quant=_env_quant(), ileaf=_env_ileaf())
    if sort:
        occ = occ[inv]
    return occ
