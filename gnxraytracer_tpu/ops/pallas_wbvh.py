"""Pallas TPU kernel: WIDE (BVH4/8/16) packet traversal with a scalar stack.

Round-4 introduced the wide scalar-stack walk; round 5 rebuilds it around
two findings from the on-chip profile (tools/profile_r5, exp_r5_sweep):

  * The walk is DEPTH-bound, not width-bound: raising the pop width above
    8 measured flat (1426 -> 1405 ms at wp=12) because the DFS frontier
    rarely holds 8 nodes — rounds track the depth of the wanted subtree.
    Wider NODES attack depth directly: a BVH16 node collapses ~4 binary
    levels, so the serial pop->sync->push chain runs ~2x fewer rounds
    than BVH4 for the same wanted set, at the same 32-slab/round vector
    cost (wp=2 pops x 16 slots vs wp=8 x 4).
  * VMEM minor-dim padding made the old layout 5x bigger than its
    payload: any (N, m<=128) array occupies N x 128 lanes, so the
    per-octant order table at (8*NW, 1) int32 burned ~10 MB/treelet —
    the real reason the treelet cap sat at 16k prims.  The round-5 record
    folds bounds, targets, AND all 8 octant orders into ONE (NW, RW<=48)
    int32 row: the fold is free (the row was padded to 128 words anyway)
    and the separate worder table disappears.

Kernel structure (unchanged from round 4 where it measured well):

  * SCALAR STACK, MULTI-POP: block traversal state is a stack of wide
    node ids in SMEM; each round pops up to WP nodes and slab-tests all
    WP*W child slots together (dense VPU work, pipelined scalar loads).
  * ONE SYNC PER POP-GROUP: per-slot "any ray wants it" bits pack into
    <=28-bit groups via one weighted column-sum each; one vector->scalar
    transfer authorizes every push/leaf decision of the round
    (grouping never splits a pop across groups, so the scalar decode of
    slot s of pop p is a static shift).
  * LEAF QUEUE: leaf slots go to a second SMEM queue; each round pops up
    to WLQ leaf rows and runs the statically-unrolled watertight tests
    (ops/pallas_bvh._leaf_tests, shape/Triangle.cpp:71-300 semantics)
    branchlessly under a validity mask.
  * QUANTIZED SLOTS: slot bounds are uint8-quantized against a per-
    treelet frame (lo rounds down / hi up, boxes only GROW -> traversal
    may visit a few extra nodes, hits are identical).  Empty slots
    quantize to a zero-volume corner box and carry target 0 (no real slot
    may target the root), so pushes mask on tgt != 0 — no per-node slot
    count is stored or consulted.

Ordering: per-octant near-first slot order is precomputed at build by a
near-child-first DFS of each wide node's expansion tree (the wide
generalization of the binary dirIsNeg rule,
accelerator/BVHAccel.cpp:678-690); pushes go far-to-near so LIFO pops
visit near subtrees first and early t_best tightening prunes far ones.

Meshes above the treelet cap run a lax.scan over per-treelet kernel
instances (one compiled kernel per cast site).
"""

import functools
import heapq
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import INFINITY
from .pallas_bvh import LEAF_SIZE, _leaf_tests, _shear_frame

SUB = 16        # sublanes per ray block (2048 rays; sub=8/32 measured
                # worse on the r5 sweep: divergence beats amortization)
LANE = 128
BLOCK = SUB * LANE

WIDTH = 8       # node width (slots); 4/8/16 supported.  8 measured best
                # on the r5 envmesh sweeps (1M incoherent bounce cast:
                # w8 1198 ms vs w4 1231 vs w16 1322).
WLQ = 8         # leaf rows tested per round
WAVES = 1       # independent sub-blocks traversed per grid step.  >1
                # interleaves waves inside one round loop hoping to hide
                # the want-bit sync stall under the other wave's vector
                # work — measured WORSE on chip (1221 -> 1405 ms at
                # waves=2: the walk is throughput-bound, not
                # latency-bound, and the fused node phase pays both
                # waves' vector work through every tail round).  Kept as
                # a knob (GNX_WBVH_WAVES) with the negative result.
STACK = 1024    # SMEM node-stack entries (4 KB)
LSTACK = 1024   # SMEM leaf-queue entries (4 KB)
# LIFO multi-pop keeps the frontier near-DFS, but a pathological block can
# still grow it; above HIGH_WATER rounds pop only 1 node (pure DFS drains,
# bound HIGH_WATER + (W-1)*depth << STACK)
HIGH_WATER = STACK - 256
# a round can push up to WP*W leaves but pops only WLQ; above L_HIGH_WATER
# node pops pause so the queue drains (bound L_HIGH_WATER + WP*W < LSTACK)
L_HIGH_WATER = LSTACK - 192
MAX_ROUNDS = 65536
GW = 28         # max want-bits per packed sync group (int32-exact weights)


def _wp_default(width):
    return max(1, 32 // width)  # keep ~32 slab tests per round


def _rec_words(width):
    """(bound words, target words, order words/octant, record width)."""
    nbw = 6 * (width // 4)       # 6 components x width slots, 4 bytes/word
    ntw = width // 2             # int16 target pairs
    obits = {4: 2, 8: 3, 16: 4}[width]
    owords = (width * obits + 31) // 32
    return nbw, ntw, owords, nbw + ntw + 8 * owords


# ---------------------------------------------------------------------------
# Host build: binary SAH arrays -> width-W node records
# ---------------------------------------------------------------------------

BIG = np.float32(3.0e38)


def _expand_wide(n, off, npr, pcount, width):
    """Expand the binary interior node n into <= width slots, SHALLOWEST
    first (BFS by depth; prim count breaks ties within a level).  BFS
    guarantees every path through the node advances uniformly — a
    width-16 node advances ~4 binary levels along EVERY hot path, which
    is what cuts the depth-bound round count (a largest-subtree-first
    expansion was measured to leave skewed 1-2-level paths that kept the
    visit count at BVH4 levels).  Returns (kids, slots): kids maps each
    expanded binary node to its (left, right) children; slots = the
    expansion leaves in canonical (octant-0 DFS) order."""
    kids = {}
    heap = [(0, -int(pcount[n]), n)]
    cnt = 1
    while heap and cnt + 1 <= width:
        dep, _, b = heapq.heappop(heap)
        l, r = b + 1, int(off[b])
        kids[b] = (l, r)
        cnt += 1
        for c in (l, r):
            if npr[c] == 0:
                heapq.heappush(heap, (dep + 1, -int(pcount[c]), c))

    def dfs(b, out):
        if b in kids:
            l, r = kids[b]
            dfs(l, out)
            dfs(r, out)
        else:
            out.append(b)

    slots = []
    dfs(n, slots)
    return kids, slots


def _octant_orders(n, kids, slots, axis, width):
    """Per-octant near-first slot permutations for one wide node.
    Returns (8, width) slot indices; tail positions past the real slot
    count repeat an EMPTY slot index when one exists (empty slots can
    never be wanted) or are unused (full node: every j is real)."""
    pos = {b: i for i, b in enumerate(slots)}
    perms = np.zeros((8, width), np.int64)
    for o in range(8):
        order = []

        def dfs(b):
            if b in kids:
                l, r = kids[b]
                a = int(axis[b])
                near, far = (r, l) if (o >> a) & 1 else (l, r)
                dfs(near)
                dfs(far)
            else:
                order.append(pos[b])

        dfs(n)
        pad = len(order) if len(order) < width else 0
        perms[o] = order + [pad] * (width - len(order))
    return perms


class WideTreeletPack(NamedTuple):
    """Treelet-cut wide-BVH tables (device arrays, K treelets).

    rec: (K, NWmax, RW) i32 — ONE row per wide node holding everything
      the kernel reads: words [0, nbw) = uint8-quantized slot bounds
      (word k*(W/4)+s//4 byte s%4 = component k of slot s; components
      [lox loy loz hix hiy hiz], lo floored / hi ceiled against the
      treelet frame); words [nbw, nbw+W/2) = int16 slot-target pairs
      (>=0 wide child id, <0 leaf row code -(row/LEAF_SIZE+1), empty 0);
      words [nbw+W/2, RW) = 8 per-octant near-first orders, `obits` bits
      per slot position, far slots at high positions.
    frame: (K, 1, 8) f32 — [lo.xyz, scale.xyz, 0, 0] dequantization frame.
    leafs: (K, Lmax, LEAF_SIZE*9) f32 packed leaf triangle rows.
    tid:   (K, Lmax, LEAF_SIZE) i32 triangle ids (-1 pad).
    """
    rec: jnp.ndarray
    frame: jnp.ndarray
    leafs: jnp.ndarray
    tid: jnp.ndarray

    @property
    def width(self):
        rw = self.rec.shape[-1]
        return {16: 4, 24: 8, 48: 16}[rw]


def collapse_bvhw(off, npr, axis, lo, hi, width, root=0, row_base=0,
                  pcount=None):
    """Collapse the binary DFS subtree at `root` into width-W node arrays.

    off/npr/axis/lo/hi: the global binary arrays (ops/bvh layout: interior
    node n has children n+1 and off[n]; leaf n covers LEAF_SIZE-aligned
    rows starting at off[n]).  row_base rebases leaf-row codes (treelets).
    Returns (bounds (NW, 6, W) f32, targ (NW, W) i32, perms (NW, 8, W)).
    """
    off = np.asarray(off, np.int64)
    npr = np.asarray(npr, np.int64)
    axis = np.asarray(axis, np.int64)
    if pcount is None:
        pcount = _subtree_prims(off, npr)

    def leaf_code(b):
        return -int((off[b] - row_base) // LEAF_SIZE + 1)

    if npr[root] > 0:
        # degenerate: the subtree is a single leaf -> one node, 1 slot
        bounds = np.zeros((1, 6, width), np.float32)
        bounds[0, 0:3, :] = BIG
        bounds[0, 3:6, :] = -BIG
        bounds[0, 0:3, 0] = lo[root]
        bounds[0, 3:6, 0] = hi[root]
        targ = np.zeros((1, width), np.int32)
        targ[0, 0] = leaf_code(root)
        perms = np.zeros((1, 8, width), np.int64)
        perms[:, :, :] = 1 if width > 1 else 0  # pad -> empty slot 1
        perms[:, :, 0] = 0
        return bounds, targ, perms

    wide_id = {root: 0}
    worklist = [root]
    entries = {}
    while worklist:
        n = worklist.pop()
        kids, slots = _expand_wide(n, off, npr, pcount, width)
        for b in slots:
            if npr[b] == 0 and b not in wide_id:
                wide_id[b] = len(wide_id)
                worklist.append(b)
        entries[n] = (kids, slots)
    nw = len(wide_id)
    bounds = np.zeros((nw, 6, width), np.float32)
    bounds[:, 0:3, :] = BIG
    bounds[:, 3:6, :] = -BIG
    targ = np.zeros((nw, width), np.int32)
    perms = np.zeros((nw, 8, width), np.int64)
    for n, w in wide_id.items():
        kids, slots = entries[n]
        for k, b in enumerate(slots):
            bounds[w, 0:3, k] = lo[b]
            bounds[w, 3:6, k] = hi[b]
            targ[w, k] = leaf_code(b) if npr[b] > 0 else wide_id[b]
        perms[w] = _octant_orders(n, kids, slots, axis, width)
    return bounds, targ, perms


def _subtree_prims(off, npr):
    """Per-node total prim count (vectorized level sweep)."""
    nn = len(off)
    frontier = np.array([0], dtype=np.int64)
    levels = []
    while len(frontier):
        levels.append(frontier)
        inner_f = frontier[npr[frontier] == 0]
        frontier = np.concatenate([inner_f + 1, off[inner_f]])
    pcount = np.where(npr > 0, npr, 0).astype(np.int64)
    for lvl in reversed(levels[:-1]):
        inner_l = lvl[npr[lvl] == 0]
        pcount[inner_l] = pcount[inner_l + 1] + pcount[off[inner_l]]
    return pcount


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


def _quantize_pack(bounds, targ, perms, width, nw_pad):
    """Quantize one treelet's (NW, 6, W) slot bounds against its own frame
    and pack bounds + int16 targets + per-octant orders into (nw_pad, RW)
    i32 records (see WideTreeletPack.rec)."""
    nbw, ntw, owords, rw = _rec_words(width)
    nw = bounds.shape[0]
    valid = bounds[:, 0, :] < BIG / 2  # (nw, W) real slots
    f_lo = np.zeros(3, np.float32)
    f_hi = np.ones(3, np.float32)
    if valid.any():
        for k in range(3):
            f_lo[k] = bounds[:, k, :][valid].min()
            f_hi[k] = bounds[:, 3 + k, :][valid].max()
    scale = np.maximum((f_hi - f_lo) / 255.0, 1e-12).astype(np.float32)
    rec = np.zeros((nw_pad, rw), np.int32)

    def pack_bytes(col, q):
        # q: (nw, W) int64 in [0,255] -> words k*(W/4)+s//4, byte s%4
        for w4 in range(width // 4):
            word = (q[:, 4 * w4] | (q[:, 4 * w4 + 1] << 8)
                    | (q[:, 4 * w4 + 2] << 16) | (q[:, 4 * w4 + 3] << 24))
            rec[:nw, col * (width // 4) + w4] = word.astype(
                np.uint32).view(np.int32)

    # Empty slots quantize to a ZERO-VOLUME box at the frame's far corner
    # (lo = hi = 255): the symmetric min/max slab can only "hit" it on an
    # exact corner graze, and even then the push is masked by tgt != 0
    # (slot targets can never be wide node 0 — that is the root).
    for k in range(3):  # lo components: round DOWN
        b = np.where(valid, bounds[:, k, :], f_lo[k])
        q = np.clip(np.floor((b - f_lo[k]) / scale[k]), 0, 255)
        pack_bytes(k, np.where(valid, q, 255).astype(np.int64))
    for k in range(3):  # hi components: round UP
        b = np.where(valid, bounds[:, 3 + k, :], f_lo[k])
        q = np.clip(np.ceil((b - f_lo[k]) / scale[k]), 0, 255)
        pack_bytes(3 + k, np.where(valid, q, 255).astype(np.int64))
    assert np.abs(targ).max(initial=0) < 32767, "targets overflow int16"
    t16 = targ.astype(np.int64) & 0xFFFF
    for s2 in range(ntw):
        rec[:nw, nbw + s2] = (t16[:, 2 * s2] | (t16[:, 2 * s2 + 1] << 16)
                              ).astype(np.uint32).view(np.int32)
    obits = {4: 2, 8: 3, 16: 4}[width]
    for o in range(8):
        packed = np.zeros((nw, owords), np.int64)
        for j in range(width):
            bit = j * obits
            packed[:, bit // 32] |= perms[:, o, j] << (bit % 32)
        for ow in range(owords):
            rec[:nw, nbw + ntw + o * owords + ow] = packed[:, ow].astype(
                np.uint32).view(np.int32)
    frame = np.zeros((1, 8), np.float32)
    frame[0, 0:3] = f_lo
    frame[0, 3:6] = scale
    return rec, frame


def build_wide_treelets(off, npr, axis, lo, hi, prim_idx, leaf_soa,
                        cap=16384, width=None):
    """Treelet-cut wide-BVH records (host, numpy).  Small trees give K=1.
    width defaults to GNX_WBVH_W (16)."""
    if width is None:
        width = int(os.environ.get("GNX_WBVH_W", WIDTH))
    off = np.asarray(off, np.int64)
    npr = np.asarray(npr, np.int64)
    pcount = _subtree_prims(off, npr)
    slices = treelet_slices(off, npr, cap)
    parts = [collapse_bvhw(off, npr, axis, lo, hi, width, root=r,
                           row_base=rl, pcount=pcount)
             for (r, _e, rl, _rh) in slices]
    k_t = len(slices)
    nw_max = max(p[0].shape[0] for p in parts)
    l_max = max(rh - rl for (_r, _e, rl, rh) in slices) // LEAF_SIZE
    _nbw, _ntw, _ow, rw = _rec_words(width)

    rec = np.zeros((k_t, nw_max, rw), np.int32)
    frame = np.zeros((k_t, 1, 8), np.float32)
    leafs = np.zeros((k_t, l_max, LEAF_SIZE * 9), np.float32)
    tid = np.full((k_t, l_max, LEAF_SIZE), -1, np.int32)
    prim_idx = np.asarray(prim_idx)
    leaf_soa = np.asarray(leaf_soa)
    for kk, ((_r, _e, rl, rh), (bounds, targ, perms)) in enumerate(
            zip(slices, parts)):
        rec[kk], frame[kk] = _quantize_pack(bounds, targ, perms, width,
                                            nw_max)
        nl = (rh - rl) // LEAF_SIZE
        leafs[kk, :nl] = leaf_soa[rl:rh].reshape(nl, LEAF_SIZE * 9)
        tid[kk, :nl] = prim_idx[rl:rh].reshape(nl, LEAF_SIZE)
    return WideTreeletPack(jnp.asarray(rec), jnp.asarray(frame),
                           jnp.asarray(leafs), jnp.asarray(tid))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _safe_inv(v):
    tiny = jnp.where(v < 0, -1e-20, 1e-20)
    return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)


def _slab6(lox, loy, loz, hix, hiy, hiz, o, inv, t_best):
    """Vector slab test against the block.  Same test as
    ops/pallas_bvh._slab_want incl. the live-lane t_best>0 term (dead
    lanes carry t_max = 0)."""
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


def _sel_scalar(vals, idx):
    """Select vals[idx] for a traced scalar idx from a static list."""
    r = vals[0]
    for i in range(1, len(vals)):
        r = jnp.where(idx == i, vals[i], r)
    return r


def _make_wide_kernel(width=WIDTH, occlusion=False, wp=None, wlq=WLQ,
                      sub=SUB, debug=False, waves=1):
    """Wide packet kernel factory (see module docstring).

    Round structure: best-hit state lives in VMEM scratch refs so the
    while_loop carries only scalars; the leaf phase and the node phase
    are each gated by lax.cond, so a round with nothing to do on one side
    pays nothing for it.  Want bits pack into per-pop groups (a pop never
    spans groups): one weighted-sum sync per group.

    WAVES (round-5): with waves=N the kernel traverses N INDEPENDENT
    sub-blocks of `sub` sublanes per grid step, interleaved inside one
    round loop.  The per-round serial chain — scalar pops -> issue slab
    vectors -> STALL on the want-bits transfer -> scalar pushes — leaves
    both units idle during the stall; interleaving wave B's slab issue
    between wave A's reduces and A's scalar consumption hides most of
    that latency (the node phase computes every active wave's want
    reduces first, then does all waves' pushes).  Waves share nothing:
    separate SMEM stacks, separate state rows, separate octants."""
    if wp is None:
        wp = _wp_default(width)
    nbw, ntw, owords, _rw = _rec_words(width)
    obits = {4: 2, 8: 3, 16: 4}[width]
    omask = (1 << obits) - 1
    per_g = max(1, GW // width)   # pops per sync group

    def kernel(rec_ref, frame_ref, leafs_ref, tid_ref, oct_ref,
               ox, oy, oz, dx, dy, dz, tmax_ref,
               out0, out1, out2, out3, *scratch):
        stacks = scratch[0:2 * waves:2]
        lstacks = scratch[1:2 * waves:2]
        t_ref, tri_ref, u_ref, v_ref, occ_ref = scratch[2 * waves:]
        pid = pl.program_id(0)
        qf_lo = [frame_ref[0, k] for k in range(3)]
        qf_sc = [frame_ref[0, 3 + k] for k in range(3)]
        rows = [slice(w * sub, (w + 1) * sub) for w in range(waves)]
        o_w = [(ox[rs, :], oy[rs, :], oz[rs, :]) for rs in rows]
        d_w = [(dx[rs, :], dy[rs, :], dz[rs, :]) for rs in rows]
        inv_w = [tuple(_safe_inv(c) for c in dw) for dw in d_w]
        frame_w = [_shear_frame(*dw) for dw in d_w]
        oct_w = [oct_ref[pid, w] for w in range(waves)]
        tm0_w = [tmax_ref[rs, :] for rs in rows]

        t_ref[:, :] = tmax_ref[:, :]
        tri_ref[:, :] = jnp.full((waves * sub, LANE), -1, jnp.int32)
        u_ref[:, :] = jnp.zeros((waves * sub, LANE), jnp.float32)
        v_ref[:, :] = jnp.zeros((waves * sub, LANE), jnp.float32)
        occ_ref[:, :] = jnp.zeros((waves * sub, LANE), jnp.int32)

        def live_t_now(w):
            if occlusion:
                return jnp.where(occ_ref[rows[w], :] == 0, tm0_w[w], 0.0)
            return t_ref[rows[w], :]

        def leaf_phase(w, lsp):
            rs = rows[w]
            lstack_ref = lstacks[w]
            o = o_w[w]
            frame = frame_w[w]
            lpops = []
            for j in range(wlq):
                idx = lsp - 1 - j
                ok = idx >= 0
                li = lstack_ref[jnp.maximum(idx, 0)]
                lpops.append((jnp.maximum(li, 0), ok))
            nlpop = lpops[0][1].astype(jnp.int32)
            for j in range(1, wlq):
                nlpop = nlpop + lpops[j][1].astype(jnp.int32)

            live_t = live_t_now(w)
            if occlusion:
                occ = occ_ref[rs, :]
                for li, ok in lpops:
                    lr = leafs_ref[li, :]
                    tr = tid_ref[li, :]
                    for tid_s, t, _u, _v, geo in _leaf_tests(
                            lr, tr, o[0], o[1], o[2], frame, live_t):
                        occ = jnp.where(ok & geo & (t < live_t), 1, occ)
                occ_ref[rs, :] = occ
            else:
                t_best = live_t
                tri_b = tri_ref[rs, :]
                u_b = u_ref[rs, :]
                v_b = v_ref[rs, :]
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
                t_ref[rs, :] = t_best
                tri_ref[rs, :] = tri_b
                u_ref[rs, :] = u_b
                v_ref[rs, :] = v_b
            return lsp - nlpop

        def _node_pops(w, sp, active):
            stack_ref = stacks[w]
            pops = []
            for j in range(wp):
                idx = sp - 1 - j
                ok = active & (idx >= 0) & ((j == 0) | (sp <= HIGH_WATER))
                nid = stack_ref[jnp.maximum(idx, 0)]
                pops.append((jnp.maximum(nid, 0), ok))
            npop = pops[0][1].astype(jnp.int32)
            for j in range(1, wp):
                npop = npop + pops[j][1].astype(jnp.int32)
            return pops, sp - npop

        def _node_wants(w, pops):
            """Issue the wave's slab tests + want reduces; returns
            (gbits list, live_pos, target-word lists).  No scalar reads
            of vector results happen here — the caller interleaves other
            waves' issues before consuming gbits."""
            o, inv = o_w[w], inv_w[w]
            live_t = live_t_now(w)
            groups = [[] for _ in range((wp + per_g - 1) // per_g)]
            ntg = {}
            for p, (nid, _ok) in enumerate(pops):
                bw = [rec_ref[nid, k] for k in range(nbw)]
                ntg[p] = [rec_ref[nid, nbw + k] for k in range(ntw)]
                for s in range(width):
                    b6 = []
                    for k in range(6):
                        word = bw[k * (width // 4) + s // 4]
                        byte = (word >> (8 * (s % 4))) & 255
                        b6.append(qf_lo[k % 3]
                                  + byte.astype(jnp.float32) * qf_sc[k % 3])
                    wt = _slab6(*b6, o, inv, live_t)
                    groups[p // per_g].append(
                        jnp.any(wt, axis=1, keepdims=True)
                        .astype(jnp.float32))
            live_col = jnp.any(live_t > 0, axis=1, keepdims=True)\
                .astype(jnp.float32)
            if len(groups[-1]) + 1 <= GW:
                groups[-1].append(live_col)
                live_pos = (len(groups) - 1, len(groups[-1]) - 1)
            else:
                groups.append([live_col])
                live_pos = (len(groups) - 1, 0)

            wvec = (jnp.int32(1) << jax.lax.broadcasted_iota(
                jnp.int32, (1, GW), 1))
            gbits = []
            for gcols in groups:
                mat = jnp.concatenate(gcols, axis=1)
                colsum = jnp.sum(mat, axis=0, keepdims=True)
                gbits.append(jnp.sum(
                    jnp.where(colsum > 0, wvec[:, :len(gcols)], 0)))
            return gbits, live_pos, ntg

        def _node_pushes(w, pops, gbits, live_pos, ntg, sp, lsp):
            stack_ref, lstack_ref = stacks[w], lstacks[w]
            oct_s = oct_w[w]
            any_live = ((gbits[live_pos[0]] >> live_pos[1]) & 1) == 1
            for p, (nid, ok) in enumerate(pops):
                # the wave's octant picks among 8 static-minor order
                # loads (Mosaic cannot index the minor dim dynamically)
                ows = [rec_ref[nid, nbw + ntw + oo] for oo in
                       range(8 * owords)]
                osel = [_sel_scalar([ows[o8 * owords + ow] for o8 in
                                     range(8)], oct_s)
                        for ow in range(owords)]
                tw = ntg[p]
                bits_p = gbits[p // per_g] >> ((p % per_g) * width)
                for j in range(width - 1, -1, -1):  # far to near
                    bit = j * obits
                    sl = (osel[bit // 32] >> (bit % 32)) & omask
                    wanted = ((bits_p >> sl) & 1) == 1
                    # target = int16 half of word sl//2 (word select +
                    # shift: ntw-1 wheres, vs width-1 for a value select)
                    tword = _sel_scalar(tw, sl >> 1)
                    tgt = jnp.where((sl & 1) == 0, (tword << 16) >> 16,
                                    tword >> 16)
                    # tgt == 0 marks an EMPTY slot (no slot may target the
                    # root); the guard replaces the old per-node count
                    act = ok & wanted & any_live & (tgt != 0)
                    is_leaf = tgt < 0
                    push_n = act & ~is_leaf
                    push_l = act & is_leaf
                    cur_sp = jnp.minimum(sp, STACK - 1)
                    cur_lsp = jnp.minimum(lsp, LSTACK - 1)

                    @pl.when(push_n)
                    def _(tgt=tgt, cur_sp=cur_sp):
                        stack_ref[cur_sp] = tgt

                    @pl.when(push_l)
                    def _(tgt=tgt, cur_lsp=cur_lsp):
                        lstack_ref[cur_lsp] = -tgt - 1

                    lsp = lsp + push_l.astype(jnp.int32)
                    sp = sp + push_n.astype(jnp.int32)

            if occlusion:
                # whole-wave early-out: every lane occluded/dead
                sp = jnp.where(any_live, sp, 0)
                lsp = jnp.where(any_live, lsp, 0)
            return sp, lsp

        def node_phase_all(args):
            sps = list(args[:waves])
            lsps = list(args[waves:])
            active = [(sps[w] > 0) & (lsps[w] <= L_HIGH_WATER)
                      for w in range(waves)]
            popped = []
            for w in range(waves):
                pops, sp2 = _node_pops(w, sps[w], active[w])
                popped.append(pops)
                sps[w] = jnp.where(active[w], sp2, sps[w])
            # issue ALL waves' vector work before ANY scalar consumption
            wants = [_node_wants(w, popped[w]) for w in range(waves)]
            for w in range(waves):
                gbits, live_pos, ntg = wants[w]
                sp2, lsp2 = _node_pushes(w, popped[w], gbits, live_pos,
                                         ntg, sps[w], lsps[w])
                sps[w] = jnp.where(active[w], sp2, sps[w])
                lsps[w] = jnp.where(active[w], lsp2, lsps[w])
            return tuple(sps) + tuple(lsps)

        def round_body(c):
            sps = list(c[0:waves])
            lsps = list(c[waves:2 * waves])
            step, nlr, nnr = c[2 * waves:]
            # batched leaf rounds: drain only at FULL occupancy (every
            # pop slot real) or when the node stack is exhausted — the
            # leaf phase's vector cost is fixed at wlq rows/round, so
            # half-empty drains waste half its work (measured: the queue
            # trickle-fills at ~node-round pace, mean occupancy < wlq)
            ran_leaf = jnp.int32(0)
            for w in range(waves):
                do_leaf = (lsps[w] >= wlq) | ((sps[w] == 0)
                                              & (lsps[w] > 0))
                ran_leaf = ran_leaf | do_leaf.astype(jnp.int32)
                lsps[w] = jax.lax.cond(do_leaf, lambda x, w=w:
                                       leaf_phase(w, x),
                                       lambda x: x, lsps[w])
            nlr = nlr + ran_leaf
            # leaf-drain throttle: above L_HIGH_WATER only leaves run, so
            # the queue cannot overflow (a node round adds <= wp*width)
            any_node = (sps[0] > 0) & (lsps[0] <= L_HIGH_WATER)
            for w in range(1, waves):
                any_node = any_node | ((sps[w] > 0)
                                       & (lsps[w] <= L_HIGH_WATER))
            nnr = nnr + any_node.astype(jnp.int32)
            out = jax.lax.cond(any_node, node_phase_all,
                               lambda a: a, tuple(sps) + tuple(lsps))
            sps = list(out[:waves])
            lsps = list(out[waves:])
            return tuple(sps) + tuple(lsps) + (step + 1, nlr, nnr)

        def cond(c):
            alive = (c[0] > 0) | (c[waves] > 0)
            for w in range(1, waves):
                alive = alive | (c[w] > 0) | (c[waves + w] > 0)
            return alive & (c[2 * waves] < MAX_ROUNDS)

        for w in range(waves):
            stacks[w][0] = 0
        init = (tuple(jnp.int32(1) for _ in range(waves))
                + tuple(jnp.int32(0) for _ in range(waves))
                + (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        fin = jax.lax.while_loop(cond, round_body, init)
        steps, nlr, nnr = fin[2 * waves:]
        if debug:
            # diagnostic outputs: u <- total rounds, v <- node rounds,
            # t <- leaf rounds (per grid step, broadcast)
            u_ref[:, :] = jnp.full((waves * sub, LANE), steps, jnp.int32)\
                .astype(jnp.float32)
            v_ref[:, :] = jnp.full((waves * sub, LANE), nnr, jnp.int32)\
                .astype(jnp.float32)
            t_ref[:, :] = jnp.full((waves * sub, LANE), nlr, jnp.int32)\
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


def _block_octants(d, nb, n, sub, waves=1):
    d0 = d[jnp.minimum(jnp.arange(nb * waves, dtype=jnp.int32)
                       * (sub * LANE), n - 1)]
    oct_b = ((d0[:, 0] < 0).astype(jnp.int32)
             | ((d0[:, 1] < 0).astype(jnp.int32) << 1)
             | ((d0[:, 2] < 0).astype(jnp.int32) << 2))
    return oct_b.reshape(nb, waves)  # SMEM scalars must be 2D


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


def _call_wide(rec, frame, leafs, tid, o, d, t_max, *, occlusion,
               interpret, width, wp, wlq, sub, waves=1, debug=False):
    n = o.shape[0]
    blk = waves * sub * LANE
    n_pad = ((n + blk - 1) // blk) * blk
    nb = n_pad // blk
    ox, oy, oz, dx, dy, dz, tm, shape2 = _pad_rays(o, d, t_max, n, n_pad,
                                                   nb, waves * sub)
    oct_b = _block_octants(d, nb, n, sub, waves)

    ray_spec = pl.BlockSpec((waves * sub, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    oct_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    o0 = jnp.int32 if occlusion else jnp.float32
    o1 = jnp.float32 if occlusion else jnp.int32

    return pl.pallas_call(
        _make_wide_kernel(width=width, occlusion=occlusion, wp=wp, wlq=wlq,
                          sub=sub, debug=debug, waves=waves),
        grid=(nb,),
        in_specs=[table_spec] * 4 + [oct_spec] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct(shape2, o0),
            jax.ShapeDtypeStruct(shape2, o1),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((LSTACK,), jnp.int32)] * waves
                       + [pltpu.VMEM((waves * sub, LANE), jnp.float32),
                          pltpu.VMEM((waves * sub, LANE), jnp.int32),
                          pltpu.VMEM((waves * sub, LANE), jnp.float32),
                          pltpu.VMEM((waves * sub, LANE), jnp.float32),
                          pltpu.VMEM((waves * sub, LANE), jnp.int32)],
        interpret=interpret,
    )(rec, frame, leafs, tid, oct_b, ox, oy, oz, dx, dy, dz, tm)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "wp", "wlq", "sub",
                                    "width", "waves", "debug"))
def wide_closest_hit(rec, frame, leafs, tid, o, d, t_max, *, interpret=True,
                     width=None, wp=None, wlq=WLQ, sub=SUB, waves=WAVES,
                     debug=False):
    """Closest hit for N rays via one treelet's wide packet kernel.
    Returns (t, tri, u, v): tri == -1 where no hit."""
    if width is None:
        width = {16: 4, 24: 8, 48: 16}[rec.shape[-1]]
    n = o.shape[0]
    t, tri, u, v = _call_wide(rec, frame, leafs, tid, o, d, t_max,
                              occlusion=False, interpret=interpret,
                              width=width, wp=wp, wlq=wlq, sub=sub,
                              waves=waves, debug=debug)
    return (t.reshape(-1)[:n], tri.reshape(-1)[:n],
            u.reshape(-1)[:n], v.reshape(-1)[:n])


@functools.partial(jax.jit,
                   static_argnames=("interpret", "wp", "wlq", "sub",
                                    "width", "waves"))
def wide_any_hit(rec, frame, leafs, tid, o, d, t_max, *, interpret=True,
                 width=None, wp=None, wlq=WLQ, sub=SUB, waves=WAVES):
    """Occlusion for N rays via one treelet's wide kernel; bool (N,)."""
    if width is None:
        width = {16: 4, 24: 8, 48: 16}[rec.shape[-1]]
    n = o.shape[0]
    occ = _call_wide(rec, frame, leafs, tid, o, d, t_max,
                     occlusion=True, interpret=interpret, width=width,
                     wp=wp, wlq=wlq, sub=sub, waves=waves)[0]
    return occ.reshape(-1)[:n] > 0


# ---------------------------------------------------------------------------
# Treelet chaining (lax.scan — one kernel instance per cast site)
# ---------------------------------------------------------------------------

def wtreelet_closest_hit(tl: WideTreeletPack, o, d, t_max, *,
                         interpret=True, wp=None, wlq=WLQ, sub=SUB,
                         waves=WAVES):
    n = o.shape[0]
    t0 = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    if tl.rec.shape[0] == 1:
        return wide_closest_hit(tl.rec[0], tl.frame[0], tl.leafs[0],
                                tl.tid[0], o, d, t0, interpret=interpret,
                                wp=wp, wlq=wlq, sub=sub, waves=waves)
    init = (t0, jnp.full((n,), -1, jnp.int32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))

    def step(carry, tables):
        t, tri, u, v = carry
        rec, fr, leafs, tid = tables
        tk, trik, uk, vk = wide_closest_hit(rec, fr, leafs, tid,
                                            o, d, t, interpret=interpret,
                                            wp=wp, wlq=wlq, sub=sub,
                                            waves=waves)
        imp = trik >= 0
        return (jnp.where(imp, tk, t), jnp.where(imp, trik, tri),
                jnp.where(imp, uk, u), jnp.where(imp, vk, v)), None

    (t, tri, u, v), _ = jax.lax.scan(
        step, init, (tl.rec, tl.frame, tl.leafs, tl.tid))
    return t, tri, u, v


def wtreelet_any_hit(tl: WideTreeletPack, o, d, t_max, *, interpret=True,
                     wp=None, wlq=WLQ, sub=SUB, waves=WAVES):
    n = o.shape[0]
    t = jnp.asarray(t_max, jnp.float32) * jnp.ones((n,), jnp.float32)
    if tl.rec.shape[0] == 1:
        return wide_any_hit(tl.rec[0], tl.frame[0], tl.leafs[0], tl.tid[0],
                            o, d, t, interpret=interpret, wp=wp, wlq=wlq,
                            sub=sub, waves=waves)

    def step(occ, tables):
        rec, fr, leafs, tid = tables
        occ_k = wide_any_hit(rec, fr, leafs, tid, o, d,
                             jnp.where(occ, 0.0, t), interpret=interpret,
                             wp=wp, wlq=wlq, sub=sub, waves=waves)
        return occ | occ_k, None

    occ, _ = jax.lax.scan(step, jnp.zeros((n,), bool),
                          (tl.rec, tl.frame, tl.leafs, tl.tid))
    return occ


# ---------------------------------------------------------------------------
# Production entry points (coherence sort + kernel; TriHit interface)
# ---------------------------------------------------------------------------

def _env_wp():
    v = os.environ.get("GNX_WBVH_WP")
    return int(v) if v else None


def _env_wlq():
    return int(os.environ.get("GNX_WBVH_WLQ", WLQ))


def _env_sub():
    return int(os.environ.get("GNX_WBVH_SUB", SUB))


def _env_waves():
    return int(os.environ.get("GNX_WBVH_WAVES", WAVES))


def wide_closest_hit_pallas(bvh, o, d, t_max, sort=True, interpret=False,
                            sort_key="oct_morton"):
    """Production wide-BVH closest hit; mirrors
    ops/pallas_bvh._packet_closest_hit_pallas_1.

    The coherence permutation is applied as ONE packed (N, 8) row gather
    (and the inverse as one (N, 4) row gather) instead of 7 + 4 per-array
    element gathers: TPU gathers pay per ROW, so packing the ray record
    into one row cuts the permute traffic's fixed cost ~7x (PERF.md r3)."""
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
                                        sub=_env_sub(), waves=_env_waves())
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
                           waves=_env_waves())
    if sort:
        occ = occ[inv]
    return occ
