"""Microbenchmark: what does one wide-kernel ROUND cost, and why?

Runs a fixed number of node-phase rounds (no real traversal — the stack
is re-seeded each round) with pieces selectively disabled:

  full      : 24*wp scalar VMEM bound loads + 4*wp slab tests + pack +
              1 sync + scalar push decode (the production round shape)
  noload    : bounds come from loop constants (measures the scalar-load
              share)
  nosync    : the packed weighted-sum is replaced by a constant (measures
              the vector->scalar sync share)
  novec     : slab tests replaced by constant masks (measures vector-op
              share; loads+sync remain)
  dma       : bounds DMA'd (wp rows) to SMEM per round, read as SMEM
              scalars

Run:  python tools/micro_wbvh.py [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".cache", "jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WP = 4
NW = 2048
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000


def make_kernel(mode):
    def kernel(wb_ref, wt_ref, wo_ref, rays_ref, out_ref, stack_ref,
               bsm_ref, sems):
        rx = rays_ref[:, :]
        wvec = (jnp.int32(1) << jax.lax.broadcasted_iota(
            jnp.int32, (1, 28), 1))
        for j in range(WP):
            stack_ref[j] = j + 1

        def body(c):
            step, sp, acc = c
            pops = []
            for j in range(WP):
                nid = stack_ref[jnp.maximum(sp - 1 - j, 0)] + (step & 7)
                pops.append(nid)

            if mode == "empty":
                for p, nid in enumerate(pops):
                    stack_ref[p] = (nid + 1) & (NW - 1)
                return step + 1, sp, acc

            if mode == "dma":
                dmas = []
                for p, nid in enumerate(pops):
                    dma = pltpu.make_async_copy(wb_ref.at[nid],
                                                bsm_ref.at[p], sems.at[p])
                    dma.start()
                    dmas.append(dma)
                for dma in dmas:
                    dma.wait()

            cols = []
            qcache = [None]
            for p, nid in enumerate(pops):
                for s in range(4):
                    if mode == "noload":
                        b6 = [jnp.float32(0.1 * (s + k)) for k in range(6)]
                    elif mode == "dma":
                        b6 = [bsm_ref[p, k * 4 + s] for k in range(6)]
                    elif mode == "qload":
                        # packed uint8 bounds: slot s rides byte s of six
                        # i32 words loaded once per NODE (shared across its
                        # 4 slots), decoded with scalar shift/and/convert
                        if s == 0:
                            qw = [wt_ref[nid, 0], wt_ref[nid, 1],
                                  wt_ref[nid, 2], wt_ref[nid, 3],
                                  wo_ref[nid, 0], wt_ref[nid, 0]]
                            qcache[0] = qw
                        qw = qcache[0]
                        b6 = [(((w >> (8 * s)) & 255).astype(jnp.float32)
                               * 0.01 + 0.1) for w in qw]
                    else:
                        b6 = [wb_ref[nid, k * 4 + s] for k in range(6)]
                    if mode == "novec":
                        w = rx > (b6[0] + b6[1] + b6[2] + b6[3] + b6[4]
                                  + b6[5])
                    else:
                        t0 = (b6[0] - rx) * rx
                        t1 = (b6[3] - rx) * rx
                        u0 = (b6[1] - rx) * rx
                        u1 = (b6[4] - rx) * rx
                        v0 = (b6[2] - rx) * rx
                        v1 = (b6[5] - rx) * rx
                        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0, t1),
                                                     jnp.minimum(u0, u1)),
                                         jnp.minimum(v0, v1))
                        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0, t1),
                                                     jnp.maximum(u0, u1)),
                                         jnp.maximum(v0, v1))
                        w = (tn <= tf) & (tf > 0)
                    cols.append(jnp.any(w, axis=1, keepdims=True)
                                .astype(jnp.float32))
            if mode == "packsum":
                packed = cols[0]
                for k in range(1, len(cols)):
                    packed = packed + cols[k] * float(1 << k)
                bits = jnp.sum(packed).astype(jnp.int32)  # placeholder pack
                for p, nid in enumerate(pops):
                    stack_ref[p] = (nid + bits) & (NW - 1)
                return step + 1, sp, acc
            mat = jnp.concatenate(cols, axis=1)
            colsum = jnp.sum(mat, axis=0, keepdims=True)
            if mode == "noconcat":
                bits = jnp.int32(0)
                for p, nid in enumerate(pops):
                    stack_ref[p] = (nid + 1) & (NW - 1)
                acc = acc + colsum[0, 0] * 0.0  # keep alive without sum
                return step + 1, sp, acc
            if mode == "nosync":
                bits = step  # no vector->scalar transfer
                acc = acc + jnp.sum(colsum)  # keep the vector work alive
            else:
                bits = jnp.sum(jnp.where(colsum > 0,
                                         wvec[:, :len(cols)], 0))

            sp = jnp.int32(WP)
            if mode == "noscalar":
                for p, nid in enumerate(pops):
                    stack_ref[p] = (nid + bits) & (NW - 1)
                return step + 1, sp, acc
            for p, nid in enumerate(pops):
                order = wo_ref[nid, 0]
                cnt = (order >> 8) & 15
                tg = [wt_ref[nid, k] for k in range(4)]
                bits_p = bits >> (4 * p)
                for j in range(3, -1, -1):
                    sl = (order >> (2 * j)) & 3
                    wanted = ((bits_p >> sl) & 1) == 1
                    act = (j < cnt) & wanted
                    tgt = jnp.where(sl == 0, tg[0],
                                    jnp.where(sl == 1, tg[1],
                                              jnp.where(sl == 2, tg[2],
                                                        tg[3])))
                    if mode == "nowhen":
                        acc = acc + jnp.where(act, tgt,
                                              0).astype(jnp.float32)
                    else:
                        @pl.when(act & (tgt >= 0))
                        def _(tgt=tgt, p=p):
                            stack_ref[p] = tgt & (NW - 1)

                if mode == "nowhen":
                    stack_ref[p] = nid & (NW - 1)
            return step + 1, sp, acc
        if mode == "arith":
            def body2(c):
                step, sp, acc = c
                return step + 1, sp + step, acc + 1.0
            step, _, acc = jax.lax.while_loop(lambda c: c[0] < ROUNDS, body2,
                                              (jnp.int32(0), jnp.int32(WP),
                                               jnp.float32(0)))
        elif mode == "fori_empty":
            def body3(i, c):
                sp, acc = c
                for p in range(WP):
                    nid = stack_ref[jnp.maximum(sp - 1 - p, 0)] + (i & 7)
                    stack_ref[p] = (nid + 1) & (NW - 1)
                return sp, acc + 1.0
            _, acc = jax.lax.fori_loop(0, ROUNDS, body3,
                                       (jnp.int32(WP), jnp.float32(0)))
            step = jnp.int32(ROUNDS)
        elif mode == "while_vec":
            # while_loop whose body touches only VECTOR state (no SMEM)
            def body4(c):
                step, v = c
                return step + 1, v * 1.0001 + 0.1
            step, v = jax.lax.while_loop(
                lambda c: c[0] < ROUNDS, body4,
                (jnp.int32(0), jnp.zeros((8, 128), jnp.float32)))
            acc = v[0, 0]
        else:
            step, _, acc = jax.lax.while_loop(lambda c: c[0] < ROUNDS, body,
                                          (jnp.int32(0), jnp.int32(WP),
                                           jnp.float32(0)))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out_ref[:, :] = jnp.where(lane == 0, acc, step.astype(jnp.float32))

    return kernel


def run(mode):
    rs = np.random.RandomState(0)
    wb = jnp.asarray(rs.rand(NW, 32).astype(np.float32))
    wt = jnp.asarray(rs.randint(0, NW, (NW, 4)).astype(np.int32))
    wo = jnp.asarray((rs.randint(0, 256, (NW, 1))
                      | (4 << 8)).astype(np.int32))
    rays = jnp.asarray(rs.rand(8, 128).astype(np.float32))
    f = pl.pallas_call(
        make_kernel(mode),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32),
                        pltpu.SMEM((WP, 32), jnp.float32),
                        pltpu.SemaphoreType.DMA((WP,))],
    )
    g = jax.jit(lambda a, b, c, r: f(a, b, c, r))
    np.asarray(g(wb, wt, wo, rays))  # compile+warm
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(g(wb, wt, wo, rays))
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{mode:8s} {best*1e6/ROUNDS:8.2f} us/round   "
          f"({best*1000:6.1f} ms / {ROUNDS} rounds)", flush=True)


if __name__ == "__main__":
    for mode in ("full", "noload", "qload"):
        run(mode)
