"""Feasibility probe for the wide-BVH packet kernel constructs (round 4).

Checks, on the real chip:
  1. jax.lax.while_loop whose BODY mutates an SMEM scratch stack (push/pop)
     while carrying scalars + vectors functionally — the scalar-stack
     traversal shape.
  2. Dynamic scalar loads from a VMEM table (tab_ref[idx, j]) inside that
     loop.
  3. The packed any-reduce: per-slot (8,128) want -> lane-reduce (8,1) ->
     concat (8,S) -> colsum -> ONE weighted sum -> scalar bitmask
     (2 syncs per round for up to 32 slots).

Run:  python tools/feas_wbvh.py
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

P = 4  # pops per round
S = 2  # child slots per node (binary heap toy)


def kernel(tab_ref, rays_ref, out_ref, stack_ref):
    nn = tab_ref.shape[0]
    rays = rays_ref[:, :]  # (8,128)

    def cond(c):
        sp, acc, step = c
        return (sp > 0) & (step < 4096)

    def body(c):
        sp, acc, step = c
        ids = []
        for j in range(P):
            idx = sp - 1 - j
            valid = idx >= 0
            i = stack_ref[jnp.maximum(idx, 0)]
            ids.append((i, valid))
        sp = sp - jnp.minimum(sp, P)

        # per-slot vector "want" tests with scalar-loaded bounds, packed
        # via lane-reduce -> concat -> colsum -> one weighted sum
        cols = []
        for j, (i, valid) in enumerate(ids):
            for s in range(S):
                b = tab_ref[jnp.maximum(i, 0), s]      # scalar VMEM load
                want = rays > b                        # (8,128) vector
                cols.append(jnp.any(want, axis=1, keepdims=True)
                            .astype(jnp.float32))  # (8,1)
        mat = jnp.concatenate(cols, axis=1)  # (8, P*S)
        colsum = jnp.sum(mat, axis=0, keepdims=True)             # (1, P*S)
        w = (jnp.int32(1) << jax.lax.broadcasted_iota(
            jnp.int32, (1, P * S), 1))
        bits = jnp.sum(jnp.where(colsum > 0, w, 0))

        for j, (i, valid) in enumerate(ids):
            for s in range(S):
                child = 2 * i + 1 + s
                wanted = ((bits >> (S * j + s)) & 1) == 1
                do_push = valid & (child < nn) & wanted
                cur_sp = sp

                @pl.when(do_push)
                def _(child=child, cur_sp=cur_sp):
                    stack_ref[cur_sp] = child

                sp = sp + do_push.astype(jnp.int32)
            acc = acc + jnp.where(valid, tab_ref[jnp.maximum(i, 0), 5], 0.0)
        return sp, acc, step + 1

    stack_ref[0] = 0
    sp0 = jnp.int32(1)
    sp, acc, steps = jax.lax.while_loop(
        cond, body, (sp0, jnp.float32(0.0), jnp.int32(0)))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_ref[:, :] = jnp.where(lane == 0, acc, steps.astype(jnp.float32))


def run(interpret):
    nn = 63  # full binary heap depth 6 -> visits all 63 nodes
    tab = np.zeros((nn, 8), np.float32)
    tab[:, 0:S] = -1.0        # want always true -> visit everything
    tab[:, 5] = np.arange(nn)  # acc target: sum 0..62 = 1953
    rays = np.zeros((8, 128), np.float32)
    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((512,), jnp.int32)],
        interpret=interpret,
    )
    out = np.asarray(jax.jit(lambda t, r: f(t, r))(jnp.asarray(tab),
                                                   jnp.asarray(rays)))
    print(f"interpret={interpret}: acc={out[0,0]} (want 1953.0), "
          f"rounds={out[0,1]}")
    assert out[0, 0] == 1953.0, "WRONG traversal sum"


if __name__ == "__main__":
    run(True)
    t0 = time.time()
    run(False)
    print(f"compiled OK in {time.time()-t0:.1f}s on {jax.devices()[0]}")
