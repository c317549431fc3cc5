"""Round-5 experiment: treelet cap sweep — does a SINGLE whole-mesh
treelet (quantized tables ~6 MB, inside the ~16 MB VMEM) beat the 13-way
lax.scan the 16k cap forces on the 105k-tri envmesh?

Each cast currently scans 13 treelet kernel instances; every instance
pays its own dispatch + per-block root rounds even when nothing in the
treelet is wanted.  The isolated-cast profile (exp_r5b) shows a cast
floor of ~240 ms at 62.5k rays — fixed cost, not ray work.

    python tools/exp_r5_cap.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".cache", "jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from gnxraytracer_tpu.ops import pallas_wbvh as wb
from gnxraytracer_tpu.scene import presets
from tools.bench_wbvh import make_bounce_rays
from tools.profile_r5 import timed


def main():
    n = 1_000_000
    rs = np.random.RandomState(0)
    scene, camera = presets.envmap_mesh(500, 500)
    bvh = scene.bvh
    o, d = make_bounce_rays(scene, n, rs)
    tmax = jnp.full((n,), 1e30, jnp.float32)

    from gnxraytracer_tpu.ops.bvh import ray_sort_perm
    perm, _inv = ray_sort_perm(o, d, bvh.bounds_lo[0], bvh.bounds_hi[0],
                               t_max=tmax, key_mode="oct_morton")
    o_s, d_s = o[perm], d[perm]

    off = np.asarray(bvh.offset)
    npr = np.asarray(bvh.n_prims)
    ax = np.asarray(bvh.axis)
    lo = np.asarray(bvh.bounds_lo)
    hi = np.asarray(bvh.bounds_hi)
    order = np.asarray(bvh.prim_idx)
    soa = np.asarray(bvh.leaf_soa)

    for cap in (16384, 32768, 65536, 200000):
        tl = wb.build_wide_treelets(off, npr, ax, lo, hi, order, soa,
                                    cap=cap)
        k_t = tl.wbounds.shape[0]
        nw = tl.wbounds.shape[1]
        bytes_tables = (tl.qbounds.size * 4 + tl.worder.size * 4
                        + tl.leafs.size * 4 + tl.tid.size * 4)
        print(f"cap={cap}: K={k_t} NWmax={nw} "
              f"tables={bytes_tables/1e6:.1f} MB", flush=True)

        def closest(tl=tl):
            return wb.wtreelet_closest_hit(tl, o_s, d_s, tmax,
                                           interpret=False, quant=True)

        def anyhit(tl=tl):
            return wb.wtreelet_any_hit(
                tl, o_s, d_s, jnp.full((n,), 100.0), interpret=False,
                quant=True)

        try:
            timed(f"  closest cap={cap}", jax.jit(closest))
            timed(f"  anyhit  cap={cap}", jax.jit(anyhit))
        except Exception as e:
            print(f"  cap={cap}: {type(e).__name__} {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
