"""Round-5 width sweep on chip: BVH4/8/16 node records x pop counts on
the 1M-ray envmesh bounce cast (the r5 kernel redesign).

    python tools/exp_r5_width.py
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
from gnxraytracer_tpu.ops.bvh import ray_sort_perm
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

    for width, wps in ((16, (1, 2, 4)), (8, (4, 2)), (4, (8,))):
        tl = wb.build_wide_treelets(off, npr, ax, lo, hi, order, soa,
                                    width=width)
        print(f"width={width}: K={tl.rec.shape[0]} NW={tl.rec.shape[1]} "
              f"RW={tl.rec.shape[2]}", flush=True)
        for wp in wps:
            try:
                timed(f"  closest w{width} wp{wp}",
                      jax.jit(lambda tl=tl, wp=wp: wb.wtreelet_closest_hit(
                          tl, o_s, d_s, tmax, interpret=False, wp=wp)))
                timed(f"  anyhit  w{width} wp{wp}",
                      jax.jit(lambda tl=tl, wp=wp: wb.wtreelet_any_hit(
                          tl, o_s, d_s, jnp.full((n,), 100.0),
                          interpret=False, wp=wp)))
            except Exception as e:
                print(f"  w{width} wp{wp}: {type(e).__name__} "
                      f"{str(e)[:140]}", flush=True)

    # round counters for the best width (16, wp=2)
    tl = wb.build_wide_treelets(off, npr, ax, lo, hi, order, soa, width=16)
    k_t = tl.rec.shape[0]
    tot_r = np.zeros(0)
    for kk in range(k_t):
        t, tri, u, v = wb.wide_closest_hit(
            tl.rec[kk], tl.frame[kk], tl.leafs[kk], tl.tid[kk],
            o_s, d_s, jnp.full((n,), 1e30), interpret=False, debug=True)
        blk = wb.SUB * wb.LANE
        rounds = np.asarray(u)[::blk]
        noder = np.asarray(v)[::blk]
        leafr = np.asarray(t)[::blk]
        print(f"treelet {kk}: rounds mean={rounds.mean():.0f} "
              f"max={rounds.max():.0f} node={noder.mean():.0f} "
              f"leaf={leafr.mean():.0f}", flush=True)
        tot_r = rounds if tot_r.size == 0 else tot_r + rounds
    print(f"TOTAL rounds/block mean={tot_r.mean():.0f} max={tot_r.max():.0f}",
          flush=True)


if __name__ == "__main__":
    main()
