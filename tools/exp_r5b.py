"""Round-5 profile, part 2: isolated casts at pipeline widths, camera
cast, in-kernel round counters, and the sub=32 sweep cells the first run
timed out before reaching.

    python tools/exp_r5b.py
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
from tools.bench_wbvh import make_bounce_rays, make_rays
from tools.profile_r5 import timed


def main():
    rs = np.random.RandomState(0)
    scene, camera = presets.envmap_mesh(500, 500)
    bvh = scene.bvh

    # isolated casts at the widths the pipelined chunk actually runs
    for n in (1_000_000, 500_000, 62_500):
        o, d = make_bounce_rays(scene, n, rs)
        tmax = jnp.full((n,), 1e30, jnp.float32)
        timed(f"bounce closest n={n}",
              jax.jit(lambda o=o, d=d, tmax=tmax:
                      wb.wide_closest_hit_pallas(bvh, o, d, tmax)))
        timed(f"bounce anyhit  n={n}",
              jax.jit(lambda o=o, d=d:
                      wb.wide_any_hit_pallas(bvh, o, d, 100.0)))
    n = 1_000_000
    o, d = make_rays(scene, camera, n, rs)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    timed("camera closest n=1M",
          jax.jit(lambda: wb.wide_closest_hit_pallas(bvh, o, d, tmax)))

    # sub=32 sweep cells
    o, d = make_bounce_rays(scene, n, rs)
    for wp_, wlq_, sub_ in ((8, 8, 32), (16, 16, 32), (8, 8, 8)):
        os.environ["GNX_WBVH_WP"] = str(wp_)
        os.environ["GNX_WBVH_WLQ"] = str(wlq_)
        os.environ["GNX_WBVH_SUB"] = str(sub_)
        try:
            timed(f"bounce closest wp{wp_} wlq{wlq_} sub{sub_}",
                  jax.jit(lambda: wb.wide_closest_hit_pallas(bvh, o, d, tmax)))
            timed(f"bounce anyhit  wp{wp_} wlq{wlq_} sub{sub_}",
                  jax.jit(lambda: wb.wide_any_hit_pallas(bvh, o, d, 100.0)))
        except Exception as e:
            print(f"  wp{wp_} wlq{wlq_} sub{sub_}: {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)
    for k in ("GNX_WBVH_WP", "GNX_WBVH_WLQ", "GNX_WBVH_SUB"):
        os.environ.pop(k, None)

    # debug round counters on a sorted 1M bounce cast
    from gnxraytracer_tpu.ops.bvh import ray_sort_perm
    perm, _inv = ray_sort_perm(o, d, bvh.bounds_lo[0], bvh.bounds_hi[0],
                               t_max=jnp.full((n,), 1e30),
                               key_mode="oct_morton")
    o_s, d_s = o[perm], d[perm]
    tl = bvh.wtreelets
    wbs, wts = wb._tl_tables(tl, True)
    k_t = tl.wbounds.shape[0]
    tot_r = np.zeros(0)
    for kk in range(k_t):
        t, tri, u, v = wb.wide_closest_hit(
            wbs[kk], wts[kk], tl.worder[kk], tl.leafs[kk], tl.tid[kk],
            o_s, d_s, jnp.full((n,), 1e30), interpret=False,
            quant=True, debug=True)
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
