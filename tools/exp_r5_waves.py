"""Round-5 waves sweep on chip: latency-hiding interleave of independent
ray sub-blocks per grid step, x node width, on the 1M-ray envmesh casts.

    python tools/exp_r5_waves.py
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

    ref_t = None
    for width in (8, 16):
        tl = wb.build_wide_treelets(off, npr, ax, lo, hi, order, soa,
                                    width=width)
        for waves in (1, 2, 4):
            try:
                t = None

                def closest(tl=tl, waves=waves):
                    return wb.wtreelet_closest_hit(
                        tl, o_s, d_s, tmax, interpret=False, waves=waves)

                timed(f"closest w{width} waves{waves}", jax.jit(closest))
                out = jax.jit(closest)()
                tri = np.asarray(out[1])
                if ref_t is None:
                    ref_t = tri
                else:
                    print(f"  tri match vs first: {(tri == ref_t).mean():.6f}",
                          flush=True)
                timed(f"anyhit  w{width} waves{waves}",
                      jax.jit(lambda tl=tl, waves=waves:
                              wb.wtreelet_any_hit(
                                  tl, o_s, d_s, jnp.full((n,), 100.0),
                                  interpret=False, waves=waves)))
            except Exception as e:
                print(f"  w{width} waves{waves}: {type(e).__name__} "
                      f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
