"""Round-5 mesh-chunk profile: where do the 734 ms/chunk go NOW?

Times the exact bench_mesh config (pipeline_casts + compact_stages) per
max_depth, then isolates the wide-kernel casts (camera / bounce closest,
anyhit) and reads the kernel's debug round counters.

    python tools/profile_r5.py
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

from gnxraytracer_tpu.models.integrators import path
from gnxraytracer_tpu.ops import pallas_wbvh as wb
from gnxraytracer_tpu.ops import samplers
from gnxraytracer_tpu.scene import presets
from tools.bench_wbvh import make_bounce_rays, make_rays

W = H = 500
CHUNK = 4


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        ts.append(time.time() - t0)
    print(f"{name:44s} {min(ts)*1000:9.1f} ms", flush=True)
    return min(ts)


def main():
    scene, camera = presets.envmap_mesh(W, H)
    sampler = samplers.make_sobol_sampler(64)

    def cfg_for(depth):
        stages = tuple((b, f) for (b, f) in ((0, 2), (1, 16), (2, 32), (4, 64))
                       if b < max(depth, 1))
        return path.make_config(scene, W, H, spp=64, max_depth=depth,
                                spp_chunk=CHUNK, rr_threshold=1.0,
                                fast_mis=True, compact_tail=True,
                                pipeline_casts=True,
                                compact_stages=stages,
                                count_rays=True)

    prev = 0.0
    for depth in (0, 1, 2, 3, 4, 8):
        cfg = cfg_for(depth)
        t = timed(f"chunk max_depth={depth}",
                  lambda cfg=cfg: path._render_chunk_jit(
                      scene, camera, sampler, cfg, 0, CHUNK)[0])
        if depth:
            print(f"   marginal vs prev: {1000*(t-prev):9.1f} ms",
                  flush=True)
        prev = t

    # isolated casts at the widths the pipelined chunk actually runs
    rs = np.random.RandomState(0)
    bvh = scene.bvh
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

    # debug round counters on a sorted 1M bounce cast
    o, d = make_bounce_rays(scene, n, rs)
    from gnxraytracer_tpu.ops.bvh import ray_sort_perm
    perm, _inv = ray_sort_perm(o, d, bvh.bounds_lo[0], bvh.bounds_hi[0],
                               t_max=jnp.full((n,), 1e30), key_mode="oct_morton")
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
