"""Round-4 experiment: leaf width x kernel shape on the bounce-cast
workload (the mesh bench's dominant cost, PERF.md r4).

Run twice:  python tools/exp_leaf.py          (LEAF_SIZE=4)
            GNX_LEAF=8 python tools/exp_leaf.py

Prints wide-kernel closest/anyhit times on 1M incoherent bounce rays and
rounds-per-block debug counters, plus a brute-force parity check.
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

from gnxraytracer_tpu.ops import bvh as bvh_mod
from gnxraytracer_tpu.ops import pallas_wbvh as wb
from gnxraytracer_tpu.scene import presets
from tools.bench_wbvh import make_bounce_rays, make_rays, timed


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rs = np.random.RandomState(0)
    scene, camera = presets.envmap_mesh(500, 500)
    bvh = scene.bvh
    print(f"LEAF_SIZE={bvh_mod.LEAF_SIZE} wide treelets: "
          f"{bvh.wtreelets.wbounds.shape} leaf rows {bvh.wtreelets.leafs.shape}",
          flush=True)

    o, d = make_bounce_rays(scene, n, rs)
    tmax = jnp.full((n,), 1e30, jnp.float32)

    # parity vs brute force on a subset
    from gnxraytracer_tpu.ops.intersect import closest_triangle_hit
    ns = 20000
    ref = closest_triangle_hit(o[:ns], d[:ns], tmax[:ns],
                               scene.geom.vertices, scene.geom.triangles)
    got = wb.wide_closest_hit_pallas(bvh, o[:ns], d[:ns], tmax[:ns],
                                     sort_key="oct_morton8")
    hm = int(np.sum(np.asarray(ref.hit) != np.asarray(got.hit)))
    tm = float(np.max(np.abs(np.where(np.asarray(ref.hit),
                                      np.asarray(ref.t) - np.asarray(got.t),
                                      0.0))))
    print(f"parity vs brute force: hit mismatch {hm}/{ns}, max |dt| {tm:.2e}",
          flush=True)

    # rounds/block debug at production shape
    os.environ["GNX_WBVH_WP"] = "8"
    os.environ["GNX_WBVH_WLQ"] = "8"
    os.environ["GNX_WBVH_SUB"] = "16"
    from gnxraytracer_tpu.ops.bvh import ray_sort_perm
    perm, _inv = ray_sort_perm(o, d, bvh.bounds_lo[0], bvh.bounds_hi[0],
                               t_max=tmax, key_mode="oct_morton8")
    os_, ds_ = o[perm], d[perm]
    tl = bvh.wtreelets
    qb, qf = tl.qbounds, tl.qframe
    tot = np.zeros(3)
    for k in range(tl.wbounds.shape[0]):
        t, tri, u, v = wb.wide_closest_hit(
            qb[k], qf[k], tl.worder[k], tl.leafs[k], tl.tid[k],
            os_, ds_, tmax, interpret=False, wp=8, wlq=8, sub=16,
            quant=True, debug=True)
        rounds = np.asarray(u[::16 * 128])
        nodes = np.asarray(v[::16 * 128])
        lrs = np.asarray(t[::16 * 128])
        tot += [rounds.mean(), nodes.mean(), lrs.mean()]
        print(f"  treelet {k}: rounds/block mean {rounds.mean():7.1f} "
              f"(node {nodes.mean():7.1f}, leaf {lrs.mean():7.1f}) "
              f"max {rounds.max():7.0f}", flush=True)
    print(f"  TOTAL rounds/block {tot[0]:7.1f} node {tot[1]:7.1f} "
          f"leaf {tot[2]:7.1f}", flush=True)

    for wp_, wlq_, sub_ in ((8, 8, 16), (16, 16, 16), (8, 16, 16),
                            (16, 8, 16), (12, 12, 16), (16, 16, 32),
                            (8, 8, 32)):
        os.environ["GNX_WBVH_WP"] = str(wp_)
        os.environ["GNX_WBVH_WLQ"] = str(wlq_)
        os.environ["GNX_WBVH_SUB"] = str(sub_)
        timed(f"bounce closest wp{wp_} wlq{wlq_} sub{sub_}",
              jax.jit(lambda: wb.wide_closest_hit_pallas(
                  bvh, o, d, tmax, sort_key="oct_morton8")))
    for wp_, wlq_, sub_ in ((8, 8, 16), (16, 16, 16)):
        os.environ["GNX_WBVH_WP"] = str(wp_)
        os.environ["GNX_WBVH_WLQ"] = str(wlq_)
        os.environ["GNX_WBVH_SUB"] = str(sub_)
        timed(f"bounce anyhit  wp{wp_} wlq{wlq_} sub{sub_}",
              jax.jit(lambda: wb.wide_any_hit_pallas(
                  bvh, o, d, 100.0, sort_key="oct_morton8")))

    oc, dc = make_rays(scene, camera, n, rs)
    os.environ["GNX_WBVH_WP"] = "8"
    os.environ["GNX_WBVH_WLQ"] = "8"
    os.environ["GNX_WBVH_SUB"] = "16"
    timed("camera closest wp8 wlq8 sub16",
          jax.jit(lambda: wb.wide_closest_hit_pallas(
              bvh, oc, dc, tmax, sort_key="oct_morton")))


if __name__ == "__main__":
    main()
