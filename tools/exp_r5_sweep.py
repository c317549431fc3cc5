"""Round-5 experiment: pop widths ABOVE 8 (the r4 grid stopped at wp=wlq=8)
and taller blocks, on the 1M-ray incoherent bounce cast.

Rationale: the r4 kernel pays ~580 rounds/block/cast, each round one or
two vector->scalar syncs.  Raising wp/wlq cuts rounds roughly
proportionally at the cost of more (pipelined) vector work per round and
one extra pack-group sync per 28 want bits.  The r4 sweep only ever
measured wp <= 8.

    python tools/exp_r5_sweep.py
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

    grid = [(8, 8, 16), (16, 16, 16), (16, 8, 16), (8, 16, 16),
            (12, 12, 16), (16, 16, 32), (8, 8, 32), (24, 24, 16)]
    for wp_, wlq_, sub_ in grid:
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


if __name__ == "__main__":
    main()
