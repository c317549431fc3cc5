"""Round-4 experiment 2: block height (sub) and pop width on bounce casts.

If the wide kernel is vector-bound (exp_leaf result: LEAF=8 cut rounds 30%
but ran SLOWER), then block-wide leaf/slab tests waste width on lanes that
don't want the work — smaller blocks should win despite more rounds.
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
from tools.bench_wbvh import make_bounce_rays, timed


def main():
    n = 1_000_000
    rs = np.random.RandomState(0)
    scene, camera = presets.envmap_mesh(500, 500)
    bvh = scene.bvh
    o, d = make_bounce_rays(scene, n, rs)
    tmax = jnp.full((n,), 1e30, jnp.float32)

    grid = [(8, 8, 8), (4, 4, 8), (6, 6, 8), (4, 8, 8), (8, 4, 8),
            (2, 2, 8), (4, 4, 24), (8, 8, 16)]
    best = None
    for wp_, wlq_, sub_ in grid:
        os.environ["GNX_WBVH_WP"] = str(wp_)
        os.environ["GNX_WBVH_WLQ"] = str(wlq_)
        os.environ["GNX_WBVH_SUB"] = str(sub_)
        t = timed(f"bounce closest wp{wp_} wlq{wlq_} sub{sub_}",
                  jax.jit(lambda: wb.wide_closest_hit_pallas(
                      bvh, o, d, tmax, sort_key="oct_morton8")))
    for wp_, wlq_, sub_ in ((4, 4, 8), (8, 8, 8), (2, 2, 8)):
        os.environ["GNX_WBVH_WP"] = str(wp_)
        os.environ["GNX_WBVH_WLQ"] = str(wlq_)
        os.environ["GNX_WBVH_SUB"] = str(sub_)
        timed(f"bounce anyhit  wp{wp_} wlq{wlq_} sub{sub_}",
              jax.jit(lambda: wb.wide_any_hit_pallas(
                  bvh, o, d, 100.0, sort_key="oct_morton8")))

    # sort-key variants at the winning shape
    os.environ["GNX_WBVH_WP"] = "4"
    os.environ["GNX_WBVH_WLQ"] = "4"
    os.environ["GNX_WBVH_SUB"] = "8"
    for key in ("oct_morton8", "oct_morton", "morton_oct", "octant"):
        try:
            timed(f"closest sort={key} (4/4/8)",
                  jax.jit(lambda key=key: wb.wide_closest_hit_pallas(
                      bvh, o, d, tmax, sort_key=key)))
        except Exception as e:
            print(f"  {key}: {type(e).__name__} {e}", flush=True)


if __name__ == "__main__":
    main()
