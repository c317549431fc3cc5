"""Stage ablation for the MESH bench chunk (BASELINE config 4).

Sweeps max_depth to get marginal per-bounce cost, and times isolated
stages (sort, casts, env NEE, material eval) on the same wavefront the
bench dispatches.  Run on the real chip:

    python tools/ablate_mesh.py
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
from gnxraytracer_tpu.ops import samplers
from gnxraytracer_tpu.scene import presets

W = H = 500
CHUNK = 4
DEPTH = 8


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
        return path.make_config(scene, W, H, spp=64, max_depth=depth,
                                spp_chunk=CHUNK, rr_threshold=1.0,
                                fast_mis=True, compact_tail=True,
                                compact_from=1, compact_frac=4)

    prev = 0.0
    for depth in (0, 1, 2, 3, 8):
        cfg = cfg_for(depth)
        t = timed(f"chunk max_depth={depth}",
                  lambda cfg=cfg: path._render_chunk_jit(
                      scene, camera, sampler, cfg, 0, CHUNK))
        if depth:
            print(f"   marginal vs prev: {1000*(t-prev):9.1f} ms",
                  flush=True)
        prev = t


if __name__ == "__main__":
    main()
