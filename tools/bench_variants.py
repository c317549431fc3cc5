"""Compare render drivers on the bench workload: host chunk loop vs fused
single-dispatch, chunk sizes 4 and 8."""

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
SPP = 256
DEPTH = 8


def run_host_loop(scene, camera, sampler, cfg):
    acc = jnp.zeros((W * H, 3), jnp.float32)
    s = 0
    while s < SPP:
        acc = acc + path._render_chunk_jit(scene, camera, sampler, cfg, s,
                                           cfg.spp_chunk)
        s += cfg.spp_chunk
    np.asarray(acc[:1])
    return acc


def run_fused(scene, camera, sampler, cfg):
    img = path._render_fused_jit(scene, camera, sampler, cfg)
    np.asarray(img[:1, :1])
    return img


def timed(name, fn, *args, reps=2):
    fn(*args)  # warm / compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn(*args)
        ts.append(time.time() - t0)
    print(f"{name:40s} {min(ts):7.2f} s  ({W*H*SPP/min(ts)/1e6:5.2f} Mpaths/s)",
          flush=True)


def main():
    scene, camera = presets.cornell_box(width=W, height=H)
    sampler = samplers.make_sobol_sampler(SPP)
    for chunk in (4, 8):
        cfg = path.make_config(scene, W, H, spp=SPP, max_depth=DEPTH,
                               spp_chunk=chunk, rr_threshold=1.0,
                               fast_mis=True)
        timed(f"host loop chunk={chunk}", run_host_loop, scene, camera,
              sampler, cfg)
        timed(f"fused    chunk={chunk}", run_fused, scene, camera, sampler,
              cfg)


if __name__ == "__main__":
    main()
