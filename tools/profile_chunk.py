"""Profile ONE mesh-bench chunk with the JAX profiler and print device-op
time grouped by kernel/fusion name (round-4: find the exact split between
casts, sorts, and shading)."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

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


def main():
    scene, camera = presets.envmap_mesh(W, H)
    cfg = path.make_config(scene, W, H, spp=64, max_depth=8, spp_chunk=4,
                           rr_threshold=1.0, fast_mis=True, compact_tail=True,
                           compact_stages=((1, 4), (2, 8), (4, 32)),
                           count_rays=True)
    sampler = samplers.make_sobol_sampler(64)
    img, _ = path._render_chunk_jit(scene, camera, sampler, cfg, 0, 4)
    np.asarray(img[:1])

    tdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for s in (4, 8):
            img, _ = path._render_chunk_jit(scene, camera, sampler, cfg, s, 4)
        np.asarray(img[:1])

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pid_name = ev.get("pid")
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e3  # ms
            cat = ev.get("args", {}).get("long_name", "")
            if dur <= 0:
                continue
            # keep device-side ops only: heuristic — names of XLA ops
            if name.startswith(("jit_", "Thread", "process_")):
                continue
            agg[name.split(".")[0]] += dur
            cnt[name.split(".")[0]] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"{'op':60s} {'ms':>9s} {'n':>5s}")
    for k, v in rows[:45]:
        print(f"{k[:60]:60s} {v:9.2f} {cnt[k]:5d}")
    print("sum of listed:", sum(v for _, v in rows))


if __name__ == "__main__":
    main()
