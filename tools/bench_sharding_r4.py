"""SHARDING_r04.json: sharding evidence that means something (VERDICT r3
item 6).  Replaces the r3 oversubscribed-virtual-CPU weak-scaling table
with:

  1. real-chip 1-device retention (sharding machinery overhead ceiling —
     the only multi-deviceable measurement this host can make honestly);
  2. a COMPUTED communication budget: bytes all-reduced per train step
     (the gradient pytree — the framework's only cross-chip traffic, as
     the compiled-HLO inspection test proves) against the per-step
     compute, giving the predicted scaling bound on real ICI.

Usage:  python tools/bench_sharding_r4.py        (real chip)
"""

import json
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

from gnxraytracer_tpu.models.integrators import path as P
from gnxraytracer_tpu.ops import samplers
from gnxraytracer_tpu.parallel import sharding as sh
from gnxraytracer_tpu.scene import presets

# v5e ICI: 4 links x 100 GB/s/dir per chip (public spec ~1600 Gbps);
# a ring all-reduce moves 2*(N-1)/N * bytes per chip over its slowest link
ICI_GBPS = 100.0e9


def param_budget(scene, label):
    params = sh.extract_params(scene)
    leaves = {k: int(np.prod(np.asarray(v.shape))) * 4
              for k, v in params.items()}
    total = sum(leaves.values())
    big = dict(sorted(leaves.items(), key=lambda kv: -kv[1])[:4])
    return {
        "scene": label,
        "param_classes": len(leaves),
        "grad_bytes_per_step": total,
        "largest": big,
        # ring all-reduce per-chip traffic at N chips: 2*(N-1)/N * total
        "allreduce_time_us_at_N8": round(
            2 * (8 - 1) / 8 * total / ICI_GBPS * 1e6, 3),
        "allreduce_time_us_at_N256": round(
            2 * (256 - 1) / 256 * total / ICI_GBPS * 1e6, 3),
    }


def one_chip_retention():
    """Same render jitted plain vs pjit-sharded over a 1-device Mesh."""
    W = H = 500
    spp = 64
    scene, camera = presets.cornell_box(width=W, height=H)
    cfg = P.make_config(scene, W, H, spp=spp, max_depth=8, spp_chunk=4,
                        rr_threshold=1.0, fast_mis=True)
    smp = samplers.make_sobol_sampler(spp)

    def run_plain():
        acc = jnp.zeros((W * H, 3), jnp.float32)
        for s in range(0, spp, 4):
            acc = acc + P._render_chunk_jit(scene, camera, smp, cfg, s, 4)
        np.asarray(acc[:1])

    mesh = sh.make_mesh(1)

    def run_sharded():
        acc = jnp.zeros((W * H, 3), jnp.float32)
        for s in range(0, spp, 4):
            acc = acc + sh.render_chunk_sharded(scene, camera, smp, cfg,
                                                mesh, s, 4)
        np.asarray(acc[:1])

    def best(fn):
        fn()
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return min(ts)

    tp = best(run_plain)
    tsh = best(run_sharded)
    n_paths = W * H * spp
    return {
        "metric": "sharding_overhead_1chip",
        "unsharded_Mpaths_per_s": round(n_paths / tp / 1e6, 3),
        "sharded_mesh1_Mpaths_per_s": round(n_paths / tsh / 1e6, 3),
        "retention": round(tp / tsh, 4),
        "device": str(jax.devices()[0]),
    }


def main():
    cornell, _ = presets.cornell_box(64, 64)
    envmesh, _ = presets.envmap_mesh(64, 64)
    ret = one_chip_retention()
    # per-step compute at the bench's measured rate: one train step renders
    # H*W*spp_chunk paths; at the bench's ~9.5 Mpaths/s forward (x ~3 for
    # fwd+bwd) a 500^2 x 4spp step is ~0.3 s of compute
    compute_s = 500 * 500 * 4 / (9.5e6 / 3)
    budgets = [param_budget(cornell, "cornell (flagship train)"),
               param_budget(envmesh, "envmesh (env+texture texels)")]
    out = {
        "real_chip_1dev_mesh_overhead": ret,
        "comm_budget": budgets,
        "predicted_scaling": {
            "model": "t_step(N) = t_compute/N_pixels_scaling + "
                     "t_allreduce(N); gradients are the ONLY collective "
                     "(tests/test_sharding_hlo.py proves the forward is "
                     "collective-free and the train step psums exactly "
                     "the gradient tree)",
            "train_step_compute_s_500px_4spp": round(compute_s, 4),
            "worst_allreduce_s": max(
                b["allreduce_time_us_at_N256"] for b in budgets) / 1e6,
            "predicted_efficiency_N8": round(
                compute_s / 8 / (compute_s / 8 + max(
                    b["allreduce_time_us_at_N8"] for b in budgets) / 1e6), 6),
            "note": "comm is microseconds against ~40 ms/chip of compute "
                    "at N=8 — pixel-DP scaling is compute-bound by >3 "
                    "orders of magnitude; the >=85% retention target is "
                    "structurally assured unless per-chip occupancy "
                    "collapses (tiny tiles)",
        },
        "collected": "round 4, tools/bench_sharding_r4.py",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SHARDING_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
