"""Benchmark: Mrays/s/chip + wall-clock to 256 spp on the Cornell box
(BASELINE.md metric).  Prints ONE JSON line.

The reference publishes no numbers (BASELINE.md), so the baseline is the
reference itself, MEASURED on this host: the headless oracle
(tools/ref_oracle = the reference's unmodified render core) on the same
workload (500x500, 256 spp, path depth 8, Cornell+skybox).  See
BASELINE_MEASURED.json; regenerate with `python tools/parity.py baseline`.
"""

import json
import os
import time

import jax

# Persistent compile cache: the tunnel's remote compile latency is wildly
# variable (14s .. 10+min for the same graph); a disk cache makes repeat
# bench runs deterministic.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache",
                      "jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

def _measured_baseline():
    """Reference renderer's measured Mpaths/s on this exact workload
    (tools/parity.py baseline -> BASELINE_MEASURED.json)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return json.load(f)["workloads"]["path_500px_256spp"]["Mpaths_per_s"]
    except (OSError, KeyError):
        return 0.4371  # measured 2026-08-20, 2-core Xeon builder VM


BASELINE_MPATHS = _measured_baseline()


def _reps(fn, reps=3):
    """Median-of-N timing (VERDICT r3 weak #1: single-shot bench numbers
    disagreed with the driver's capture by 2.3x across runs on this
    tunnel; every recorded number is now the median with spread)."""
    walls = []
    for _ in range(reps):
        walls.append(fn())
    walls.sort()
    return walls[len(walls) // 2], walls[0], walls[-1]


def main():
    from gnxraytracer_tpu.models.integrators import path
    from gnxraytracer_tpu.ops import samplers
    from gnxraytracer_tpu.scene import presets

    width = height = 500
    spp = 256
    max_depth = 8
    spp_chunk = 4  # 1M lanes/chunk: measured throughput optimum (PERF.md)

    scene, camera = presets.cornell_box(width=width, height=height)
    # fast_mis: the folded-MIS estimator (2 scene casts/bounce, same
    # expectation as the reference's 3-cast EstimateDirect; see
    # models/integrators/path.trace_paths_fast + tests)
    cfg = path.make_config(scene, width, height, spp=spp, max_depth=max_depth,
                           spp_chunk=spp_chunk, rr_threshold=1.0,
                           fast_mis=True,
                           # tail compaction: bounces 5-8 run at 1/8 width
                           # (RR leaves ~2% alive past bounce 4; PERF.md)
                           compact_tail=True,
                           # measured useful scene casts (VERDICT r1: no
                           # more estimated Mrays)
                           count_rays=True)
    # Owen-scrambled Sobol: same-or-better equidistribution than Halton and
    # ~40x cheaper to evaluate on TPU (PERF.md)
    sampler = samplers.make_sobol_sampler(spp)

    import numpy as np

    # warmup / compile (block via host fetch: block_until_ready does not
    # actually synchronize on the axon tunnel platform)
    img, _nr = path._render_chunk_jit(scene, camera, sampler, cfg, 0, spp_chunk)
    np.asarray(img[:1])

    n_rays_box = [0.0]

    def run_once():
        t0 = time.time()
        acc = jnp.zeros((width * height, 3), jnp.float32)
        nrays = jnp.zeros((), jnp.float32)
        s = 0
        while s < spp:
            img, nr = path._render_chunk_jit(scene, camera, sampler, cfg, s,
                                             spp_chunk)
            acc = acc + img
            nrays = nrays + nr
            s += spp_chunk
        np.asarray(acc[:1])
        n_rays_box[0] = float(nrays)
        return time.time() - t0

    wall, wall_min, wall_max = _reps(run_once)
    n_rays = n_rays_box[0]  # measured useful scene casts (alive lanes)

    n_paths = width * height * spp
    mpaths = n_paths / wall / 1e6

    result = {
        "metric": "cornell_500px_256spp_Mpaths_per_s",
        "value": round(mpaths, 3),
        "unit": "Mpaths/s",
        "vs_baseline": round(mpaths / BASELINE_MPATHS, 2),
        "wall_s_256spp": round(wall, 2),
        "wall_s_min": round(wall_min, 2),
        "wall_s_max": round(wall_max, 2),
        "Mrays_per_s": round(n_rays / wall / 1e6, 1),
        "rays_per_path": round(n_rays / n_paths, 2),
        "device": str(jax.devices()[0]),
        # Roofline estimate (PERF.md r3): Cornell is brute-force (16 tris)
        # — ~1 kFLOP of intersection + ~2 kFLOP shading/sampling per cast
        # -> fraction of the v5e VPU f32 peak (~0.9 TFLOP/s).  The bench
        # is NOT flop- or bandwidth-bound (HBM traffic ~3% of 819 GB/s);
        # the gap is op-issue/latency overhead of many small fused ops.
        "mfu_vpu_frac_est": round(n_rays * 3000 / wall / 0.9e12, 4),
    }

    # ---- the reference app's own default workload: Whitted depth 5,
    # 32 spp (ui/RenderThread.cpp:159,163) --------------------------------
    try:
        result.update(bench_whitted())
    except Exception as e:
        result["whitted_error"] = repr(e)[:200]

    # ---- BASELINE config 4: dragon-scale mesh + ImageTexture + HDR env +
    # Sobol (VERDICT r1 item 3: the BVH-exercising workload) ---------------
    try:
        result.update(bench_mesh())
    except Exception as e:  # never lose the cornell line to a mesh failure
        result["mesh_error"] = repr(e)[:200]
    print(json.dumps(result))


def bench_whitted(width=500, height=500, spp=32, max_depth=5):
    from gnxraytracer_tpu.models.integrators import path, whitted
    from gnxraytracer_tpu.ops import samplers
    from gnxraytracer_tpu.scene import presets

    import numpy as np

    scene, camera = presets.cornell_box(width=width, height=height)
    spp_chunk = 8
    cfg = path.make_config(scene, width, height, spp=spp,
                           max_depth=max_depth, spp_chunk=spp_chunk)
    sampler = samplers.make_halton_sampler(spp, width, height)
    img = whitted._render_chunk_jit(scene, camera, sampler, cfg, 0, spp_chunk)
    np.asarray(img[:1])

    def run_once():
        t0 = time.time()
        acc = jnp.zeros((width * height, 3), jnp.float32)
        for s in range(0, spp, spp_chunk):
            acc = acc + whitted._render_chunk_jit(scene, camera, sampler,
                                                  cfg, s, spp_chunk)
        np.asarray(acc[:1])
        return time.time() - t0

    wall, wall_min, wall_max = _reps(run_once)
    base = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_MEASURED.json")) as f:
            base = json.load(f)["workloads"]["whitted_500px_32spp"][
                "Mpaths_per_s"]
    except (OSError, KeyError):
        pass
    mp = width * height * spp / wall / 1e6
    out = {"whitted_Mpaths_per_s": round(mp, 3),
           "whitted_wall_s_32spp": round(wall, 2),
           "whitted_wall_s_min": round(wall_min, 2),
           "whitted_wall_s_max": round(wall_max, 2)}
    if base:
        out["whitted_vs_baseline"] = round(mp / base, 2)
    return out


def bench_mesh(width=500, height=500, spp=64, max_depth=8):
    from gnxraytracer_tpu.models.integrators import path
    from gnxraytracer_tpu.ops import samplers
    from gnxraytracer_tpu.scene import presets

    import numpy as np

    scene, camera = presets.envmap_mesh(width, height)  # ~105k tris
    n_tris = int(scene.geom.triangles.shape[0])
    spp_chunk = 4
    # compact_from=1/frac=4: survivors compacted right after bounce 1 into
    # a quarter-width buffer (measured 4.05 -> 2.72 s/chunk on v5e;
    # unbiased — pre-thinning RR — and the variance cost measured at the
    # noise floor on the envmesh parity golden, PERF.md r3)
    # pipeline_casts + a stage at bounce 0: every bounce's shading runs at
    # the width of lanes whose cast actually hit (49% after the camera
    # bounce, 4.3% after bounce 1); all stage pre-thin probabilities hit 1
    # on this workload, so the estimator is bit-identical to the classic
    # loop (guarded by test_reference_parity_mesh_bench_estimator)
    cfg = path.make_config(scene, width, height, spp=spp,
                           max_depth=max_depth, spp_chunk=spp_chunk,
                           rr_threshold=1.0, fast_mis=True, compact_tail=True,
                           pipeline_casts=True,
                           compact_stages=((0, 2), (1, 16), (2, 32), (4, 64)),
                           count_rays=True)
    sampler = samplers.make_sobol_sampler(spp)
    img, _ = path._render_chunk_jit(scene, camera, sampler, cfg, 0, spp_chunk)
    np.asarray(img[:1])
    n_rays_box = [0.0]

    def run_once():
        t0 = time.time()
        acc = jnp.zeros((width * height, 3), jnp.float32)
        nrays = jnp.zeros((), jnp.float32)
        s = 0
        while s < spp:
            img, nr = path._render_chunk_jit(scene, camera, sampler, cfg, s,
                                             spp_chunk)
            acc = acc + img
            nrays = nrays + nr
            s += spp_chunk
        np.asarray(acc[:1])
        n_rays_box[0] = float(nrays)
        return time.time() - t0

    wall, wall_min, wall_max = _reps(run_once)
    n_paths = width * height * spp
    n_rays = n_rays_box[0]
    mesh_base = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_MEASURED.json")) as f:
            mesh_base = json.load(f)["workloads"]["envmesh_500px_64spp"][
                "Mpaths_per_s"]
    except (OSError, KeyError):
        pass
    return {
        "mesh_tris": n_tris,
        **({"mesh_vs_baseline": round(n_paths / wall / 1e6 / mesh_base, 2)}
           if mesh_base else {}),
        "mesh_bvh_mode": cfg.bvh_mode,
        "mesh_Mpaths_per_s": round(n_paths / wall / 1e6, 3),
        "mesh_wall_s_64spp": round(wall, 2),
        "mesh_wall_s_min": round(wall_min, 2),
        "mesh_wall_s_max": round(wall_max, 2),
        "mesh_Mrays_per_s": round(n_rays / wall / 1e6, 3),
        "mesh_rays_per_path": round(n_rays / n_paths, 2),
        # Roofline estimate (PERF.md r3 "MFU accounting"): the packet walk
        # does ~26 kFLOP of (8,128) vector work per visited node per
        # 1024-ray block and ~1.3 k-steps/block per 1M-ray cast (measured
        # offline step counts) -> FLOPs/ray ~ steps*26k/1024.  Reported as
        # a fraction of the v5e VPU f32 peak (~0.9 TFLOP/s), NOT the MXU
        # bf16 peak: traversal is latency-bound scalar-vector interplay,
        # which is the honest unit for this workload.
        "mesh_vpu_frac_est": round(
            n_rays * 1300 * 26000 / 1024 / wall / 0.9e12, 4),
    }


if __name__ == "__main__":
    main()
