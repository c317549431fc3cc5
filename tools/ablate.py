"""Stage ablation for the bench chunk (PERF.md methodology).

Times each bounce-loop stage in isolation with *chained* loop bodies
(iteration-dependent inputs so XLA cannot hoist the body), on the same
1M-lane wavefront the bench uses.  Run on the real chip:

    python tools/ablate.py [reps]
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

from gnxraytracer_tpu.constants import INFINITY
from gnxraytracer_tpu.models import lights as lights_mod
from gnxraytracer_tpu.models import materials as mat_mod
from gnxraytracer_tpu.models.integrators import path
from gnxraytracer_tpu.ops import samplers, trace
from gnxraytracer_tpu.scene import presets

W = H = 500
CHUNK = 4
DEPTH = 8
N = W * H * CHUNK
ITERS = DEPTH + 1  # same trip count as the bounce fori_loop


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)  # sync
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{name:42s} {best*1000:9.1f} ms", flush=True)
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    scene, camera = presets.cornell_box(width=W, height=H)
    cfg = path.make_config(scene, W, H, spp=256, max_depth=DEPTH,
                           spp_chunk=CHUNK, rr_threshold=1.0, fast_mis=True)
    sampler = samplers.make_sobol_sampler(256)

    key = jax.random.PRNGKey(0)
    o = jnp.zeros((N, 3), jnp.float32) + jnp.asarray([0.0, 0.0, 4.0])
    d = jax.random.normal(key, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pixel = jnp.tile(jnp.arange(W * H, dtype=jnp.int32), (CHUNK,))
    sample = jnp.repeat(jnp.arange(CHUNK, dtype=jnp.int32), W * H)

    # -- full chunk (the bench unit) ---------------------------------------
    def full(s):
        return path.render_chunk(scene, camera, sampler, cfg, s, CHUNK)

    full_j = jax.jit(full)
    t_full = timed("FULL chunk (9-bounce fast-MIS)", full_j, jnp.int32(0),
                   reps=reps)

    # -- chained stage loops ------------------------------------------------
    def chain(body):
        def run(o0, d0):
            def it(i, carry):
                oo, dd, acc = carry
                oo2, dd2, a = body(i, oo, dd)
                return oo2, dd2, acc + a
            _, _, acc = jax.lax.fori_loop(0, ITERS, it, (o0, d0, jnp.zeros((N,))))
            return acc
        return jax.jit(run)

    tmax = jnp.full((N,), INFINITY)

    def b_intersect(i, oo, dd):
        hit = trace.scene_intersect(scene, cfg, oo, dd, tmax)
        dd2 = jnp.where((hit.t < 1.0)[:, None], -dd, dd)
        return oo + 1e-6 * dd, dd2, hit.t

    t_int = timed("intersect only (x9)", chain(b_intersect), o, d, reps=reps)

    def b_interaction(i, oo, dd):
        hit = trace.scene_intersect(scene, cfg, oo, dd, tmax)
        it_ = trace.make_interaction(scene, cfg, oo, dd, hit)
        return it_.p + 1e-6 * dd, jnp.where((it_.mat > 0)[:, None], -dd, dd), hit.t

    t_ia = timed("intersect + make_interaction (x9)", chain(b_interaction), o,
                 d, reps=reps)

    # sampler dims (once per chunk in the real path)
    n_dims = path.CAMERA_DIMS + path.DIMS_PER_BOUNCE * (DEPTH + 1)

    def dims_fn(s):
        return samplers.sample_all_dims(sampler, pixel, sample + s, n_dims)

    t_dims = timed("sample_all_dims (77 dims, once)", jax.jit(dims_fn),
                   jnp.int32(0), reps=reps)
    U = dims_fn(jnp.int32(0))

    def b_nee(i, oo, dd):
        hit = trace.scene_intersect(scene, cfg, oo, dd, tmax)
        it_ = trace.make_interaction(scene, cfg, oo, dd, hit)
        base = path.CAMERA_DIMS + (i % (DEPTH + 1)) * path.DIMS_PER_BOUNCE
        ub = jax.lax.dynamic_slice(U, (jnp.int32(0), base),
                                   (N, path.DIMS_PER_BOUNCE))
        wo_local = trace.to_local(it_, it_.wo)
        light_idx, lp = path._choose_light(scene, cfg, ub[:, 0], it_.p)
        ls = lights_mod.sample_li(scene, cfg, light_idx, it_.p, ub[:, 1:3])
        wi_local = trace.to_local(it_, ls.wi)
        f_l, sp = mat_mod.evaluate(scene.materials, it_.mat, cfg, wo_local,
                                   wi_local, None)
        so, sd, st = trace.shadow_ray(it_, ls.target, ls.is_infinite)
        occ = trace.scene_occluded(scene, cfg, so, sd, st)
        a = jnp.where(occ, 0.0, jnp.sum(f_l, -1) * ls.pdf + sp)
        return it_.p + 1e-6 * dd, jnp.where((a > 0.5)[:, None], -dd, dd), a

    t_nee = timed("+ NEE (light sample/eval/shadow) (x9)", chain(b_nee), o, d,
                  reps=reps)

    def b_ext(i, oo, dd):
        hit = trace.scene_intersect(scene, cfg, oo, dd, tmax)
        it_ = trace.make_interaction(scene, cfg, oo, dd, hit)
        base = path.CAMERA_DIMS + (i % (DEPTH + 1)) * path.DIMS_PER_BOUNCE
        ub = jax.lax.dynamic_slice(U, (jnp.int32(0), base),
                                   (N, path.DIMS_PER_BOUNCE))
        wo_local = trace.to_local(it_, it_.wo)
        smp = mat_mod.sample(scene.materials, it_.mat, cfg, wo_local,
                             ub[:, 5:7], ub[:, 5], None)
        wi_world = trace.to_world(it_, smp.wi)
        no, nd = trace.spawn_ray(it_, wi_world)
        return no, nd, smp.pdf

    t_ext = timed("intersect+interaction+BSDF-sample (x9)", chain(b_ext), o,
                  d, reps=reps)

    # emission-MIS block (fast-MIS only): light_rows one-hot fetch
    def b_emis(i, oo, dd):
        hit = trace.scene_intersect(scene, cfg, oo, dd, tmax)
        it_ = trace.make_interaction(scene, cfg, oo, dd, hit)
        lidx = jnp.maximum(it_.light, 0)
        lrow = lights_mod.light_rows(scene, lidx)
        cr = jnp.cross(lrow.p1 - lrow.p0, lrow.p2 - lrow.p0)
        a = jnp.sum(cr, -1) + hit.t
        return it_.p + 1e-6 * dd, jnp.where((a > 0.5)[:, None], -dd, dd), a

    t_emis = timed("intersect+interaction+light_rows (x9)", chain(b_emis), o,
                   d, reps=reps)

    print("---- derived (per 9-bounce chunk) ----")
    print(f"interaction  ~ {1000*(t_ia - t_int):8.1f} ms")
    print(f"NEE block    ~ {1000*(t_nee - t_ia):8.1f} ms")
    print(f"BSDF sample  ~ {1000*(t_ext - t_ia):8.1f} ms")
    print(f"emission-MIS ~ {1000*(t_emis - t_ia):8.1f} ms")
    print(f"sampler dims ~ {1000*t_dims:8.1f} ms")
    print(f"sum of stages ~ {1000*(t_nee + (t_ext-t_ia) + (t_emis-t_ia) + t_dims):8.1f} ms vs FULL {1000*t_full:8.1f} ms")


if __name__ == "__main__":
    main()
