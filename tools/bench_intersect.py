"""Micro-bench: small-scene intersector variants at Cornell scale.

fori_loop (current), fori_loop(unroll=T), and any-hit — N=1M lanes, T=14.
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
from gnxraytracer_tpu.ops import intersect
from gnxraytracer_tpu.scene import presets

N = 1_000_000
CASTS = 9


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(out[0].ravel()[:1] if isinstance(out, tuple) else
               jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append(time.time() - t0)
    print(f"{name:46s} {min(ts)*1000:9.1f} ms", flush=True)
    return min(ts)


def chain_casts(cast_fn):
    """CASTS dependent casts (output perturbs next input) in one jit."""
    def run(o0, d0):
        def body(i, carry):
            o, d, acc = carry
            th = cast_fn(o, d)
            d2 = jnp.where((th.t < 2.0)[:, None], -d, d)
            return o + 1e-6 * d, d2, acc + th.t
        _, _, acc = jax.lax.fori_loop(0, CASTS, body,
                                      (o0, d0, jnp.zeros((N,))))
        return acc
    return jax.jit(run)


def main():
    scene, _ = presets.cornell_box(width=64, height=64)
    verts = scene.geom.vertices
    tris = scene.geom.triangles
    print(f"T={tris.shape[0]} triangles, N={N} lanes, {CASTS} chained casts")

    key = jax.random.PRNGKey(0)
    o = jnp.zeros((N, 3), jnp.float32) + jnp.asarray([0.0, 0.0, 2.0])
    d = jax.random.normal(key, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full((N,), INFINITY)

    def cast_current(oo, dd):
        return intersect.closest_triangle_hit_small(oo, dd, tmax, verts, tris,
                                                    unroll=1)

    timed("closest_small fori (rolled)", chain_casts(cast_current), o, d)

    # unrolled variant (monkeypatch trip via local copy)
    def cast_unrolled(oo, dd):
        return intersect.closest_triangle_hit_small(oo, dd, tmax, verts, tris,
                                                    unroll=True)

    try:
        timed("closest_small fori unroll=T", chain_casts(cast_unrolled), o, d)
    except TypeError:
        print("closest_small has no unroll param yet")

    def cast_any(oo, dd):
        occ = intersect.any_triangle_hit(oo, dd, tmax * 0 + 2.0, verts, tris)
        class R: t = occ.astype(jnp.float32)
        return R

    def chain_any(o0, d0):
        def body(i, carry):
            o_, d_, acc = carry
            occ = intersect.any_triangle_hit(o_, d_, jnp.full((N,), 2.0),
                                             verts, tris, unroll=1)
            d2 = jnp.where(occ[:, None], -d_, d_)
            return o_ + 1e-6 * d_, d2, acc + occ.astype(jnp.float32)
        _, _, acc = jax.lax.fori_loop(0, CASTS, body, (o0, d0, jnp.zeros((N,))))
        return acc

    timed("any_hit fori (rolled)", jax.jit(chain_any), o, d)

    def chain_any_unroll(o0, d0):
        def body(i, carry):
            o_, d_, acc = carry
            occ = intersect.any_triangle_hit(o_, d_, jnp.full((N,), 2.0),
                                             verts, tris, unroll=True)
            d2 = jnp.where(occ[:, None], -d_, d_)
            return o_ + 1e-6 * d_, d2, acc + occ.astype(jnp.float32)
        _, _, acc = jax.lax.fori_loop(0, CASTS, body, (o0, d0, jnp.zeros((N,))))
        return acc

    try:
        timed("any_hit fori unroll=T", jax.jit(chain_any_unroll), o, d)
    except TypeError:
        print("any_hit has no unroll param yet")


if __name__ == "__main__":
    main()
