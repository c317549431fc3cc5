"""BVH traversal benchmark on the real chip: blocked brute force vs
lockstep stack walk vs threaded stackless walk, over mesh sizes.

Mesh: procedural displaced icosphere-ish blob (watertight-ish, spatially
coherent — a fair BVH case, unlike uniform random triangle soup).
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
from gnxraytracer_tpu.ops import intersect

N = 1_000_000


def make_blob(n_seg):
    """UV-sphere with radial noise: 2*n_seg^2 triangles."""
    th = np.linspace(0, np.pi, n_seg + 1)
    ph = np.linspace(0, 2 * np.pi, n_seg + 1)
    T, P = np.meshgrid(th, ph, indexing="ij")
    rs = np.random.RandomState(0)
    R = 1.0 + 0.15 * np.sin(5 * T) * np.cos(7 * P)
    x = R * np.sin(T) * np.cos(P)
    y = R * np.sin(T) * np.sin(P)
    z = R * np.cos(T)
    V = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    idx = np.arange((n_seg + 1) * (n_seg + 1)).reshape(n_seg + 1, n_seg + 1)
    a = idx[:-1, :-1].ravel()
    b = idx[1:, :-1].ravel()
    c = idx[1:, 1:].ravel()
    d = idx[:-1, 1:].ravel()
    tris = np.concatenate([np.stack([a, b, c], -1), np.stack([a, c, d], -1)])
    return V, tris.astype(np.int32)


def rays(seed=1):
    rs = np.random.RandomState(seed)
    o = rs.randn(N, 3).astype(np.float32) * 0.2 + np.asarray([0, 0, 3.0],
                                                             np.float32)
    d = (rs.randn(N, 3).astype(np.float32) * 0.3 - np.asarray(
        [0, 0, 1.0], np.float32))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append(time.time() - t0)
    print(f"  {name:34s} {min(ts)*1000:9.1f} ms  "
          f"({N/min(ts)/1e6:6.1f} Mrays/s)", flush=True)
    return out


def coherent_rays():
    """Primary-like rays: pinhole at (0,0,3) through a 1000x1000 grid."""
    xs = (np.arange(1000) + 0.5) / 1000 * 2 - 1
    px, py = np.meshgrid(xs, xs, indexing="xy")
    d = np.stack([px.ravel(), py.ravel(), -np.ones(N)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(np.asarray([0, 0, 3.0], np.float32), (N, 3)).copy()
    return jnp.asarray(o), jnp.asarray(d)


def main():
    o_i, d_i = rays()
    o_c, d_c = coherent_rays()
    tmax = jnp.full((N,), 1e30, jnp.float32)
    for n_seg in (50, 158, 500):
        V, Tr = make_blob(n_seg)
        t_count = len(Tr)
        print(f"T = {t_count} triangles:", flush=True)
        vj, ij = jnp.asarray(V), jnp.asarray(Tr)
        tree = bvh_mod.build_bvh(V, Tr)
        print(f"  ({len(np.asarray(tree.offset))} nodes)", flush=True)

        if t_count <= 60_000:
            timed("brute blocked / coherent",
                  jax.jit(lambda oo, dd: intersect.closest_triangle_hit_blocked(
                      oo, dd, tmax, vj, ij)), o_c, d_c)
        for label, o, d in (("coherent", o_c, d_c), ("incoherent", o_i, d_i)):
            pk = timed(f"packet sorted / {label}",
                       jax.jit(lambda oo, dd: bvh_mod.packet_closest_hit_xla(
                           tree, oo, dd, tmax, sort=True)), o, d)
            timed(f"packet unsorted / {label}",
                  jax.jit(lambda oo, dd: bvh_mod.packet_closest_hit_xla(
                      tree, oo, dd, tmax, sort=False)), o, d)
            print(f"  packet hits ({label}): {np.asarray(pk.hit).sum()}",
                  flush=True)
        if t_count <= 6000:
            sless = timed("stackless / incoherent",
                          jax.jit(lambda oo, dd: bvh_mod.bvh_closest_hit_stackless(
                              tree, oo, dd, tmax)), o_i, d_i)
            print(f"  stackless hits: {np.asarray(sless.hit).sum()}",
                  flush=True)


if __name__ == "__main__":
    main()
