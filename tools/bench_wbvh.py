"""On-chip A/B: binary threaded packet kernel (ops/pallas_bvh) vs wide
BVH4 scalar-stack kernel (ops/pallas_wbvh) on the BASELINE config-4 mesh.

Workloads mirror the bench chunk's cast mix (PERF.md r3 anatomy):
  * camera: 1M coherent primary rays from the envmesh camera
  * bounce: 1M rays with origins ON the mesh surface and cosine-fanned
    directions (the incoherent casts that dominate the chunk)

Run:  python tools/bench_wbvh.py [n_rays]
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

from gnxraytracer_tpu.ops import pallas_bvh as pb
from gnxraytracer_tpu.ops import pallas_wbvh as wb
from gnxraytracer_tpu.scene import presets


def make_rays(scene, camera, n, rs):
    import gnxraytracer_tpu.scene.camera as cam_mod

    hw = 500 * 500
    pixel = jnp.asarray(rs.randint(0, hw, n), jnp.int32)
    px = (pixel % 500).astype(jnp.float32) + 0.5
    py = (pixel // 500).astype(jnp.float32) + 0.5
    p_film = jnp.stack([px, py], -1)
    o, d, _ = cam_mod.generate_rays(camera, p_film, jnp.zeros((n,)),
                                    jnp.zeros((n, 2)))
    return o, d


def make_bounce_rays(scene, n, rs):
    """Origins on random mesh triangles, cosine-hemisphere directions."""
    verts = np.asarray(scene.geom.vertices)
    tris = np.asarray(scene.geom.triangles)
    ti = rs.randint(0, len(tris), n)
    b1 = rs.rand(n).astype(np.float32)
    b2 = rs.rand(n).astype(np.float32) * (1 - b1)
    p0, p1, p2 = (verts[tris[ti, k]] for k in range(3))
    o = p0 * (1 - b1 - b2)[:, None] + p1 * b1[:, None] + p2 * b2[:, None]
    ng = np.cross(p1 - p0, p2 - p0)
    ng /= np.maximum(np.linalg.norm(ng, axis=1, keepdims=True), 1e-12)
    u1, u2 = rs.rand(n), rs.rand(n)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    x, y = r * np.cos(phi), r * np.sin(phi)
    z = np.sqrt(np.maximum(1 - u1, 0))
    up = np.where(np.abs(ng[:, 2:3]) < 0.9, [0, 0, 1.0], [1.0, 0, 0])
    t0 = np.cross(up, ng)
    t0 /= np.maximum(np.linalg.norm(t0, axis=1, keepdims=True), 1e-12)
    t1 = np.cross(ng, t0)
    sgn = np.where(rs.rand(n) < 0.5, 1.0, -1.0)[:, None]  # both hemispheres
    d = (x[:, None] * t0 + y[:, None] * t1 + z[:, None] * ng * sgn)
    o = o + 1e-4 * np.sign(d * ng).sum(1, keepdims=True) * ng
    return (jnp.asarray(o.astype(np.float32)),
            jnp.asarray(d.astype(np.float32)))


def timed(name, fn, reps=3):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0][:8])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0][:8])
        ts.append(time.time() - t0)
    print(f"{name:44s} med {sorted(ts)[len(ts)//2]*1000:8.1f} ms  "
          f"min {min(ts)*1000:8.1f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rs = np.random.RandomState(0)
    scene, camera = presets.envmap_mesh(500, 500)
    bvh = scene.bvh
    print(f"mesh: {scene.geom.triangles.shape[0]} tris; "
          f"binary treelets: {None if bvh.treelets is None else bvh.treelets.nodes.shape}; "
          f"wide treelets: {bvh.wtreelets.rec.shape}", flush=True)

    from gnxraytracer_tpu.ops.bvh import ray_sort_perm

    tmax = jnp.full((n,), 1e30, jnp.float32)
    sweep = [(4, 4, 8), (6, 8, 8), (4, 8, 8), (2, 4, 8)]
    for wl_name, (o, d) in (
        ("camera", make_rays(scene, camera, n, rs)),
        ("bounce", make_bounce_rays(scene, n, rs)),
    ):
        key = "oct_morton" if wl_name == "camera" else "oct_morton8"
        timed(f"{wl_name}: sort+perm only",
              jax.jit(lambda o=o, d=d: ray_sort_perm(
                  o, d, bvh.bounds_lo[0], bvh.bounds_hi[0],
                  t_max=tmax, key_mode=key)))
        old = timed(f"{wl_name}: binary closest ({key})",
                    jax.jit(lambda o=o, d=d: pb.packet_closest_hit_pallas(
                        bvh, o, d, tmax, sort_key=key)))
        for wp_, wlq_, sub_ in sweep:
            os.environ["GNX_WBVH_WP"] = str(wp_)
            os.environ["GNX_WBVH_WLQ"] = str(wlq_)
            os.environ["GNX_WBVH_SUB"] = str(sub_)
            new = timed(f"{wl_name}: WIDE closest wp{wp_} wlq{wlq_} sub{sub_}",
                        jax.jit(lambda o=o, d=d: wb.wide_closest_hit_pallas(
                            bvh, o, d, tmax, sort_key=key)))
            hm = int(np.sum(np.asarray(old.hit) != np.asarray(new.hit)))
            if hm:
                print(f"   PARITY FAIL: hit mismatch {hm}", flush=True)
        os.environ["GNX_WBVH_WP"] = "8"
        os.environ["GNX_WBVH_WLQ"] = "8"
        os.environ["GNX_WBVH_SUB"] = "8"
        oldo = timed(f"{wl_name}: binary anyhit",
                     jax.jit(lambda o=o, d=d: pb.packet_any_hit_pallas(
                         bvh, o, d, 100.0, sort_key=key)))
        newo = timed(f"{wl_name}: WIDE anyhit 8/8/8",
                     jax.jit(lambda o=o, d=d: wb.wide_any_hit_pallas(
                         bvh, o, d, 100.0, sort_key=key)))
        om = int(np.sum(np.asarray(oldo) != np.asarray(newo)))
        print(f"   anyhit parity: occ mismatch {om}", flush=True)


if __name__ == "__main__":
    main()
