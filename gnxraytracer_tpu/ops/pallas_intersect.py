"""Pallas TPU kernel: fused brute-force ray-triangle closest hit.

The #1 hot op of the Cornell-class scenes (SURVEY.md §7: raygen ->
traverse/intersect -> shade pipeline).  This kernel keeps a block of rays
resident in VMEM and loops the scene's triangles in SMEM-fed scalars,
running the watertight test entirely on the VPU — one HBM read of the ray
SoA and one write of the hit record per block, instead of XLA's
per-op HBM round trips.

Layout: rays are blocked (BLOCK, ) flat lanes; triangle data is passed as
a (T, 9) f32 array small enough to sit in VMEM alongside the ray block.
Grid = ceil(N / BLOCK).  All lanes step triangles in lockstep (fori_loop),
carrying the running best hit in registers.

Used when cfg.use_pallas and the backend is TPU; numerically identical
(same zero-snap watertight math) to ops/intersect.closest_triangle_hit.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import INFINITY, gamma
from .intersect import TriHit, _EDGE_EPS

BLOCK = 2048
GAMMA3 = gamma(3)
GAMMA5 = gamma(5)


def _kernel(tri_ref, o_ref, d_ref, tmax_ref, t_out, tri_out, b_out, hit_out):
    """One ray block vs all triangles."""
    ox = o_ref[:, 0]
    oy = o_ref[:, 1]
    oz = o_ref[:, 2]
    dx = d_ref[:, 0]
    dy = d_ref[:, 1]
    dz = d_ref[:, 2]

    # per-ray permutation masks + shear (watertight setup)
    adx = jnp.abs(dx)
    ady = jnp.abs(dy)
    adz = jnp.abs(dz)
    m0 = (adx >= ady) & (adx >= adz)          # kz = 0
    m1 = (~m0) & (ady >= adz)                 # kz = 1
    dzp = jnp.where(m0, dx, jnp.where(m1, dy, dz))
    dxp = jnp.where(m0, dy, jnp.where(m1, dz, dx))
    dyp = jnp.where(m0, dz, jnp.where(m1, dx, dy))
    sx = -dxp / dzp
    sy = -dyp / dzp
    sz = 1.0 / dzp

    n_tri = tri_ref.shape[0]

    def edge(ax, ay, bx, by):
        p = ax * by
        q = ay * bx
        e = p - q
        tiny = jnp.abs(e) <= _EDGE_EPS * (jnp.abs(p) + jnp.abs(q))
        return jnp.where(tiny, 0.0, e)

    def body(ti, carry):
        best_t, best_tri, b0b, b1b, b2b, hit = carry
        tv = tri_ref[ti]  # (9,)

        def permuted(qx, qy, qz):
            px = qx - ox
            py = qy - oy
            pz = qz - oz
            x = jnp.where(m0, py, jnp.where(m1, pz, px))
            y = jnp.where(m0, pz, jnp.where(m1, px, py))
            z = jnp.where(m0, px, jnp.where(m1, py, pz))
            return x + sx * z, y + sy * z, z

        x0, y0, z0 = permuted(tv[0], tv[1], tv[2])
        x1, y1, z1 = permuted(tv[3], tv[4], tv[5])
        x2, y2, z2 = permuted(tv[6], tv[7], tv[8])
        e0 = edge(x1, y1, x2, y2)
        e1 = edge(x2, y2, x0, y0)
        e2 = edge(x0, y0, x1, y1)
        neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
        pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
        det = e0 + e1 + e2
        valid = ~(neg & pos) & (det != 0)
        z0s = sz * z0
        z1s = sz * z1
        z2s = sz * z2
        t_scaled = e0 * z0s + e1 * z1s + e2 * z2s
        det_neg = det < 0
        bad = jnp.where(
            det_neg,
            (t_scaled >= 0) | (t_scaled < best_t * det),
            (t_scaled <= 0) | (t_scaled > best_t * det),
        )
        valid &= ~bad
        inv_det = jnp.where(det != 0, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        t = t_scaled * inv_det
        max_zt = jnp.maximum(jnp.maximum(jnp.abs(z0s), jnp.abs(z1s)), jnp.abs(z2s))
        max_xt = jnp.maximum(jnp.maximum(jnp.abs(x0), jnp.abs(x1)), jnp.abs(x2))
        max_yt = jnp.maximum(jnp.maximum(jnp.abs(y0), jnp.abs(y1)), jnp.abs(y2))
        delta_x = GAMMA5 * (max_xt + max_zt)
        delta_y = GAMMA5 * (max_yt + max_zt)
        delta_e = 2.0 * (gamma(2) * max_xt * max_yt + delta_y * max_xt + delta_x * max_yt)
        max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
        delta_t = 3.0 * (GAMMA3 * max_e * max_zt + delta_e * max_zt
                         + GAMMA3 * max_zt * max_e) * jnp.abs(inv_det)
        valid &= t > delta_t

        better = valid & (t < best_t)
        return (
            jnp.where(better, t, best_t),
            jnp.where(better, ti, best_tri),
            jnp.where(better, e0 * inv_det, b0b),
            jnp.where(better, e1 * inv_det, b1b),
            jnp.where(better, e2 * inv_det, b2b),
            hit | better,
        )

    n = ox.shape[0]
    init = (
        tmax_ref[:],
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.bool_),
    )
    best_t, best_tri, b0, b1, b2, hit = jax.lax.fori_loop(0, n_tri, body, init)
    t_out[:] = jnp.where(hit, best_t, INFINITY)
    tri_out[:] = best_tri
    b_out[:, 0] = b0
    b_out[:, 1] = b1
    b_out[:, 2] = b2
    hit_out[:] = hit


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_closest_hit(o, d, t_max, tri_soa, interpret=False):
    """o,d: (N,3); t_max: (N,); tri_soa: (T,9) [p0|p1|p2]. N % BLOCK == 0
    is handled by padding here."""
    from jax.experimental import pallas as pl

    n = o.shape[0]
    n_pad = (-n) % BLOCK
    if n_pad:
        o = jnp.concatenate([o, jnp.ones((n_pad, 3), o.dtype)], 0)
        d = jnp.concatenate([d, jnp.ones((n_pad, 3), d.dtype)], 0)
        t_max = jnp.concatenate([t_max, jnp.zeros((n_pad,), t_max.dtype)], 0)
    n_tot = o.shape[0]
    grid = (n_tot // BLOCK,)

    t, tri, b, hit = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tri_soa.shape[0], 9), lambda i: (0, 0)),
            pl.BlockSpec((BLOCK, 3), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK, 3), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK,), lambda i: (i,)),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,)),
            pl.BlockSpec((BLOCK,), lambda i: (i,)),
            pl.BlockSpec((BLOCK, 3), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK,), lambda i: (i,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tot,), jnp.float32),
            jax.ShapeDtypeStruct((n_tot,), jnp.int32),
            jax.ShapeDtypeStruct((n_tot, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_tot,), jnp.bool_),
        ],
        interpret=interpret,
    )(tri_soa, o, d, t_max)
    return TriHit(hit=hit[:n], t=t[:n], tri=tri[:n], b=b[:n])


def tri_soa_from_mesh(vertices, triangles):
    """(T,9) [p0|p1|p2] layout for the kernel."""
    v = np.asarray(vertices)
    t = np.asarray(triangles)
    return jnp.asarray(
        np.concatenate([v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]], axis=1).astype(np.float32)
    )
