"""Batched ray-primitive intersection.

The watertight ray-triangle test follows the same algorithm as the
reference (/root/reference/shape/Triangle.cpp:71-300 — translate to ray
origin, permute axes so |d| is largest in z, shear, signed edge functions,
conservative deltaT error bound), but fully vectorized over a
(rays x triangles) broadcast instead of a per-ray scalar loop.  The one
deliberate deviation: the reference re-evaluates exactly-zero edge
functions in float64; TPUs have no f64, so that fallback is omitted (it
only fires on mathematically exact edge crossings; our unit tests compare
against a float64 oracle away from those).

Sphere intersection implements the *full* quadratic hit (the reference
Sphere is a stub that never fills the hit record, shape/Sphere.h:28-56 —
SURVEY.md §7 directs building the real thing).
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import INFINITY, gamma

GAMMA3 = gamma(3)
GAMMA5 = gamma(5)
GAMMA7 = gamma(7)


class TriHit(NamedTuple):
    """Per-ray closest triangle hit (SoA)."""
    hit: jnp.ndarray  # (N,) bool
    t: jnp.ndarray  # (N,)
    tri: jnp.ndarray  # (N,) int32, valid where hit
    b: jnp.ndarray  # (N,3) barycentrics (b0, b1, b2)


def _permute_shear(o, d):
    """Precompute the axis permutation + shear for each ray.

    Gather-free: kz = argmax |d| is one of three cases, so permuted
    components come from where-chains (TPU VPU selects), never a
    per-lane gather.  Returns (kz_masks (m0,m1,m2), shear (N,3)).
    """
    ad = jnp.abs(d)
    kz = jnp.argmax(ad, axis=-1).astype(jnp.int32)
    m0 = kz == 0  # perm (kx,ky,kz) = (1,2,0)
    m1 = kz == 1  # (2,0,1)
    # else kz == 2: identity (0,1,2)
    dz = jnp.where(m0, d[..., 0], jnp.where(m1, d[..., 1], d[..., 2]))
    dx = jnp.where(m0, d[..., 1], jnp.where(m1, d[..., 2], d[..., 0]))
    dy = jnp.where(m0, d[..., 2], jnp.where(m1, d[..., 0], d[..., 1]))
    sx = -dx / dz
    sy = -dy / dz
    sz = 1.0 / dz
    shear = jnp.stack([sx, sy, sz], axis=-1)
    return (m0, m1), shear


def _permute3(m0, m1, v):
    """Apply the kz permutation to (..., 3) components via selects."""
    x = jnp.where(m0, v[..., 1], jnp.where(m1, v[..., 2], v[..., 0]))
    y = jnp.where(m0, v[..., 2], jnp.where(m1, v[..., 0], v[..., 1]))
    z = jnp.where(m0, v[..., 0], jnp.where(m1, v[..., 1], v[..., 2]))
    return x, y, z


def ray_triangles_watertight(o, d, t_max, p0, p1, p2):
    """Watertight intersection of N rays against T triangles, broadcast.

    o, d: (N, 3); t_max: (N,); p0/p1/p2: (T, 3).
    Returns (valid (N, T), t (N, T), b0, b1, b2 (N, T)).
    """
    (m0, m1), shear = _permute_shear(o, d)
    m0b = m0[:, None]
    m1b = m1[:, None]

    def permuted(p):
        pt = p[None] - o[:, None]  # translate: (N,T,3)
        return _permute3(m0b, m1b, pt)

    p0x, p0y, p0z = permuted(p0)
    p1x, p1y, p1z = permuted(p1)
    p2x, p2y, p2z = permuted(p2)

    sx = shear[:, None, 0]
    sy = shear[:, None, 1]
    sz = shear[:, None, 2]

    x0 = p0x + sx * p0z
    y0 = p0y + sy * p0z
    x1 = p1x + sx * p1z
    y1 = p1y + sy * p1z
    x2 = p2x + sx * p2z
    y2 = p2y + sy * p2z

    e0 = x1 * y2 - y1 * x2
    e1 = x2 * y0 - y2 * x0
    e2 = x0 * y1 - y0 * x1

    # Same-sign test (no f64 fallback; see module docstring)
    neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
    pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
    det = e0 + e1 + e2
    valid = ~(neg & pos) & (det != 0)

    z0 = sz * p0z
    z1 = sz * p1z
    z2 = sz * p2z
    t_scaled = e0 * z0 + e1 * z1 + e2 * z2

    det_neg = det < 0
    # reference: reject t<=0 or t>tMax via sign-aware comparisons
    bad_neg = det_neg & ((t_scaled >= 0) | (t_scaled < t_max[:, None] * det))
    bad_pos = (~det_neg) & ((t_scaled <= 0) | (t_scaled > t_max[:, None] * det))
    valid &= ~(bad_neg | bad_pos)

    inv_det = jnp.where(det != 0, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    b2 = e2 * inv_det
    t = t_scaled * inv_det

    # Conservative deltaT bound (Triangle.cpp:153-168): require t > deltaT
    max_zt = jnp.maximum(jnp.maximum(jnp.abs(z0), jnp.abs(z1)), jnp.abs(z2))
    delta_z = GAMMA3 * max_zt
    max_xt = jnp.maximum(jnp.maximum(jnp.abs(x0), jnp.abs(x1)), jnp.abs(x2))
    max_yt = jnp.maximum(jnp.maximum(jnp.abs(y0), jnp.abs(y1)), jnp.abs(y2))
    delta_x = GAMMA5 * (max_xt + max_zt)
    delta_y = GAMMA5 * (max_yt + max_zt)
    delta_e = 2.0 * (gamma(2) * max_xt * max_yt + delta_y * max_xt + delta_x * max_yt)
    max_e = jnp.maximum(jnp.maximum(jnp.abs(e0), jnp.abs(e1)), jnp.abs(e2))
    delta_t = 3.0 * (
        GAMMA3 * max_e * max_zt + delta_e * max_zt + delta_z * max_e
    ) * jnp.abs(inv_det)
    valid &= t > delta_t

    return valid, t, b0, b1, b2


def closest_triangle_hit(o, d, t_max, vertices, triangles):
    """Brute-force closest hit over an indexed mesh.

    o, d: (N,3); t_max: (N,); vertices: (V,3); triangles: (T,3) int32.
    Good for small scenes (Cornell box); large meshes go through the BVH.
    """
    p0 = vertices[triangles[:, 0]]
    p1 = vertices[triangles[:, 1]]
    p2 = vertices[triangles[:, 2]]
    valid, t, b0, b1, b2 = ray_triangles_watertight(o, d, t_max, p0, p1, p2)
    t_masked = jnp.where(valid, t, INFINITY)
    best = jnp.argmin(t_masked, axis=-1).astype(jnp.int32)  # (N,)
    n = o.shape[0]
    rows = jnp.arange(n)
    hit = valid[rows, best]
    return TriHit(
        hit=hit,
        t=jnp.where(hit, t_masked[rows, best], INFINITY),
        tri=best,
        b=jnp.stack([b0[rows, best], b1[rows, best], b2[rows, best]], axis=-1),
    )


def any_triangle_hit(o, d, t_max, vertices, triangles):
    """Brute-force any-hit (shadow ray, IntersectP semantics)."""
    p0 = vertices[triangles[:, 0]]
    p1 = vertices[triangles[:, 1]]
    p2 = vertices[triangles[:, 2]]
    valid, _, _, _, _ = ray_triangles_watertight(o, d, t_max, p0, p1, p2)
    return jnp.any(valid, axis=-1)


# ---------------------------------------------------------------------------
# Spheres
# ---------------------------------------------------------------------------

class SphHit(NamedTuple):
    hit: jnp.ndarray  # (N,) bool
    t: jnp.ndarray  # (N,)
    sph: jnp.ndarray  # (N,) int32


def ray_spheres(o, d, t_max, center, radius):
    """N rays vs S spheres; returns (valid (N,S), t (N,S)) nearest positive root."""
    oc = o[:, None] - center[None]  # (N,S,3)
    a = jnp.sum(d * d, axis=-1)[:, None]
    b = 2.0 * jnp.sum(oc * d[:, None], axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - (radius * radius)[None]
    disc = b * b - 4 * a * c
    ok = disc > 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0, -0.5 * (b - sq), -0.5 * (b + sq))
    t0 = q / a
    t1 = c / jnp.where(q == 0, 1.0, q)
    t_near = jnp.minimum(t0, t1)
    t_far = jnp.maximum(t0, t1)
    eps = 1e-4
    t = jnp.where(t_near > eps, t_near, t_far)
    ok &= (t > eps) & (t < t_max[:, None])
    return ok, t


def closest_sphere_hit(o, d, t_max, center, radius):
    valid, t = ray_spheres(o, d, t_max, center, radius)
    t_masked = jnp.where(valid, t, INFINITY)
    best = jnp.argmin(t_masked, axis=-1).astype(jnp.int32)
    rows = jnp.arange(o.shape[0])
    hit = valid[rows, best]
    return SphHit(hit=hit, t=jnp.where(hit, t_masked[rows, best], INFINITY), sph=best)
