"""Sphere area sampling: uniform surface sampling and cone sampling toward
a reference point, with the matching solid-angle pdfs.

The reference's Sphere is a stub that never fills its hit record or
implements Sample (/root/reference/shape/Sphere.h:28-56) — SURVEY.md §7
requires a *complete* sphere, so these are the pbrt-v3 sphere-sampling
semantics the reference's Shape interface promises (core/Shape.h:22-38):

  * `sample_uniform` — area sampling over the whole sphere, pdf 1/area;
  * `sample_from_ref` — when the reference point is outside, importance
    sample the visible cone (the pbrt cone-sampling derivation with the
    dc/ds geometry); inside, fall back to uniform area sampling with the
    area->solid-angle conversion (core/Shape.cpp:21-36);
  * `pdf_from_ref` — solid-angle pdf of a direction toward the sphere
    (uniform cone pdf outside; area-converted pdf inside).

All batched over (N,) lanes and differentiable w.r.t. center/radius.
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import INFINITY, PI
from ..ops.sampling import (
    uniform_cone_pdf, uniform_sample_sphere, uniform_sphere_pdf,
)
from ..utils.math import (
    coordinate_system, distance, dot, length_squared, normalize,
    spherical_direction_basis,
)


class ShapeSample(NamedTuple):
    p: jnp.ndarray    # (N,3) sampled point on the sphere
    n: jnp.ndarray    # (N,3) outward normal
    pdf: jnp.ndarray  # (N,) pdf (area measure for sample_uniform,
                      #          solid-angle for sample_from_ref)


def sphere_area(radius):
    return 4.0 * PI * radius * radius


def sample_uniform(center, radius, u2):
    """Shape::Sample(u): uniform over the surface, pdf = 1/area."""
    dir_ = uniform_sample_sphere(u2)
    p = center + radius[..., None] * dir_
    pdf = 1.0 / sphere_area(radius)
    return ShapeSample(p=p, n=dir_, pdf=pdf)


def sample_from_ref(center, radius, ref_p, u2):
    """Sphere::Sample(ref, u): cone sampling of the visible cap when ref is
    outside; uniform area sampling converted to solid angle when inside.

    Returns ShapeSample with a solid-angle pdf.
    """
    dc2 = length_squared(ref_p - center)
    dc = jnp.sqrt(jnp.maximum(dc2, 1e-20))
    r2 = radius * radius
    inside = dc2 <= r2

    # ---- outside: sample the cone subtended by the sphere ----
    wc = normalize(center - ref_p, eps=1e-20)
    wc_x, wc_y = coordinate_system(wc)
    sin2_theta_max = r2 / dc2
    cos_theta_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_theta_max))
    cos_theta = (1.0 - u2[..., 0]) + u2[..., 0] * cos_theta_max
    sin2_theta = jnp.maximum(0.0, 1.0 - cos_theta * cos_theta)
    phi = u2[..., 1] * 2.0 * PI
    # distance to the sampled point on the sphere along the cone ray
    ds = dc * cos_theta - jnp.sqrt(
        jnp.maximum(0.0, r2 - dc2 * sin2_theta)
    )
    # angle alpha at the sphere center (pbrt: cosAlpha from law of cosines)
    cos_alpha = (dc2 + r2 - ds * ds) / jnp.maximum(2.0 * dc * radius, 1e-20)
    sin_alpha = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_alpha * cos_alpha))
    n_out = spherical_direction_basis(sin_alpha, cos_alpha, phi,
                                      -wc_x, -wc_y, -wc)
    p_out = center + radius[..., None] * n_out
    pdf_out = uniform_cone_pdf(cos_theta_max)

    # ---- inside: uniform area + area->solid-angle conversion ----
    s_in = sample_uniform(center, radius, u2)
    wi = s_in.p - ref_p
    d2 = length_squared(wi)
    wi_n = normalize(wi, eps=1e-20)
    cos_surf = jnp.abs(dot(s_in.n, -wi_n))
    pdf_in = jnp.where(
        cos_surf > 1e-9,
        s_in.pdf * d2 / jnp.maximum(cos_surf, 1e-9),
        0.0,
    )

    pick = inside[..., None]
    return ShapeSample(
        p=jnp.where(pick, s_in.p, p_out),
        n=jnp.where(pick, s_in.n, n_out),
        pdf=jnp.where(inside, pdf_in, pdf_out),
    )


def pdf_from_ref(center, radius, ref_p, wi):
    """Sphere::Pdf(ref, wi): solid-angle pdf of direction wi hitting the
    sphere from ref_p (uniform-cone outside; pdf-by-reintersection inside,
    core/Shape.cpp:38-54)."""
    dc2 = length_squared(ref_p - center)
    r2 = radius * radius
    inside = dc2 <= r2

    sin2_theta_max = r2 / jnp.maximum(dc2, 1e-20)
    cos_theta_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_theta_max))
    pdf_out = uniform_cone_pdf(cos_theta_max)

    # inside: intersect ray(ref, wi) with the sphere, convert area pdf
    oc = ref_p - center
    b = dot(oc, wi)
    c = length_squared(oc) - r2
    disc = b * b - c
    hit = disc > 0
    t = -b + jnp.sqrt(jnp.maximum(disc, 0.0))  # far root (exit point)
    p_hit = ref_p + t[..., None] * wi
    n_hit = normalize(p_hit - center, eps=1e-20)
    cos_surf = jnp.abs(dot(n_hit, -wi))
    pdf_in = jnp.where(
        hit & (cos_surf > 1e-9),
        (t * t) / (jnp.maximum(cos_surf, 1e-9) * sphere_area(radius)),
        0.0,
    )
    # a direction missing the sphere from outside has pdf 0 only via the
    # cone membership; uniform_cone_pdf is constant inside the cone, so
    # gate on the direction actually being inside the cone
    wc = normalize(center - ref_p, eps=1e-20)
    in_cone = dot(wc, wi) >= cos_theta_max
    pdf_out = jnp.where(in_cone, pdf_out, 0.0)
    return jnp.where(inside, pdf_in, pdf_out)
