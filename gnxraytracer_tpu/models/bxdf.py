"""BxDF lobes as pure batched functions in the local shading frame.

Functional re-design of the reference's BxDF class hierarchy
(/root/reference/core/Reflection.{h,cpp}): every lobe is a triple of pure
functions over (..., 3) local directions (z = shading normal):

    f(wo, wi, params)        -> (..., 3) reflectance
    sample(wo, u, params)    -> (wi, pdf, f) with detached direction
    pdf(wo, wi, params)      -> (...,)

Gradients: directions/pdfs sampled *detached* (stop_gradient), f evaluated
*attached* — the detached-sampling reparameterized estimator of the north
star (BASELINE.json).  Mixtures/material assemblies live in materials.py.
"""

import jax
import jax.numpy as jnp

from ..constants import INV_PI, PI
from ..ops.sampling import cosine_sample_hemisphere
from ..utils.math import (
    abs_cos_theta, cos_phi, cos_theta, cos2_phi, same_hemisphere, sin_phi,
    sin2_phi, sin_theta, tan2_theta, tan_theta,
)

# ---------------------------------------------------------------------------
# Fresnel (Reflection.cpp:16-87)
# ---------------------------------------------------------------------------

def fr_dielectric(cos_theta_i, eta_i, eta_t):
    """Unpolarized dielectric Fresnel; handles both sides by swapping."""
    ci = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = ci > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    ci = jnp.abs(ci)
    si = jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    st = ei / et * si
    tir = st >= 1.0
    # sanitize BEFORE the sqrt: at (or beyond) total internal reflection
    # 1-st^2 <= 0 and sqrt's derivative w.r.t. eta is infinite, which would
    # leak NaN through the jnp.where below into eta gradients
    sts = jnp.where(tir, 0.0, st)
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sts * sts))
    r_parl = (et * ci - ei * ct) / jnp.where(et * ci + ei * ct == 0, 1.0, et * ci + ei * ct)
    r_perp = (ei * ci - et * ct) / jnp.where(ei * ci + et * ct == 0, 1.0, ei * ci + et * ct)
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, fr)


def fr_conductor(cos_theta_i, eta_i, eta_t, k):
    """Conductor Fresnel with complex IOR (Reflection.cpp:41), per channel.

    cos_theta_i: (...,); eta_i/eta_t/k: (..., 3). Returns (..., 3).
    """
    ci = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)[..., None]
    eta = eta_t / eta_i
    etak = k / eta_i
    cos2 = ci * ci
    sin2 = 1.0 - cos2
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - sin2
    a2b2 = jnp.sqrt(jnp.maximum(0.0, t0 * t0 + 4.0 * eta2 * etak2))
    t1 = a2b2 + cos2
    a = jnp.sqrt(jnp.maximum(0.0, 0.5 * (a2b2 + t0)))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / (t1 + t2)
    t3 = cos2 * a2b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / (t3 + t4)
    return 0.5 * (rp + rs)


def schlick_fresnel(cos_t, r0):
    m = jnp.clip(1.0 - cos_t, 0.0, 1.0)
    m2 = m * m
    return r0 + (1.0 - r0) * (m2 * m2 * m)


# ---------------------------------------------------------------------------
# Lambertian (Reflection.h:197, f at Reflection.cpp:135)
# ---------------------------------------------------------------------------

def lambert_f(wo, wi, kd):
    same = same_hemisphere(wo, wi)
    return jnp.where(same[..., None], kd * INV_PI, 0.0)


def lambert_pdf(wo, wi):
    return jnp.where(same_hemisphere(wo, wi), abs_cos_theta(wi) * INV_PI, 0.0)


# ---------------------------------------------------------------------------
# Oren-Nayar (Reflection.h:232-251, f at Reflection.cpp:173)
# ---------------------------------------------------------------------------

def oren_nayar_ab(sigma_deg):
    """A/B coefficients from sigma in degrees (Reflection.h:238-244)."""
    sigma = jnp.deg2rad(sigma_deg)
    sigma2 = sigma * sigma
    a = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
    b = 0.45 * sigma2 / (sigma2 + 0.09)
    return a, b


def oren_nayar_f(wo, wi, kd, sigma_deg):
    a, b = oren_nayar_ab(sigma_deg)
    sin_ti = sin_theta(wi)
    sin_to = sin_theta(wo)
    # max cos(phi_i - phi_o)
    both = (sin_ti > 1e-4) & (sin_to > 1e-4)
    d_cos = cos_phi(wi) * cos_phi(wo) + sin_phi(wi) * sin_phi(wo)
    max_cos = jnp.where(both, jnp.maximum(0.0, d_cos), 0.0)
    abs_ci = abs_cos_theta(wi)
    abs_co = abs_cos_theta(wo)
    i_larger = abs_ci > abs_co
    sin_alpha = jnp.where(i_larger, sin_to, sin_ti)
    tan_beta = jnp.where(
        i_larger,
        sin_ti / jnp.maximum(abs_ci, 1e-8),
        sin_to / jnp.maximum(abs_co, 1e-8),
    )
    val = INV_PI * (a + b * max_cos * sin_alpha * tan_beta)
    same = same_hemisphere(wo, wi)
    return jnp.where(same[..., None], kd * val[..., None], 0.0)


# Cosine-hemisphere sampling shared by diffuse lobes (BxDF::Sample_f default,
# Reflection.cpp:439 region)

def diffuse_sample_wi(wo, u):
    """Detached cosine sample flipped into wo's hemisphere."""
    wi = cosine_sample_hemisphere(u)
    flip = wo[..., 2] < 0.0
    wi = wi * jnp.where(flip[..., None], jnp.asarray([1.0, 1.0, -1.0]), 1.0)
    return jax.lax.stop_gradient(wi)


# ---------------------------------------------------------------------------
# Specular dielectric (SpecularReflection/Transmission/FresnelSpecular,
# Reflection.cpp:89-131,346-396)
# ---------------------------------------------------------------------------

def specular_mirror_sample(wo, kr):
    """Perfect mirror with FresnelNoOp (MirrorMaterial): wi=(-x,-y,z),
    weight = kr (pdf 1, f = kr/|cos|, so f*|cos|/pdf = kr)."""
    wi = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    return jax.lax.stop_gradient(wi), kr


def fresnel_specular_sample(wo, uc, eta_a, eta_b):
    """Stochastic reflect/transmit split (FresnelSpecular::Sample_f,
    Reflection.cpp:346).  Returns
    (wi, weight_r, weight_t, choose_r, pdf, is_transmission).

    weight already includes the f*|cos|/pdf simplification:
      reflect:  F (pdf = F)        -> weight kr*F/F = kr
      transmit: (1-F)*eta^2 factor -> weight kt*(1-F)... /(1-F) = kt*eta_scale
    The radiance (importance-unaware) eta^2 factor matches the reference's
    TransportMode::Radiance path.
    """
    ct = cos_theta(wo)
    f = fr_dielectric(ct, eta_a, eta_b)
    choose_r = uc < f
    # reflection branch
    wi_r = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    # transmission branch
    entering = ct > 0.0
    ei = jnp.where(entering, eta_a, eta_b)
    et = jnp.where(entering, eta_b, eta_a)
    eta = ei / et
    n = jnp.concatenate(
        [jnp.zeros_like(wo[..., :2]), jnp.where(entering, 1.0, -1.0)[..., None]],
        axis=-1,
    )
    from ..utils.math import refract

    ok, wi_t = refract(wo, n, eta)
    wi = jnp.where(choose_r[..., None], wi_r, wi_t)
    pdf = jnp.where(choose_r, f, 1.0 - f)
    # (1 - F) is cancelled by pdf; radiance-mode scale eta^2 = (ei/et)^2
    eta_scale_t = eta * eta
    return (
        jax.lax.stop_gradient(wi),
        f,
        (1.0 - f) * eta_scale_t,
        choose_r,
        pdf,
        ok,
    )
