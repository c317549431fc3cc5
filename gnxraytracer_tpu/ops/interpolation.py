"""Catmull-Rom spline evaluation / integration / sampling / inversion and
Fourier evaluation / sampling — batched jnp equivalents of
/root/reference/core/Interpolation.{h,cpp}.

In the reference these support the BSSRDF tables (core/SubReflection.cpp)
and FourierBSDF. All functions are pure and batched: the reference's
"while (true)" Newton-bisection solvers (Interpolation.cpp:108-134,
196-225, 286-310) become fixed-count iteration loops with where-masked
interval updates — every lane runs the same instruction stream, converged
lanes simply stop changing (Newton is quadratic: 16 iterations exceed the
reference's 1e-6 tolerance for these smooth splines).
"""

import jax
import jax.numpy as jnp

from ..constants import PI

_NEWTON_ITERS = 16


def _find_interval(nodes, x):
    """FindInterval over a sorted 1D node array (GNXRayTracer.h helper)."""
    idx = jnp.searchsorted(nodes, x, side="right") - 1
    return jnp.clip(idx, 0, nodes.shape[0] - 2)


def catmull_rom_weights(nodes, x):
    """CatmullRomWeights (Interpolation.cpp:21-72): (offset, w0..w3, ok).

    nodes: (K,) sorted; x: (...,). Weights apply to values[offset + i],
    i in 0..3, with the reference's boundary folding. ok mirrors the
    reference's false return for x outside [nodes[0], nodes[-1]].
    """
    k = nodes.shape[0]
    ok = (x >= nodes[0]) & (x <= nodes[-1])
    i = _find_interval(nodes, x)
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
    w0_prev = d0 * (x1 - x0) / jnp.where(x1 == x_prev, 1.0, x1 - x_prev)
    w0 = jnp.where(has_prev, -w0_prev, 0.0)
    w2 = w2 + jnp.where(has_prev, w0_prev, d0)
    w1 = w1 - jnp.where(has_prev, 0.0, d0)
    w3_next = d1 * (x1 - x0) / jnp.where(x_next == x0, 1.0, x_next - x0)
    w3 = jnp.where(has_next, w3_next, 0.0)
    w1 = w1 - jnp.where(has_next, w3_next, d1)
    w2 = w2 + jnp.where(has_next, 0.0, d1)
    return i - 1, w0, w1, w2, w3, ok


def catmull_rom_eval(nodes, values, x):
    """1D Catmull-Rom interpolation of values at query points x."""
    off, w0, w1, w2, w3, ok = catmull_rom_weights(nodes, x)
    k = nodes.shape[0]

    def val(j):
        return values[jnp.clip(off + j, 0, k - 1)]

    out = w0 * val(0) + w1 * val(1) + w2 * val(2) + w3 * val(3)
    return jnp.where(ok, out, 0.0)


def _segment_derivs(nodes, f, i):
    """Finite-difference endpoint derivatives for segment i
    (Interpolation.cpp:85-94 pattern, used by all four routines)."""
    k = nodes.shape[0]
    x0 = nodes[i]
    x1 = nodes[i + 1]
    f0 = f[i]
    f1 = f[i + 1]
    width = x1 - x0
    d0 = jnp.where(
        i > 0,
        width * (f1 - f[jnp.maximum(i - 1, 0)])
        / jnp.where(i > 0, x1 - nodes[jnp.maximum(i - 1, 0)], 1.0),
        f1 - f0,
    )
    d1 = jnp.where(
        i + 2 < k,
        width * (f[jnp.minimum(i + 2, k - 1)] - f0)
        / jnp.where(i + 2 < k, nodes[jnp.minimum(i + 2, k - 1)] - x0, 1.0),
        f1 - f0,
    )
    return x0, x1, f0, f1, d0, d1, width


def integrate_catmull_rom(nodes, values):
    """IntegrateCatmullRom (Interpolation.cpp:231-257): per-segment
    integral ((d0-d1)/12 + (f0+f1)/2)*width accumulated into a CDF.

    Returns (cdf (K,), total). Fully vectorized over segments.
    """
    i = jnp.arange(nodes.shape[0] - 1)
    _, _, f0, f1, d0, d1, width = _segment_derivs(nodes, values, i)
    seg = ((d0 - d1) * (1.0 / 12.0) + 0.5 * (f0 + f1)) * width
    cdf = jnp.concatenate([jnp.zeros(1, seg.dtype), jnp.cumsum(seg)])
    return cdf, cdf[-1]


def _spline_cdf_horner(t, f0, f1, d0, d1):
    """(Fhat, fhat): the segment-local integral and value in Horner form
    (Interpolation.cpp:113-122)."""
    fhat_int = t * (
        f0
        + t * (
            0.5 * d0
            + t * (
                (1.0 / 3.0) * (-2.0 * d0 - d1) + f1 - f0
                + t * (0.25 * (d0 + d1) + 0.5 * (f0 - f1))
            )
        )
    )
    fhat = f0 + t * (
        d0 + t * (-2.0 * d0 - d1 + 3.0 * (f1 - f0) + t * (d0 + d1 + 2.0 * (f0 - f1)))
    )
    return fhat_int, fhat


def _invert_segment_integral(u, f0, f1, d0, d1):
    """Newton-bisection solve of Fhat(t) = u on [0, 1]
    (Interpolation.cpp:100-134), fixed iteration count."""
    t0 = jnp.where(
        f0 != f1,
        (f0 - jnp.sqrt(jnp.maximum(0.0, f0 * f0 + 2.0 * u * (f1 - f0))))
        / jnp.where(f0 == f1, 1.0, f0 - f1),
        u / jnp.where(f0 == 0, 1.0, f0),
    )

    def body(_, carry):
        a, b, t = carry
        t = jnp.where((t > a) & (t < b), t, 0.5 * (a + b))
        fhat_int, fhat = _spline_cdf_horner(t, f0, f1, d0, d1)
        below = fhat_int - u < 0
        a = jnp.where(below, t, a)
        b = jnp.where(below, b, t)
        t = t - (fhat_int - u) / jnp.where(jnp.abs(fhat) < 1e-12,
                                           jnp.where(fhat < 0, -1e-12, 1e-12),
                                           fhat)
        return a, b, t

    a, b, t = jax.lax.fori_loop(
        0, _NEWTON_ITERS, body,
        (jnp.zeros_like(u), jnp.ones_like(u), t0),
    )
    t = jnp.where((t > a) & (t < b), t, 0.5 * (a + b))
    _, fhat = _spline_cdf_horner(t, f0, f1, d0, d1)
    return t, fhat


def sample_catmull_rom(nodes, f, cdf, u):
    """SampleCatmullRom (Interpolation.cpp:75-141): draw x ~ f via the
    precomputed spline CDF. Returns (x, fval, pdf)."""
    total = cdf[-1]
    uu = u * total
    i = jnp.clip(jnp.searchsorted(cdf, uu, side="right") - 1, 0,
                 nodes.shape[0] - 2)
    x0, _, f0, f1, d0, d1, width = _segment_derivs(nodes, f, i)
    u_seg = (uu - cdf[i]) / jnp.where(width == 0, 1.0, width)
    t, fhat = _invert_segment_integral(u_seg, f0, f1, d0, d1)
    return x0 + width * t, fhat, fhat / total


def sample_catmull_rom_2d(nodes1, nodes2, values, cdf, alpha, u):
    """SampleCatmullRom2D (Interpolation.cpp:143-229): sample the second
    axis of a 2D table at parameter alpha on the first axis.

    nodes1: (R,); nodes2: (M,); values/cdf: (R, M); alpha/u: (...,).
    Returns (x, fval, pdf). fval==0 where alpha is out of table range.
    """
    r = nodes1.shape[0]
    off, w0, w1, w2, w3, ok = catmull_rom_weights(nodes1, alpha)
    ws = (w0, w1, w2, w3)

    def interp(arr, idx):
        # weighted gather over 4 rho rows at column idx
        out = 0.0
        for j, w in enumerate(ws):
            row = jnp.clip(off + j, 0, r - 1)
            out = out + w * arr[row, idx]
        return out

    m = nodes2.shape[0]
    maximum = interp(cdf, m - 1)
    uu = u * maximum

    # FindInterval over the interpolated cdf: binary search unrolled over
    # log2(m) steps (the cdf slice is per-lane, so searchsorted can't be
    # used directly)
    lo = jnp.zeros_like(uu, jnp.int32)
    hi = jnp.full_like(lo, m - 1)
    import math

    for _ in range(int(math.ceil(math.log2(max(m, 2)))) + 1):
        mid = (lo + hi) // 2
        below = interp(cdf, mid) <= uu
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid)
    idx = jnp.clip(lo, 0, m - 2)

    f0 = interp(values, idx)
    f1 = interp(values, idx + 1)
    x0 = nodes2[idx]
    x1 = nodes2[idx + 1]
    width = x1 - x0
    u_seg = (uu - interp(cdf, idx)) / jnp.where(width == 0, 1.0, width)
    fm1 = interp(values, jnp.maximum(idx - 1, 0))
    fp2 = interp(values, jnp.minimum(idx + 2, m - 1))
    d0 = jnp.where(
        idx > 0,
        width * (f1 - fm1)
        / jnp.where(idx > 0, x1 - nodes2[jnp.maximum(idx - 1, 0)], 1.0),
        f1 - f0,
    )
    d1 = jnp.where(
        idx + 2 < m,
        width * (fp2 - f0)
        / jnp.where(idx + 2 < m, nodes2[jnp.minimum(idx + 2, m - 1)] - x0, 1.0),
        f1 - f0,
    )
    t, fhat = _invert_segment_integral(u_seg, f0, f1, d0, d1)
    x = x0 + width * t
    fval = jnp.where(ok, fhat, 0.0)
    pdf = jnp.where(ok, fhat / jnp.maximum(maximum, 1e-20), 0.0)
    return jnp.where(ok, x, 0.0), fval, pdf


def invert_catmull_rom(nodes, values, u):
    """InvertCatmullRom (Interpolation.cpp:259-312): solve spline(x) = u
    for monotonically increasing values."""
    below = u <= values[0]
    above = u >= values[-1]
    i = jnp.clip(jnp.searchsorted(values, u, side="right") - 1, 0,
                 nodes.shape[0] - 2)
    x0, _, f0, f1, d0, d1, width = _segment_derivs(nodes, values, i)

    def body(_, carry):
        a, b, t = carry
        t = jnp.where((t > a) & (t < b), t, 0.5 * (a + b))
        # spline value (not integral) in Horner form (Interpolation.cpp:292)
        fhat = (
            f0
            + t * (d0 + t * (-2.0 * d0 - d1 + 3.0 * (f1 - f0)
                             + t * (d0 + d1 + 2.0 * (f0 - f1))))
        )
        deriv = (
            d0 + t * (-4.0 * d0 - 2.0 * d1 + 6.0 * (f1 - f0)
                      + t * (3.0 * d0 + 3.0 * d1 + 6.0 * (f0 - f1)))
        )
        low = fhat - u < 0
        a = jnp.where(low, t, a)
        b = jnp.where(low, b, t)
        t = t - (fhat - u) / jnp.where(jnp.abs(deriv) < 1e-12,
                                       jnp.where(deriv < 0, -1e-12, 1e-12),
                                       deriv)
        return a, b, t

    a, b, t = jax.lax.fori_loop(
        0, _NEWTON_ITERS, body,
        (jnp.zeros_like(u), jnp.ones_like(u), jnp.full_like(u, 0.5)),
    )
    t = jnp.where((t > a) & (t < b), t, 0.5 * (a + b))
    x = x0 + width * t
    return jnp.where(below, nodes[0], jnp.where(above, nodes[-1], x))


# ---------------------------------------------------------------------------
# Fourier series (FourierBSDF support, Interpolation.cpp:314-393)
# ---------------------------------------------------------------------------

def fourier_eval(coeffs, cos_phi):
    """Fourier(a, cosPhi): sum a_k cos(k phi) via the double-angle
    recurrence (Interpolation.cpp:314-330).

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


def sample_fourier(coeffs, u):
    """SampleFourier (Interpolation.cpp:334-393): draw phi ~ the (assumed
    non-negative-integral) Fourier density on [0, 2pi] by Newton-bisection
    on its analytic CDF. Returns (phi, pdf_value, cdf_scale).

    coeffs: (..., M) with coeffs[..., 0] > 0 dominating (as the FourierBSDF
    tables guarantee); u: (...,).
    """
    m = coeffs.shape[-1]
    flip = u >= 0.5
    u = jnp.where(flip, 1.0 - 2.0 * (u - 0.5), 2.0 * u)

    def cdf_and_pdf(phi):
        # integral of sum a_k cos(k x) over [0, phi] = a0 phi + sum a_k sin(k phi)/k
        total = coeffs[..., 0] * phi
        pdf = jnp.broadcast_to(coeffs[..., 0], phi.shape)
        for k in range(1, m):
            total = total + coeffs[..., k] * jnp.sin(k * phi) / k
            pdf = pdf + coeffs[..., k] * jnp.cos(k * phi)
        return total, pdf

    full, _ = cdf_and_pdf(jnp.full_like(u, PI))
    target = u * full

    def body(_, carry):
        a, b, t = carry
        t = jnp.where((t > a) & (t < b), t, 0.5 * (a + b))
        val, deriv = cdf_and_pdf(t)
        low = val - target < 0
        a = jnp.where(low, t, a)
        b = jnp.where(low, b, t)
        t = t - (val - target) / jnp.where(jnp.abs(deriv) < 1e-12,
                                           jnp.where(deriv < 0, -1e-12, 1e-12),
                                           deriv)
        return a, b, t

    a, b, phi = jax.lax.fori_loop(
        0, _NEWTON_ITERS, body,
        (jnp.zeros_like(u), jnp.full_like(u, PI), u * PI),
    )
    phi = jnp.where((phi > a) & (phi < b), phi, 0.5 * (a + b))
    _, pdf_val = cdf_and_pdf(phi)
    pdf = pdf_val / jnp.maximum(2.0 * full, 1e-20)
    phi = jnp.where(flip, 2.0 * PI - phi, phi)
    return phi, pdf_val, pdf
