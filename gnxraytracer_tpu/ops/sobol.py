"""Sobol' sequence: generator matrices built from scratch + Owen-scrambled
device sampling.

The reference ships 1024x52 Sobol generator-matrix *data*
(/root/reference/samplers/SobolMatrices.cpp, ~27k LoC of constants) but
never wires up a sampler class (SURVEY.md §2.7).  We do not copy that
table; instead the matrices are generated host-side from first principles:

  * primitive polynomials over GF(2) found by exhaustive search
    (irreducibility + order 2^d - 1),
  * initial direction numbers m_i (odd, < 2^i) drawn from the same PCG32
    stream used for Halton permutations (deterministic),
  * the standard recurrence m_k = XOR_j 2^j a_j m_{k-j} XOR m_{k-d}.

Per-pixel decorrelation uses Owen scrambling via the Laine-Karras hash
(public algorithm, "Stratified Sampling for Stochastic Transparency",
also used by pbrt-v4's padded Sobol samplers) — each (pixel, dim) gets an
independent Owen scramble of the global sequence, which both randomizes
and *improves* equidistribution vs the reference's unscrambled tables.
"""

import functools
import os

import jax.numpy as jnp
import numpy as np

from ..constants import ONE_MINUS_EPSILON
from .lds import PCG32, reverse_bits_32

N_DIMS = 256
N_BITS = 32


# ---------------------------------------------------------------------------
# Host-side matrix generation
# ---------------------------------------------------------------------------

def _gf2_polys_of_degree(d):
    """All monic polynomials of degree d as bitmasks (bit i = coeff x^i)."""
    return [(1 << d) | rest for rest in range(1 << d)]


def _gf2_mod(a, m, dm):
    """a mod m over GF(2); dm = degree of m."""
    da = a.bit_length() - 1
    while da >= dm:
        a ^= m << (da - dm)
        da = a.bit_length() - 1
    return a


def _gf2_mulmod(a, b, m, dm):
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a >> dm & 1 or a.bit_length() - 1 >= dm:
            a = _gf2_mod(a, m, dm)
    return _gf2_mod(r, m, dm)


def _x_pow_mod(e, m, dm):
    """x^e mod m over GF(2) by square-and-multiply."""
    result = 1
    base = 2  # the polynomial x
    while e:
        if e & 1:
            result = _gf2_mulmod(result, base, m, dm)
        base = _gf2_mulmod(base, base, m, dm)
        e >>= 1
    return result


def _prime_factors(n):
    fs = set()
    d = 2
    while d * d <= n:
        while n % d == 0:
            fs.add(d)
            n //= d
        d += 1
    if n > 1:
        fs.add(n)
    return fs


def _is_primitive(poly, d):
    """poly (degree d, constant term 1) primitive over GF(2)?"""
    if not (poly & 1):
        return False
    order = (1 << d) - 1
    if _x_pow_mod(order, poly, d) != 1:
        return False
    for p in _prime_factors(order):
        if _x_pow_mod(order // p, poly, d) == 1:
            return False
    return True


@functools.lru_cache(maxsize=1)
def sobol_matrices(n_dims=N_DIMS):
    """(n_dims, 32) uint32 generator matrices (column k = v_k << ...)."""
    cache = os.path.join(os.path.dirname(__file__), "..", "..", ".cache")
    path = os.path.join(cache, f"sobol_matrices_{n_dims}_v1.npy")
    if os.path.exists(path):
        return np.load(path)

    mats = np.zeros((n_dims, N_BITS), np.uint32)
    # dim 0: van der Corput (identity matrix)
    for k in range(N_BITS):
        mats[0, k] = np.uint32(1 << (31 - k))

    rng = PCG32()
    dim = 1
    degree = 1
    while dim < n_dims:
        for poly in _gf2_polys_of_degree(degree):
            if dim >= n_dims:
                break
            if not _is_primitive(poly, degree):
                continue
            d = degree
            # initial direction numbers: m_i odd, < 2^i (deterministic PCG)
            m = [0] * (N_BITS + 1)
            for i in range(1, d + 1):
                m[i] = (rng.uniform_u32() % (1 << i)) | 1
            # recurrence with coefficient bits a_1..a_{d-1} of poly
            for k in range(d + 1, N_BITS + 1):
                v = m[k - d]
                v ^= (1 << d) * m[k - d] & 0xFFFFFFFFFFFF
                v = m[k - d] ^ (m[k - d] << d)
                # general: m_k = XOR_{j=1..d-1} a_j 2^j m_{k-j}  XOR  m_{k-d}
                #                XOR 2^d m_{k-d}
                acc = m[k - d] ^ (m[k - d] << d)
                for j in range(1, d):
                    a_j = (poly >> (d - j)) & 1
                    if a_j:
                        acc ^= m[k - j] << j
                m[k] = acc
            for k in range(1, N_BITS + 1):
                mats[dim, k - 1] = np.uint32((m[k] << (N_BITS - k)) & 0xFFFFFFFF)
            dim += 1
        degree += 1
        if degree > 20:
            raise RuntimeError("not enough primitive polynomials")
    os.makedirs(cache, exist_ok=True)
    np.save(path, mats)
    return mats


# ---------------------------------------------------------------------------
# Device-side sampling
# ---------------------------------------------------------------------------

def sobol_u32_static(dim: int, index):
    """Unscrambled Sobol' uint32 for a *static* dim: 32 unrolled XOR-selects
    against compile-time matrix constants."""
    mat = sobol_matrices()[dim]
    index = jnp.asarray(index).astype(jnp.uint32)
    v = jnp.zeros_like(index)
    for k in range(N_BITS):
        bit = (index >> jnp.uint32(k)) & jnp.uint32(1)
        v = jnp.where(bit == 1, v ^ jnp.uint32(int(mat[k])), v)
    return v


def laine_karras_permutation(x, seed):
    """Owen-scramble hash in reversed-bit space (public LK hash)."""
    x = x + seed
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def owen_scramble(u32, seed):
    """Owen scrambling of a radical-inverse-space value."""
    x = reverse_bits_32(u32)
    x = laine_karras_permutation(x, seed)
    return reverse_bits_32(x)


def to_unit_float(u32):
    return jnp.minimum(u32.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10),
                       ONE_MINUS_EPSILON)
