"""Native runtime library (C++ via ctypes): SAH BVH builder + Halton
permutation generator.  Compiled lazily on first use; every consumer has a
pure-numpy fallback, so absence of a toolchain only costs speed."""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libgnx_native.so")
_SRC = os.path.join(_HERE, "bvh_builder.cpp")
_lib = None


def _compile():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _compile()
    lib = ctypes.CDLL(_SO)
    lib.gnx_build_bvh_sah.restype = ctypes.c_int
    lib.gnx_halton_permutations.restype = None
    _lib = lib
    return lib


class bvh_native:
    """Namespace used by ops/bvh.py: build(verts, tris, leaf_size)."""

    @staticmethod
    def build(verts, tris, leaf_size):
        lib = get_lib()
        verts = np.ascontiguousarray(verts, np.float32)
        tris = np.ascontiguousarray(tris, np.int32)
        n_tris = len(tris)
        max_nodes = max(2 * n_tris, 8)
        lo = np.empty((max_nodes, 3), np.float32)
        hi = np.empty((max_nodes, 3), np.float32)
        off = np.empty(max_nodes, np.int32)
        npr = np.empty(max_nodes, np.int32)
        ax = np.empty(max_nodes, np.int32)
        order = np.empty(n_tris + leaf_size, np.int32)
        order_len = ctypes.c_int(0)
        c = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        n_nodes = lib.gnx_build_bvh_sah(
            c(verts), len(verts), c(tris), n_tris, leaf_size,
            c(lo), c(hi), c(off), c(npr), c(ax), c(order), max_nodes,
            ctypes.byref(order_len),
        )
        if n_nodes < 0:
            return None
        ol = order_len.value
        return (lo[:n_nodes].copy(), hi[:n_nodes].copy(), off[:n_nodes].copy(),
                npr[:n_nodes].copy(), ax[:n_nodes].copy(), order[:ol].copy())


def halton_permutations(primes):
    """Bit-exact reference permutation table, generated natively."""
    lib = get_lib()
    primes = np.ascontiguousarray(primes, np.int32)
    out = np.empty(int(primes.sum()), np.int32)
    lib.gnx_halton_permutations(
        primes.ctypes.data_as(ctypes.c_void_p), len(primes),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
