"""ctypes bindings for the native C++ hot loops (native/goldilocks_native.cc).

Auto-builds the shared library with g++ on first use (cached next to the
source); every entry point has a pure-Python fallback, so the framework works
without a toolchain — the native path just makes the proof factory and
witness pipeline ~100x faster.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libgoldilocks_native.so")
_SRC = os.path.join(_NATIVE_DIR, "goldilocks_native.cc")
_HDR = os.path.join(_NATIVE_DIR, "poseidon_constants.h")

_lib = None
_build_failed = False


def _build():
    if not os.path.exists(_HDR) or os.path.getmtime(_HDR) < os.path.getmtime(
            os.path.join(_NATIVE_DIR, "gen_constants.py")):
        subprocess.run(
            ["python3", os.path.join(_NATIVE_DIR, "gen_constants.py"), _HDR],
            check=True, capture_output=True)
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
         "-o", _SO_PATH],
        check=True, capture_output=True)


def get_lib():
    """Returns the loaded library, building if needed; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if (not os.path.exists(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO_PATH)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.gl_poseidon_permute_batch.argtypes = [u64p, ctypes.c_size_t]
        lib.gl_hash_leaves.argtypes = [u64p, ctypes.c_size_t, ctypes.c_size_t, u64p]
        lib.gl_two_to_one_batch.argtypes = [u64p, u64p, ctypes.c_size_t, u64p]
        lib.gl_merkle_levels.argtypes = [
            u64p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t, u64p]
        lib.gl_pow_grind.argtypes = [
            u64p, u64p, ctypes.c_size_t, ctypes.c_uint32, ctypes.c_uint64]
        lib.gl_pow_grind.restype = ctypes.c_uint64
        lib.gl_ntt.argtypes = [u64p, ctypes.c_size_t, ctypes.c_int]
        lib.gl_coset_fft.argtypes = [u64p, ctypes.c_size_t, ctypes.c_uint64]
        lib.gl_coset_ifft.argtypes = [u64p, ctypes.c_size_t, ctypes.c_uint64]
        lib.gl_batch_inverse.argtypes = [u64p, ctypes.c_size_t, u64p]
        _lib = lib
        return _lib
    except Exception:
        _build_failed = True
        return None


def available():
    return get_lib() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def poseidon_permute_batch(states):
    """states: (n, 12) uint64 array -> permuted copy."""
    lib = get_lib()
    out = np.ascontiguousarray(states, dtype=np.uint64).copy()
    lib.gl_poseidon_permute_batch(_ptr(out), out.shape[0])
    return out


def hash_leaves(leaves):
    """(n, width) uint64 -> (n, 4) digests (hash_or_noop)."""
    lib = get_lib()
    leaves = np.ascontiguousarray(leaves, dtype=np.uint64)
    n, width = leaves.shape
    out = np.empty((n, 4), dtype=np.uint64)
    lib.gl_hash_leaves(_ptr(leaves), n, width, _ptr(out))
    return out


def merkle_levels(leaves, cap_height):
    """(n, width) uint64 leaves -> list of levels [(n,4), (n/2,4), ...,
    (2^cap,4)] exactly matching refimpl.merkle.MerkleTree.levels."""
    lib = get_lib()
    leaves = np.ascontiguousarray(leaves, dtype=np.uint64)
    n, width = leaves.shape
    cap = 1 << cap_height
    total = 2 * n - cap
    buf = np.empty((total, 4), dtype=np.uint64)
    lib.gl_merkle_levels(_ptr(leaves), n, width, cap_height, _ptr(buf))
    levels = []
    off = 0
    level_n = n
    while True:
        levels.append(buf[off:off + level_n])
        off += level_n
        if level_n == cap:
            break
        level_n //= 2
    return levels


def pow_grind(state, tail, pow_bits, start=0):
    lib = get_lib()
    state = np.ascontiguousarray(state, dtype=np.uint64)
    tail = np.ascontiguousarray(tail, dtype=np.uint64)
    return int(lib.gl_pow_grind(_ptr(state), _ptr(tail), len(tail),
                                pow_bits, start))


def coset_fft(coeffs, shift):
    lib = get_lib()
    a = np.ascontiguousarray(coeffs, dtype=np.uint64).copy()
    lib.gl_coset_fft(_ptr(a), len(a), shift)
    return a


def coset_ifft(values, shift):
    lib = get_lib()
    a = np.ascontiguousarray(values, dtype=np.uint64).copy()
    lib.gl_coset_ifft(_ptr(a), len(a), shift)
    return a


def ntt(values, inverse=False):
    lib = get_lib()
    a = np.ascontiguousarray(values, dtype=np.uint64).copy()
    lib.gl_ntt(_ptr(a), len(a), 1 if inverse else 0)
    return a
