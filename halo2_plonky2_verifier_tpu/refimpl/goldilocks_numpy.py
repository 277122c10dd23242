"""NumPy-vectorized Goldilocks arithmetic and batched Poseidon permutation.

Used by the refimpl prover for bulk work (proof-of-work grinding, Merkle
construction) and as a second, independently-implemented oracle for the JAX
ops.  Values are numpy uint64 arrays holding canonical field elements; the
128-bit products are assembled from 32-bit halves (the same decomposition the
TPU kernels use in 2x32-bit lanes, prototyped here where native u64 exists).
All uint64 arithmetic relies on numpy's wrap-around (mod 2^64) semantics.
"""

import numpy as np

P = np.uint64((1 << 64) - (1 << 32) + 1)
EPSILON = np.uint64((1 << 32) - 1)  # 2^64 mod p
_MASK32 = np.uint64(0xFFFFFFFF)
_SH32 = np.uint64(32)

_err = np.seterr(over="ignore")  # uint64 wrap-around is intended


def add(a, b):
    """(a + b) mod p for canonical a, b."""
    s = a + b
    over = s < a  # wrapped past 2^64
    s = np.where(over, s + EPSILON, s)  # + 2^64 mod p
    # canonicalize (at most one subtraction needed: s < 2 p)
    return np.where(s >= P, s - P, s)


def sub(a, b):
    d = a - b
    under = a < b
    d = np.where(under, d - EPSILON, d)  # - 2^64 mod p
    return np.where(d >= P, d - P, d)


def neg(a):
    return np.where(a == 0, np.uint64(0), P - a)


def mul(a, b):
    """(a * b) mod p via 32-bit half products + Goldilocks reduction."""
    a_lo = a & _MASK32
    a_hi = a >> _SH32
    b_lo = b & _MASK32
    b_hi = b >> _SH32
    lo = a_lo * b_lo
    m1 = a_lo * b_hi
    m2 = a_hi * b_lo
    hi = a_hi * b_hi
    t = (lo >> _SH32) + (m1 & _MASK32) + (m2 & _MASK32)
    prod_lo = (lo & _MASK32) | ((t & _MASK32) << _SH32)
    prod_hi = hi + (m1 >> _SH32) + (m2 >> _SH32) + (t >> _SH32)
    return reduce128(prod_hi, prod_lo)


def reduce128(x_hi, x_lo):
    """Reduce x_hi*2^64 + x_lo mod p (plonky2 reduce128 algorithm):
    2^64 = 2^32 - 1 and 2^96 = -1 (mod p)."""
    x_hi_hi = x_hi >> _SH32
    x_hi_lo = x_hi & _MASK32
    t0 = x_lo - x_hi_hi
    borrow = x_lo < x_hi_hi
    t0 = np.where(borrow, t0 - EPSILON, t0)
    t1 = x_hi_lo * EPSILON
    s = t0 + t1
    carry = s < t0
    s = np.where(carry, s + EPSILON, s)
    return np.where(s >= P, s - P, s)


def mul_small(a, k):
    """a * k mod p for a small scalar constant k (k < 2^32)."""
    return mul(a, np.uint64(k))


def sbox7(x):
    x2 = mul(x, x)
    x4 = mul(x2, x2)
    x6 = mul(x4, x2)
    return mul(x6, x)


# ----------------------------------------------------------------------------
# Batched Poseidon permutation
# ----------------------------------------------------------------------------

from ..constants.poseidon_goldilocks import (  # noqa: E402
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    N_ROUNDS,
    SPONGE_RATE,
    SPONGE_WIDTH,
)

_RC = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, SPONGE_WIDTH)


def _mds_layer(cols):
    """cols: list of 12 u64 arrays.  Row sums of small-constant multiples are
    accumulated as (hi, lo) 128-bit pairs without per-term reduction: each
    term is < 2^6 * 2^64 and 13 terms sum below 2^74, so the high accumulator
    stays tiny and one reduce128 per row suffices."""
    out = []
    for r in range(SPONGE_WIDTH):
        acc_lo = np.zeros_like(cols[0])
        acc_hi = np.zeros_like(cols[0])
        for i in range(SPONGE_WIDTH):
            c = np.uint64(MDS_MATRIX_CIRC[i])
            v = cols[(i + r) % SPONGE_WIDTH]
            lo = v * c  # low 64 bits (wrapping)
            # exact high 64 bits of v*c for small c:
            # v*c = (v_hi*c)*2^32 + v_lo*c; hi64 = (v_hi*c + (v_lo*c >> 32)) >> 32
            hi = ((v >> _SH32) * c + ((v & _MASK32) * c >> _SH32)) >> _SH32
            acc_lo2 = acc_lo + lo
            acc_hi = acc_hi + hi + (acc_lo2 < acc_lo).astype(np.uint64)
            acc_lo = acc_lo2
        if MDS_MATRIX_DIAG[r]:
            c = np.uint64(MDS_MATRIX_DIAG[r])
            v = cols[r]
            lo = v * c
            hi = ((v >> _SH32) * c + ((v & _MASK32) * c >> _SH32)) >> _SH32
            acc_lo2 = acc_lo + lo
            acc_hi = acc_hi + hi + (acc_lo2 < acc_lo).astype(np.uint64)
            acc_lo = acc_lo2
        out.append(reduce128(acc_hi, acc_lo))
    return out


def permute_batch(states):
    """states: (batch, 12) uint64 canonical -> (batch, 12) permuted."""
    cols = [states[:, i].copy() for i in range(SPONGE_WIDTH)]
    for rnd in range(N_ROUNDS):
        rc = _RC[rnd]
        cols = [add(c, rc[i]) for i, c in enumerate(cols)]
        if HALF_N_FULL_ROUNDS <= rnd < HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS:
            cols[0] = sbox7(cols[0])
        else:
            cols = [sbox7(c) for c in cols]
        cols = _mds_layer(cols)
    return np.stack(cols, axis=1)


def hash_or_noop_batch(leaves):
    """leaves: (batch, k) uint64 -> (batch, 4) hashes (plonky2 hash_or_noop)."""
    b, k = leaves.shape
    if k <= 4:
        out = np.zeros((b, 4), dtype=np.uint64)
        out[:, :k] = leaves
        return out
    state = np.zeros((b, SPONGE_WIDTH), dtype=np.uint64)
    for i in range(0, k, SPONGE_RATE):
        chunk = leaves[:, i:i + SPONGE_RATE]
        state[:, :chunk.shape[1]] = chunk
        state = permute_batch(state)
    return state[:, :4]


def two_to_one_batch(left, right):
    """left, right: (batch, 4) -> (batch, 4)."""
    b = left.shape[0]
    state = np.zeros((b, SPONGE_WIDTH), dtype=np.uint64)
    state[:, 0:4] = left
    state[:, 4:8] = right
    return permute_batch(state)[:, :4]
