"""Goldilocks field arithmetic on TPU-friendly 32-bit lanes (JAX).

A field element is a pair ``(hi, lo)`` of equally-shaped ``uint32`` arrays
holding the canonical value ``hi * 2^32 + lo < p``.  TPUs have no 64-bit
integer lanes, so the 64x64->128-bit multiply is built from 16-bit limbs
(products of u16 operands fit u32) and reduced with the Goldilocks identities
2^64 = 2^32 - 1 and 2^96 = -1 (mod p).

This is the executor equivalent of the reference's emulated-Goldilocks chip
(reference: verifier/src/field/goldilocks/base.rs:46-454): where the chip
hints quotient/remainder and constrains `a = q*p + r`, we simply compute `r`;
`assert_equal` becomes a boolean lane (see `eq`) accumulated by the verifier.

All functions broadcast over arbitrary leading shapes and are jit/vmap/
shard_map-compatible.  Differential tests against refimpl/ pin every op.
"""

import numpy as np

import jax.numpy as jnp

P = (1 << 64) - (1 << 32) + 1
P_HI = np.uint32(0xFFFFFFFF)
P_LO = np.uint32(1)
EPSILON = np.uint32(0xFFFFFFFF)  # 2^64 mod p = 2^32 - 1

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


# ----------------------------------------------------------------------------
# Host-side conversions
# ----------------------------------------------------------------------------

def from_u64(x):
    """numpy uint64 (or python ints) -> (hi, lo) device pair."""
    x = np.asarray(x, dtype=np.uint64)
    return (jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)))


def to_u64(a):
    hi = np.asarray(a[0], dtype=np.uint64)
    lo = np.asarray(a[1], dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def zeros(shape=()):
    return (jnp.zeros(shape, _U32), jnp.zeros(shape, _U32))


def full(shape, value):
    value = int(value) % P
    return (jnp.full(shape, value >> 32, _U32),
            jnp.full(shape, value & 0xFFFFFFFF, _U32))


def const(value):
    value = int(value) % P
    return (jnp.uint32(value >> 32), jnp.uint32(value & 0xFFFFFFFF))


# ----------------------------------------------------------------------------
# 64-bit helpers on (hi, lo) u32 pairs
# ----------------------------------------------------------------------------

def _add64(a, b):
    """(a + b) mod 2^64 with carry-out bit."""
    lo = a[1] + b[1]
    c0 = (lo < a[1]).astype(_U32)
    hi = a[0] + b[0]
    c1 = (hi < a[0]).astype(_U32)
    hi2 = hi + c0
    c2 = (hi2 < hi).astype(_U32)
    return (hi2, lo), c1 | c2


def _sub64(a, b):
    """(a - b) mod 2^64 with borrow-out bit."""
    lo = a[1] - b[1]
    b0 = (a[1] < b[1]).astype(_U32)
    hi = a[0] - b[0]
    b1 = (a[0] < b[0]).astype(_U32)
    hi2 = hi - b0
    b2 = (hi < b0).astype(_U32)
    return (hi2, lo), b1 | b2


def _ge_p(a):
    """a >= p, for a < 2^64 (p = 0xFFFFFFFF_00000001)."""
    return (a[0] == P_HI) & (a[1] >= P_LO)


def _canonicalize(a):
    """Subtract p once if a >= p (a < 2p is guaranteed by callers).
    a - p = a + (2^32 - 1) mod 2^64."""
    is_ge = _ge_p(a)
    (hi2, lo2), _ = _add64(a, (jnp.uint32(0), EPSILON))
    return (jnp.where(is_ge, hi2, a[0]), jnp.where(is_ge, lo2, a[1]))


# ----------------------------------------------------------------------------
# Field ops
# ----------------------------------------------------------------------------

def add(a, b):
    from ..utils import profiling
    if profiling.active():
        profiling.record("gl_add", max(_nelems(a), _nelems(b)))
    s, carry = _add64(a, b)
    # carry means + 2^64 = + (2^32 - 1) mod p; cannot re-carry since
    # a + b < 2p < 2^65 implies the wrapped value is < 2^64 - 2^33.
    (hi2, lo2), _ = _add64(s, (jnp.uint32(0), EPSILON))
    s = (jnp.where(carry.astype(bool), hi2, s[0]),
         jnp.where(carry.astype(bool), lo2, s[1]))
    return _canonicalize(s)


def sub(a, b):
    d, borrow = _sub64(a, b)
    # borrow means result wrapped by 2^64; a - b + p = wrapped - (2^32 - 1).
    (hi2, lo2), _ = _sub64(d, (jnp.uint32(0), EPSILON))
    return (jnp.where(borrow.astype(bool), hi2, d[0]),
            jnp.where(borrow.astype(bool), lo2, d[1]))


def neg(a):
    return sub(zeros_like(a), a)


def zeros_like(a):
    return (jnp.zeros_like(a[0]), jnp.zeros_like(a[1]))


def to_limbs(a):
    """(hi, lo) -> 4 u16 limbs (little-endian), each stored in u32."""
    return (a[1] & _MASK16, a[1] >> 16, a[0] & _MASK16, a[0] >> 16)


def from_limbs16(l):
    """4 u16 limbs -> (hi, lo)."""
    return (l[2] | (l[3] << 16), l[0] | (l[1] << 16))


def reduce128(x_hi, x_lo):
    """Reduce x_hi * 2^64 + x_lo mod p; inputs are (hi, lo) u32 pairs."""
    x_hi_hi = x_hi[0]
    x_hi_lo = x_hi[1]
    # t0 = x_lo - x_hi_hi  (2^96 = -1 mod p)
    t0, borrow = _sub64(x_lo, (jnp.uint32(0), x_hi_hi))
    (bh, bl), _ = _sub64(t0, (jnp.uint32(0), EPSILON))
    t0 = (jnp.where(borrow.astype(bool), bh, t0[0]),
          jnp.where(borrow.astype(bool), bl, t0[1]))
    # t1 = x_hi_lo * (2^32 - 1) = (x_hi_lo << 32) - x_hi_lo
    nz = (x_hi_lo != 0).astype(_U32)
    t1 = (x_hi_lo - nz, jnp.uint32(0) - x_hi_lo)
    s, carry = _add64(t0, t1)
    (ch, cl), _ = _add64(s, (jnp.uint32(0), EPSILON))
    s = (jnp.where(carry.astype(bool), ch, s[0]),
         jnp.where(carry.astype(bool), cl, s[1]))
    return _canonicalize(s)


def _nelems(a):
    n = 1
    for d in a[0].shape:
        n *= d
    return n


def mul(a, b):
    """Full modular multiply via 16-bit limb schoolbook + reduce128."""
    from ..utils import profiling
    if profiling.active():
        profiling.record("gl_mul", max(_nelems(a), _nelems(b)))
    al = to_limbs(a)
    bl = to_limbs(b)
    cols = [jnp.zeros_like(a[0]) for _ in range(8)]
    for i in range(4):
        for j in range(4):
            prod = al[i] * bl[j]  # < 2^32, exact in u32
            cols[i + j] = cols[i + j] + (prod & _MASK16)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> 16)
    # carry propagation: each col < 8 * 2^16 + carries, well within u32
    limbs = []
    carry = jnp.zeros_like(a[0])
    for k in range(8):
        v = cols[k] + carry
        limbs.append(v & _MASK16)
        carry = v >> 16
    lo64 = from_limbs16(limbs[0:4])
    hi64 = from_limbs16(limbs[4:8])
    return reduce128(hi64, lo64)


def mul_const_small(a, c):
    """a * c for a small host constant 0 <= c < 2^16 (MDS entries)."""
    assert 0 <= c < (1 << 16)
    if c == 0:
        return zeros_like(a)
    if c == 1:
        return a
    al = to_limbs(a)
    cu = np.uint32(c)
    cols = [al[i] * cu for i in range(4)] + [jnp.zeros_like(a[0])]
    limbs = []
    carry = jnp.zeros_like(a[0])
    for k in range(5):
        v = cols[k] + carry
        limbs.append(v & _MASK16)
        carry = v >> 16
    lo64 = from_limbs16(limbs[0:4])
    hi64 = (jnp.zeros_like(a[0]), limbs[4] | (carry << 16))
    return reduce128(hi64, lo64)


def square(a):
    """a^2 exploiting schoolbook symmetry: 10 limb products instead of 16
    (off-diagonal products counted twice via their 16-bit halves, which stay
    doubling-safe in u32)."""
    from ..utils import profiling
    if profiling.active():
        profiling.record("gl_mul", _nelems(a))
    al = to_limbs(a)
    cols = [jnp.zeros_like(a[0]) for _ in range(8)]
    for i in range(4):
        prod = al[i] * al[i]
        cols[2 * i] = cols[2 * i] + (prod & _MASK16)
        cols[2 * i + 1] = cols[2 * i + 1] + (prod >> 16)
        for j in range(i + 1, 4):
            prod = al[i] * al[j]  # < 2^32; halves < 2^16 so 2x fits u32
            cols[i + j] = cols[i + j] + ((prod & _MASK16) << 1)
            cols[i + j + 1] = cols[i + j + 1] + ((prod >> 16) << 1)
    limbs = []
    carry = jnp.zeros_like(a[0])
    for k in range(8):
        v = cols[k] + carry
        limbs.append(v & _MASK16)
        carry = v >> 16
    lo64 = from_limbs16(limbs[0:4])
    hi64 = from_limbs16(limbs[4:8])
    return reduce128(hi64, lo64)


# ----------------------------------------------------------------------------
# Lazy (non-canonical) variants: values live in [0, 2^64) instead of [0, p).
# Inside a long pure-arithmetic stretch (the Poseidon permutation rounds) the
# canonical form is only needed at the very end; skipping _canonicalize saves
# the compare+select tail of every reduction.  All bounds proven in-line.
# ----------------------------------------------------------------------------

def canonicalize(a):
    """Map a lazy value (< 2^64) to canonical (< p)."""
    return _canonicalize(a)


def reduce128_lazy(x_hi, x_lo):
    """reduce128 without the final canonicalization: result < 2^64.

    Safe for arbitrary u64 (hi, lo) inputs: t0's borrow fix cannot re-borrow
    (wrapped t0 >= 2^64 - 2^32), and s's carry fix cannot re-carry
    (t1 <= (2^32-1)^2 keeps wrapped s < 2^64 - 2^33 + 1)."""
    x_hi_hi = x_hi[0]
    x_hi_lo = x_hi[1]
    t0, borrow = _sub64(x_lo, (jnp.uint32(0), x_hi_hi))
    (bh, bl), _ = _sub64(t0, (jnp.uint32(0), EPSILON))
    t0 = (jnp.where(borrow.astype(bool), bh, t0[0]),
          jnp.where(borrow.astype(bool), bl, t0[1]))
    nz = (x_hi_lo != 0).astype(_U32)
    t1 = (x_hi_lo - nz, jnp.uint32(0) - x_hi_lo)
    s, carry = _add64(t0, t1)
    (ch, cl), _ = _add64(s, (jnp.uint32(0), EPSILON))
    return (jnp.where(carry.astype(bool), ch, s[0]),
            jnp.where(carry.astype(bool), cl, s[1]))


def add_lazy(a, b):
    """a + b mod p as a lazy value, for a < 2^64 and b < p (round-constant
    add).  On carry the wrapped sum is < p so the +2^32-1 fix cannot
    re-carry."""
    s, carry = _add64(a, b)
    (hi2, lo2), _ = _add64(s, (jnp.uint32(0), EPSILON))
    return (jnp.where(carry.astype(bool), hi2, s[0]),
            jnp.where(carry.astype(bool), lo2, s[1]))


def mul_lazy(a, b):
    """mul for lazy inputs (< 2^64), lazy output: skips canonicalization."""
    from ..utils import profiling
    if profiling.active():
        profiling.record("gl_mul", max(_nelems(a), _nelems(b)))
    al = to_limbs(a)
    bl = to_limbs(b)
    cols = [jnp.zeros_like(a[0]) for _ in range(8)]
    for i in range(4):
        for j in range(4):
            prod = al[i] * bl[j]
            cols[i + j] = cols[i + j] + (prod & _MASK16)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> 16)
    limbs = []
    carry = jnp.zeros_like(a[0])
    for k in range(8):
        v = cols[k] + carry
        limbs.append(v & _MASK16)
        carry = v >> 16
    lo64 = from_limbs16(limbs[0:4])
    hi64 = from_limbs16(limbs[4:8])
    return reduce128_lazy(hi64, lo64)


def square_lazy(a):
    """square for lazy inputs (< 2^64), lazy output."""
    from ..utils import profiling
    if profiling.active():
        profiling.record("gl_mul", _nelems(a))
    al = to_limbs(a)
    cols = [jnp.zeros_like(a[0]) for _ in range(8)]
    for i in range(4):
        prod = al[i] * al[i]
        cols[2 * i] = cols[2 * i] + (prod & _MASK16)
        cols[2 * i + 1] = cols[2 * i + 1] + (prod >> 16)
        for j in range(i + 1, 4):
            prod = al[i] * al[j]
            cols[i + j] = cols[i + j] + ((prod & _MASK16) << 1)
            cols[i + j + 1] = cols[i + j + 1] + ((prod >> 16) << 1)
    limbs = []
    carry = jnp.zeros_like(a[0])
    for k in range(8):
        v = cols[k] + carry
        limbs.append(v & _MASK16)
        carry = v >> 16
    lo64 = from_limbs16(limbs[0:4])
    hi64 = from_limbs16(limbs[4:8])
    return reduce128_lazy(hi64, lo64)


def select(cond, a, b):
    """cond ? a : b (cond broadcastable bool)."""
    return (jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1]))


def eq(a, b):
    """Canonical equality as a boolean lane (the executor's assert_equal)."""
    return (a[0] == b[0]) & (a[1] == b[1])


def is_canonical(a):
    """a < p — the witness range check (reference: base.rs:108-119)."""
    return ~_ge_p(a)


def lt_pow2(a, bits):
    """a < 2^bits for 0 < bits <= 64 (PoW response check, fri/mod.rs:131-145)."""
    if bits >= 64:
        return jnp.ones_like(a[0], dtype=bool)
    if bits >= 32:
        return a[0] < np.uint32(1 << (bits - 32)) if bits > 32 else (a[0] == 0)
    return (a[0] == 0) & (a[1] < np.uint32(1 << bits))


def bit(a, i):
    """i-th bit (LSB-first) as u32 in {0,1}."""
    if i < 32:
        return (a[1] >> np.uint32(i)) & np.uint32(1)
    return (a[0] >> np.uint32(i - 32)) & np.uint32(1)


def mod_pow2(a, bits):
    """a mod 2^bits (x_index truncation, fri/mod.rs:363-364)."""
    if bits >= 64:
        return a
    if bits >= 32:
        mask = np.uint32((1 << (bits - 32)) - 1) if bits > 32 else np.uint32(0)
        return (a[0] & mask, a[1])
    return (jnp.zeros_like(a[0]), a[1] & np.uint32((1 << bits) - 1))


def exp_const(a, e):
    """a^e for a host-known exponent e >= 0 (square-and-multiply, unrolled)."""
    e = int(e)
    if e == 0:
        return full(jnp.shape(a[0]), 1)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


def _square_n(a, n):
    """a^(2^n) with a fori_loop (bounded graph: one mul body)."""
    import jax

    from ..utils import profiling

    if n <= 2:
        for _ in range(n):
            a = square(a)
        return a
    with profiling.multiplier(n):
        body = square(a)  # trace once under the multiplier for the census
    del body
    with profiling.suspend():
        return jax.lax.fori_loop(0, n, lambda _, x: square(x), a)


def _exp_2k_minus_1(a, k, cache):
    """a^(2^k - 1) with memoized doubling chain."""
    if k in cache:
        return cache[k]
    if k == 1:
        cache[1] = a
        return a
    half = k // 2
    rest = k - half
    lo = _exp_2k_minus_1(a, half, cache)
    acc = _square_n(lo, rest)
    hi = _exp_2k_minus_1(a, rest, cache)
    out = mul(acc, hi)
    cache[k] = out
    return out


def inv(a):
    """a^(p-2) by Fermat (addition chain over 2^k-1 blocks).

    p - 2 = (2^32 - 2) * 2^32 + (2^32 - 1); the executor form of the
    reference's inverse-hint-and-constrain (base.rs:372-399).  inv(0) = 0
    (callers guard or the verdict catches it).  Square-runs use fori_loop so
    the compiled graph stays small.
    """
    cache = {}
    e31 = _exp_2k_minus_1(a, 31, cache)   # a^(2^31 - 1)
    e32 = _exp_2k_minus_1(a, 32, cache)   # a^(2^32 - 1)
    t = _square_n(square(e31), 32)         # a^((2^32-2) * 2^32)
    return mul(t, e32)


def div(a, b):
    return mul(a, inv(b))
