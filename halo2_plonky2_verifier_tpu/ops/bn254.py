"""BN254 scalar-field (Fr) arithmetic on TPU lanes (JAX).

An Fr element is a single uint32 array of shape (..., 16) holding sixteen
little-endian 16-bit limbs (so every limb product fits u32).  Multiplication
is schoolbook convolution into raw u32 columns (lo/hi-split sums stay < 2^22,
no carry chain until one final propagation) followed by full-width Montgomery
reduction with R = 2^256.  This is the executor analog of the reference's
native BN254-Fr ops (verifier/src/field/native.rs) backing its PoseidonBN254
chips.

Montgomery convention: permutation-internal values are x*R mod p; witness
values stay in standard form (equality, 56-bit observation and canonicality
checks need canonical integers).  Differentially tested against refimpl.
"""

import numpy as np

import jax.numpy as jnp

P_INT = 21888242871839275222246405745257275088548364400416034343698204186575808495617
N_LIMBS = 16
_MASK = np.uint32(0xFFFF)

R_INT = 1 << 256
R2_INT = R_INT * R_INT % P_INT
NPRIME_INT = (-pow(P_INT, -1, R_INT)) % R_INT  # -p^-1 mod 2^256


def _int_to_limbs(x, n=N_LIMBS):
    return [np.uint32((x >> (16 * i)) & 0xFFFF) for i in range(n)]


P_LIMBS = _int_to_limbs(P_INT)
R2_LIMBS = _int_to_limbs(R2_INT)
NPRIME_LIMBS = _int_to_limbs(NPRIME_INT)


# ----------------------------------------------------------------------------
# Host conversions
# ----------------------------------------------------------------------------

def from_ints(vals):
    """nested python ints -> (..., 16) u32 device array (standard form)."""
    arr = np.asarray(vals, dtype=object)
    out = np.zeros(arr.shape + (N_LIMBS,), dtype=np.uint32)
    flat = arr.reshape(-1)
    oflat = out.reshape(-1, N_LIMBS)
    for i, v in enumerate(flat):
        v = int(v)
        for k in range(N_LIMBS):
            oflat[i, k] = (v >> (16 * k)) & 0xFFFF
    return jnp.asarray(out)


def to_ints(a):
    arr = np.asarray(a)
    flat = arr.reshape(-1, N_LIMBS)
    out = []
    for row in flat:
        v = 0
        for k in reversed(range(N_LIMBS)):
            v = (v << 16) | int(row[k])
        out.append(v)
    return np.array(out, dtype=object).reshape(arr.shape[:-1])


def const(value, shape=()):
    value = int(value) % P_INT
    limbs = np.array([int(x) for x in _int_to_limbs(value)], dtype=np.uint32)
    return jnp.broadcast_to(jnp.asarray(limbs), tuple(shape) + (N_LIMBS,))


def const_mont(value, shape=()):
    return const(int(value) * R_INT % P_INT, shape)


# ----------------------------------------------------------------------------
# Limb helpers (limb axis = last)
# ----------------------------------------------------------------------------

def _stack(limbs):
    return jnp.stack(limbs, axis=-1)


def _unstack(a):
    return [a[..., k] for k in range(a.shape[-1])]


def _carry_propagate(cols):
    out = []
    carry = jnp.zeros_like(cols[0])
    for c in cols:
        v = c + carry
        out.append(v & _MASK)
        carry = v >> 16
    return out, carry


def _ge_const(a_limbs, b_const):
    """a >= b for a host limb-constant b (lexicographic from the top)."""
    result = jnp.zeros(a_limbs[0].shape, dtype=bool)
    decided = jnp.zeros(a_limbs[0].shape, dtype=bool)
    for k in reversed(range(len(a_limbs))):
        bk = b_const[k] if k < len(b_const) else np.uint32(0)
        gt = a_limbs[k] > bk
        lt = a_limbs[k] < bk
        result = jnp.where(~decided & gt, True, result)
        decided = decided | gt | lt
    return result | ~decided  # all-equal -> >=


def _sub_const(a_limbs, b_const):
    """a - b for host constant b (assumes a >= b)."""
    out = []
    borrow = jnp.zeros_like(a_limbs[0])
    for k in range(len(a_limbs)):
        bk = b_const[k] if k < len(b_const) else np.uint32(0)
        v = a_limbs[k] - bk - borrow
        out.append(v & _MASK)
        borrow = (v >> 16) & np.uint32(1)
    return out


def _cond_sub_p(limbs):
    ge = _ge_const(limbs, P_LIMBS)
    sub = _sub_const(limbs, P_LIMBS)
    return [jnp.where(ge, s, l) for s, l in zip(sub, limbs)]


def _schoolbook_cols(la, lb, out_len):
    """Convolution columns (lo/hi split) of two u16-limb lists; entries may be
    host np.uint32 constants in lb."""
    cols = [None] * out_len
    for i in range(len(la)):
        for j in range(len(lb)):
            if i + j >= out_len:
                continue
            if isinstance(lb[j], np.uint32) and lb[j] == 0:
                continue
            prod = la[i] * lb[j]
            k = i + j
            lo = prod & _MASK
            hi = prod >> 16
            cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < out_len:
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    zero = jnp.zeros_like(la[0])
    return [c if c is not None else zero for c in cols]


# ----------------------------------------------------------------------------
# Field ops
# ----------------------------------------------------------------------------

def add_mod(a, b):
    la, lb = _unstack(a), _unstack(b)
    limbs, _ = _carry_propagate([x + y for x, y in zip(la, lb)])
    return _stack(_cond_sub_p(limbs))


def sub_mod(a, b):
    """(a - b) mod p via a + (p - b)."""
    la, lb = _unstack(a), _unstack(b)
    # p - b (b < p canonical)
    pb = []
    borrow = jnp.zeros_like(la[0])
    for k in range(N_LIMBS):
        v = P_LIMBS[k] - lb[k] - borrow
        pb.append(v & _MASK)
        borrow = (v >> 16) & np.uint32(1)
    limbs, _ = _carry_propagate([x + y for x, y in zip(la, pb)])
    return _stack(_cond_sub_p(limbs))


def _nelems(a):
    n = 1
    for d in a.shape[:-1]:
        n *= d
    return n


def mont_mul(a, b):
    """a * b * R^-1 mod p (canonical) for canonical/Montgomery inputs."""
    from ..utils import profiling
    if profiling.active():
        profiling.record("bn254_mont_mul", max(_nelems(a), _nelems(b)))
    la, lb = _unstack(a), _unstack(b)
    t, _ = _carry_propagate(_schoolbook_cols(la, lb, 2 * N_LIMBS))
    return _redc(t)


def mont_mul_const(a, b_limbs_host):
    la = _unstack(a)
    t, _ = _carry_propagate(_schoolbook_cols(la, b_limbs_host, 2 * N_LIMBS))
    return _redc(t)


def _redc(t):
    """Montgomery reduction of a 32-limb value t < R*p."""
    # m = (t mod R) * (-p^-1) mod R
    m, _ = _carry_propagate(_schoolbook_cols(t[:N_LIMBS], NPRIME_LIMBS, N_LIMBS))
    # u = m * p (32 limbs)
    u, _ = _carry_propagate(_schoolbook_cols(m, P_LIMBS, 2 * N_LIMBS))
    # s = t + u; low 16 limbs vanish; result = s >> 256 < 2p
    # (no carry out of limb 31: t + m*p < 2*R*p < 2^511)
    s, _ = _carry_propagate([x + y for x, y in zip(t, u)])
    return _stack(_cond_sub_p(s[N_LIMBS:]))


def to_mont(a):
    return mont_mul_const(a, R2_LIMBS)


def from_mont(a):
    """Multiply by 1 in Montgomery space = divide by R."""
    la = _unstack(a)
    t = la + [jnp.zeros_like(la[0])] * N_LIMBS
    return _redc(t)


def eq(a, b):
    return (a == b).all(axis=-1)


def is_canonical(a):
    return ~_ge_const(_unstack(a), P_LIMBS)


def select(cond, a, b):
    return jnp.where(cond[..., None], a, b)


# ----------------------------------------------------------------------------
# Goldilocks interop (hashing conventions, reference: hash.rs:30-43, 101-114)
# ----------------------------------------------------------------------------

def pack_goldilocks(gl_pairs):
    """<= 3 Goldilocks (hi, lo) u32 lane pairs -> standard-form Fr:
    value = sum_k gl_k * 2^(64 k)  (NativeChip::limbs_to_num base 2^64)."""
    assert 1 <= len(gl_pairs) <= 3
    shape = gl_pairs[0][0].shape
    zero = jnp.zeros(shape, jnp.uint32)
    limbs = []
    for k in range(3):
        if k < len(gl_pairs):
            hi, lo = gl_pairs[k]
            limbs += [lo & _MASK, lo >> 16, hi & _MASK, hi >> 16]
        else:
            limbs += [zero] * 4
    limbs += [zero] * (N_LIMBS - len(limbs))
    # < 2^192 < p, already canonical
    return _stack(limbs)


def to_goldilocks_56(a):
    """Standard-form Fr -> 5 x 56-bit (hi, lo) Goldilocks lane pairs
    (decompose_le(.., 56, 5); each limb < 2^56 < p_gl is canonical)."""
    la = _unstack(a)
    zero = jnp.zeros_like(la[0])

    def window(start_bit, width):
        """Bits [start_bit, start_bit+width) (width <= 32, start % 8 == 0)."""
        limb = start_bit // 16
        off = start_bit % 16
        v = (la[limb] >> np.uint32(off)) if limb < N_LIMBS else zero
        shift = 16 - off
        k = limb + 1
        while shift < width and k < N_LIMBS:
            v = v | (la[k] << np.uint32(shift))
            shift += 16
            k += 1
        if width < 32:
            v = v & np.uint32((1 << width) - 1)
        return v

    return [(window(56 * j + 32, 24), window(56 * j, 32)) for j in range(5)]
