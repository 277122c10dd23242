"""BN254 Fr arithmetic in plane layout: limb index on sublanes, batch on
lanes — the TPU-optimal layout for the 16x16-limb Montgomery pipeline (and
the form the fused Pallas Poseidon-BN254 kernel computes in).

Key structure (vs ops/bn254.py's batch-last limb axis):
  - an Fr value is a (16, N) u32 plane of little-endian u16 limbs;
  - schoolbook products accumulate into RAW columns (a (32, N) plane of
    lo/hi-split sums < 2^24), so a whole MDS row (sum of 4 products) pays a
    single carry normalization + Montgomery reduction;
  - carry chains are static row ripples (unrolled (1, N) ops — cheap next to
    the (16, N) product planes).

All functions work identically under jit and inside Pallas kernel bodies.
Differentially tested against ops/bn254.py and refimpl.
"""

import numpy as np

import jax.numpy as jnp

from .bn254 import N_LIMBS, NPRIME_LIMBS, P_INT, P_LIMBS, R2_LIMBS, R_INT

_MASK = np.uint32(0xFFFF)

_P_NP = np.array([int(x) for x in P_LIMBS], dtype=np.uint32)
_NPRIME_NP = np.array([int(x) for x in NPRIME_LIMBS], dtype=np.uint32)
_R2_NP = np.array([int(x) for x in R2_LIMBS], dtype=np.uint32)
_R_MINUS_P = R_INT - P_INT
_RMP_NP = np.array([( _R_MINUS_P >> (16 * k)) & 0xFFFF for k in range(N_LIMBS)],
                   dtype=np.uint32)


def school(a, b, out_rows=2 * N_LIMBS):
    """Raw schoolbook columns of two (16, N) u16-limb planes: a (out_rows, N)
    plane of lo/hi-split sums (< 2^21 for a single product)."""
    cols = jnp.zeros((out_rows,) + a.shape[1:], jnp.uint32)
    for j in range(N_LIMBS):
        hi_rows = min(N_LIMBS, out_rows - j)
        if hi_rows <= 0:
            break
        prod = a[:hi_rows] * b[j:j + 1]
        lo = prod & _MASK
        hi = prod >> 16
        cols = cols + jnp.pad(lo, ((j, out_rows - j - hi_rows), (0, 0)))
        hi2 = hi[:min(hi_rows, out_rows - j - 1)]
        if hi2.shape[0]:
            cols = cols + jnp.pad(
                hi2, ((j + 1, out_rows - j - 1 - hi2.shape[0]), (0, 0)))
    return cols


def school_sq(a, out_rows=2 * N_LIMBS):
    """Raw schoolbook columns of a*a exploiting symmetry: 136 limb products
    instead of 256 (the j-th block multiplies only rows i >= j; its
    diagonal row counts once, off-diagonal rows are doubled via their
    16-bit halves, which stay < 2^17 — column sums < 2^22, well inside
    the normalize/normalize_ks < 2^26 contract)."""
    cols = jnp.zeros((out_rows,) + a.shape[1:], jnp.uint32)
    for j in range(N_LIMBS):
        rows = min(N_LIMBS - j, out_rows - 2 * j)
        if rows <= 0:
            break
        prod = a[j:j + rows] * a[j:j + 1]
        lo = prod & _MASK
        hi = prod >> 16
        if rows > 1:
            lo = jnp.concatenate([lo[:1], lo[1:] << 1], axis=0)
            hi = jnp.concatenate([hi[:1], hi[1:] << 1], axis=0)
        cols = cols + jnp.pad(lo, ((2 * j, out_rows - 2 * j - rows), (0, 0)))
        hi2 = hi[:min(rows, out_rows - 2 * j - 1)]
        if hi2.shape[0]:
            cols = cols + jnp.pad(
                hi2, ((2 * j + 1, out_rows - 2 * j - 1 - hi2.shape[0]),
                      (0, 0)))
    return cols


def school_const(a, b_np, out_rows=2 * N_LIMBS):
    """Raw columns of a (16, N) plane times a host u16-limb constant."""
    cols = jnp.zeros((out_rows,) + a.shape[1:], jnp.uint32)
    for j in range(N_LIMBS):
        if int(b_np[j]) == 0:
            continue
        hi_rows = min(N_LIMBS, out_rows - j)
        if hi_rows <= 0:
            break
        prod = a[:hi_rows] * np.uint32(b_np[j])
        lo = prod & _MASK
        hi = prod >> 16
        cols = cols + jnp.pad(lo, ((j, out_rows - j - hi_rows), (0, 0)))
        hi2 = hi[:min(hi_rows, out_rows - j - 1)]
        if hi2.shape[0]:
            cols = cols + jnp.pad(
                hi2, ((j + 1, out_rows - j - 1 - hi2.shape[0]), (0, 0)))
    return cols


def normalize(cols):
    """Carry-normalize raw columns (any values < 2^26) to u16 limb rows.
    Returns (limbs, carry_out) with carry_out a (1, N) row."""
    rows = []
    carry = jnp.zeros((1,) + cols.shape[1:], jnp.uint32)
    n = cols.shape[0]
    for k in range(n):
        v = cols[k:k + 1] + carry
        rows.append(v & _MASK)
        carry = v >> 16
    return jnp.concatenate(rows, axis=0), carry


def _shift_up(x, d):
    """Move row k to row k+d, zero-filling the bottom (carry direction)."""
    return jnp.pad(x[:-d], ((d, 0), (0, 0)))


def normalize_ks(cols):
    """normalize() with Kogge-Stone carry lookahead: bit-identical output
    for any columns < 2^31, but the sequential dependence is one local
    carry pass + log2(n) prefix steps of full-width (n, N) ops instead of
    an n-step (1, N) ripple — the latency-bound form for kernel bodies
    (the ripple normalize measured ~40% of the Poseidon-BN254 kernel).

    Exactness: after the local pass every limb is < 2^16 + 2^15 < 2^17, so
    generate bits are 0/1 and carry-in is a (generate, propagate) prefix;
    propagate = (limb == 0xFFFF) handles arbitrary 0xFFFF ripple chains."""
    n = cols.shape[0]
    lo = cols & _MASK
    c = cols >> 16
    s = lo + _shift_up(c, 1)
    r = s & _MASK
    g = s >> 16                                   # {0, 1}
    p = jnp.where(r == _MASK, np.uint32(1), np.uint32(0))
    d = 1
    while d < n:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    out = (r + _shift_up(g, 1)) & _MASK
    return out, c[n - 1:n] + g[n - 1:n]


def _const_plane(c_np, like):
    """Host u16-limb constant -> (16, N) plane of broadcast scalars (built
    from scalar constants so Pallas kernel bodies can close over it)."""
    shape = (1,) + like.shape[1:]
    return jnp.concatenate(
        [jnp.full(shape, int(c_np[k]), jnp.uint32) for k in range(N_LIMBS)],
        axis=0)


def cond_sub_p(a):
    """a (16, N) u16 limbs, a < 2p -> canonical a mod p.
    Computes a + (R - p); carry-out of the top limb means a >= p."""
    raw = a + _const_plane(_RMP_NP, a)
    s, carry = normalize_ks(raw)
    return jnp.where(carry > 0, s, a)


def redc(t_cols):
    """Montgomery reduction of raw 32-row columns (value < R*p) -> canonical
    (16, N) u16 plane of t * R^-1 mod p."""
    t, _ = normalize(t_cols)                     # u16 limbs, no carry (t < 2^509)
    # m = (t mod R) * (-p^-1) mod R — truncated convolution
    m_raw = school_const(t[:N_LIMBS], _NPRIME_NP, out_rows=N_LIMBS)
    m, _ = normalize(m_raw)                      # mod R: top carry dropped
    u_raw = school_const(m, _P_NP)               # 32 raw rows
    s_raw = t + u_raw                            # < 2^26 per column
    s, _ = normalize(s_raw)                      # t + m*p < 2pR < 2^510
    return cond_sub_p(s[N_LIMBS:])


def redc_lazy(t_cols):
    """Montgomery reduction WITHOUT the final conditional subtraction:
    returns (t + m*p)/R with strict u16 limbs, value <= t/R + p (possibly
    >= p).  Used inside the Poseidon-BN254 rounds, where values are allowed
    to drift in [0, ~1.6p] (bounds: ops/poseidon_bn254_pallas.py) and a
    single cond_sub_p at kernel exit restores canonical form.  The limb
    strictness school() needs is preserved (normalize is exact for any
    column magnitudes < 2^26)."""
    t, _ = normalize(t_cols)
    m_raw = school_const(t[:N_LIMBS], _NPRIME_NP, out_rows=N_LIMBS)
    m, _ = normalize(m_raw)
    u_raw = school_const(m, _P_NP)
    s_raw = t + u_raw
    s, _ = normalize(s_raw)
    return s[N_LIMBS:]


def add_lazy(a, b):
    """a + b with carry normalization only (no mod-p subtraction): exact as
    long as a + b < 2^256 (callers keep values < ~3p < 2^256)."""
    s, _ = normalize_ks(a + b)
    return s


def mont_mul(a, b):
    return redc(school(a, b))


def mont_mul_const(a, c_np):
    return redc(school_const(a, c_np))


def mont_sq(a):
    return redc(school(a, a))


def add_mod(a, b):
    s, _ = normalize(a + b)                      # a + b < 2p < 2^256: no carry
    return cond_sub_p(s)


def to_mont(a):
    return mont_mul_const(a, _R2_NP)


def from_mont(a):
    """Divide by R: REDC of the 32-row extension of a."""
    ext = jnp.pad(a, ((0, N_LIMBS), (0, 0)))
    return redc(ext)


# ------------------------------------------------------------------------
# batch-last <-> plane conversion helpers
# ------------------------------------------------------------------------

def to_planes(a):
    """(..., 16) -> (16, N) plane (N = product of leading dims)."""
    n = 1
    for d in a.shape[:-1]:
        n *= d
    return a.reshape(n, N_LIMBS).T


def from_planes(p, batch_shape):
    return p.T.reshape(tuple(batch_shape) + (N_LIMBS,))
