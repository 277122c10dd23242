"""Batched Poseidon-over-Goldilocks permutation on TPU lanes (JAX).

State layout: a Goldilocks pair ``(hi, lo)`` of ``(..., 12)`` uint32 arrays —
lane axis last, batch axes leading, so every op is a wide VPU op and the
compiled graph size is independent of the batch.  Round loops use
``lax.scan`` over stacked round constants so the XLA graph holds ONE full-
round body and ONE partial-round body (~1k primitives) per permute instance
instead of 30 unrolled rounds; sequences of permutes (sponge absorb, Merkle
levels) scan again at the call site.

Matches plonky2's permutation via the naive round structure (constant layer ->
S-box -> dense circulant MDS; reference:
verifier/src/hash/poseidon/permutation.rs:176-284 — equivalent to its fast
partial-round machinery, see constants/poseidon_goldilocks.py).

MDS trick: entries are tiny (<= 41), so the 12x12 mix is 12 lane-rolls of raw
u32 limb products (column sums < 2^26) and a single modular reduction per
element instead of 144 modmuls — an optimization the in-circuit reference
cannot express.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..constants.poseidon_goldilocks import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    N_ROUNDS,
    SPONGE_RATE,
    SPONGE_WIDTH,
)
from . import goldilocks as gl

_MASK16 = np.uint32(0xFFFF)
W = SPONGE_WIDTH

_RC = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, W)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)
_RC_LO = (_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32)

_CIRC = [np.uint32(c) for c in MDS_MATRIX_CIRC]
_DIAG0 = np.uint32(MDS_MATRIX_DIAG[0])  # only entry 0 is nonzero
_DIAG0_MASK = np.zeros((W,), dtype=np.uint32)
_DIAG0_MASK[0] = 1


def _sbox(x):
    x2 = gl.mul(x, x)
    x4 = gl.mul(x2, x2)
    x6 = gl.mul(x4, x2)
    return gl.mul(x6, x)


def _mds_layer(state):
    """out[..., r] = sum_i CIRC[i] * state[..., (r+i)%12] + DIAG[r]*state[..., r].

    Computed in raw u16-limb space with one reduce128 at the end.
    """
    hi, lo = state
    # u16 limb planes, each (..., 12)
    limbs = [lo & _MASK16, lo >> 16, hi & _MASK16, hi >> 16]
    cols = [None] * 5
    for i in range(W):
        shifted = [jnp.roll(l, -i, axis=-1) for l in limbs]
        for k in range(4):
            term = shifted[k] * _CIRC[i]
            cols[k] = term if cols[k] is None else cols[k] + term
    for k in range(4):
        cols[k] = cols[k] + (limbs[k] * _DIAG0) * _DIAG0_MASK
    cols[4] = jnp.zeros_like(cols[0])
    out_limbs = []
    carry = jnp.zeros_like(cols[0])
    for k in range(5):
        v = cols[k] + carry
        out_limbs.append(v & _MASK16)
        carry = v >> 16
    lo64 = gl.from_limbs16(out_limbs[0:4])
    hi64 = (jnp.zeros_like(cols[0]), out_limbs[4] | (carry << 16))
    return gl.reduce128(hi64, lo64)


def _full_round(state, rc):
    rc_hi, rc_lo = rc
    state = gl.add(state, (rc_hi, rc_lo))
    state = _sbox(state)
    return _mds_layer(state)


def _partial_round(state, rc):
    rc_hi, rc_lo = rc
    state = gl.add(state, (rc_hi, rc_lo))
    s0 = (state[0][..., :1], state[1][..., :1])
    s0 = _sbox(s0)
    state = (jnp.concatenate([s0[0], state[0][..., 1:]], axis=-1),
             jnp.concatenate([s0[1], state[1][..., 1:]], axis=-1))
    return _mds_layer(state)


import contextlib
import os

# Poseidon backend dispatch: "auto" uses the fused Pallas kernel on TPU and
# the jnp/scan path elsewhere; "jnp" forces the scan path (needed under GSPMD
# sharding, where a pallas_call cannot be auto-partitioned); "pallas" forces
# the kernel (interpret mode off-TPU is for debugging only).
_IMPL_OVERRIDE = None


@contextlib.contextmanager
def force_impl(name):
    global _IMPL_OVERRIDE
    prev = _IMPL_OVERRIDE
    _IMPL_OVERRIDE = name
    try:
        yield
    finally:
        _IMPL_OVERRIDE = prev


def _impl():
    if _IMPL_OVERRIDE is not None:
        return _IMPL_OVERRIDE
    env = os.environ.get("POSEIDON_IMPL", "auto")
    if env != "auto":
        return env
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "jnp"


# Minimum batch lanes for the Pallas kernel to win over the scan path.
# Measured on v5e: a standalone 131k-state permute is 2.8x faster through the
# kernel (transposes included), but *inside* the verifier's level scans the
# pallas_call boundary blocks XLA fusion and materializes the state per level
# (net regression at 107k lanes: 23.3k -> 17.5k proofs/s).  So the kernel
# only engages for very wide standalone batches (bulk hashing, proof-factory
# grinding); the fully-fused scan path serves the verifier.
_PALLAS_MIN_LANES = int(os.environ.get("POSEIDON_PALLAS_MIN_LANES", 1 << 17))


def permute(state):
    """state: (hi, lo) pair of (..., 12) u32 -> permuted pair."""
    from ..utils import profiling

    if _impl() == "pallas" and not profiling.active():
        n = 1
        for d in state[0].shape[:-1]:
            n *= d
        if n >= _PALLAS_MIN_LANES:
            from . import poseidon_pallas

            return poseidon_pallas.permute(state)
    return _permute_jnp(state)


def _permute_jnp(state):
    from ..utils import profiling

    if profiling.active():
        n = 1
        for d in state[0].shape[:-1]:
            n *= d
        profiling.record("poseidon_permute", n)

    def scan_rounds(body, state, lo_r, hi_r):
        rc = (jnp.asarray(_RC_HI[lo_r:hi_r]), jnp.asarray(_RC_LO[lo_r:hi_r]))

        def step(carry, x):
            return body(carry, x), None

        with profiling.multiplier(hi_r - lo_r):
            state, _ = jax.lax.scan(step, state, rc)
        return state

    r0 = HALF_N_FULL_ROUNDS
    r1 = HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS
    state = scan_rounds(_full_round, state, 0, r0)
    state = scan_rounds(_partial_round, state, r0, r1)
    state = scan_rounds(_full_round, state, r1, N_ROUNDS)
    return state


# ----------------------------------------------------------------------------
# Plane layout: state as (12, N) — element index on sublanes, batch on lanes.
# This is the TPU-optimal layout (the trailing axis of the batch-last form is
# only 12 wide, wasting 116/128 lanes); the Pallas kernel consumes planes
# natively, so plane-form call sites pay no transposes at all.
# ----------------------------------------------------------------------------

def _mds_planes_jnp(state):
    hi, lo = state
    limbs = [lo & _MASK16, lo >> 16, hi & _MASK16, hi >> 16]
    cols = [l * _CIRC[0] for l in limbs]
    rolled = limbs
    for i in range(1, W):
        rolled = [jnp.roll(l, -1, axis=0) for l in rolled]
        for k in range(4):
            cols[k] = cols[k] + rolled[k] * _CIRC[i]
    row0 = (jax.lax.broadcasted_iota(jnp.uint32, cols[0].shape, 0) == 0
            ).astype(jnp.uint32)
    for k in range(4):
        cols[k] = cols[k] + (limbs[k] * _DIAG0) * row0
    out_limbs = []
    carry = jnp.zeros_like(cols[0])
    for k in range(4):
        v = cols[k] + carry
        out_limbs.append(v & _MASK16)
        carry = v >> 16
    lo64 = gl.from_limbs16(out_limbs)
    hi64 = (jnp.zeros_like(carry), carry)
    return gl.reduce128(hi64, lo64)


def _full_round_planes(state, rc):
    state = gl.add(state, rc)
    state = _sbox(state)
    return _mds_planes_jnp(state)


def _partial_round_planes(state, rc):
    state = gl.add(state, rc)
    s0 = _sbox((state[0][0:1, :], state[1][0:1, :]))
    state = (jnp.concatenate([s0[0], state[0][1:, :]], axis=0),
             jnp.concatenate([s0[1], state[1][1:, :]], axis=0))
    return _mds_planes_jnp(state)


def permute_planes(state):
    """(hi, lo) pair of (12, N) u32 planes -> permuted planes.  Dispatches to
    the fused Pallas kernel on TPU for wide N (no transposes either way)."""
    from ..utils import profiling

    n = state[0].shape[1]
    if (_impl() == "pallas" and n >= _PALLAS_MIN_LANES
            and not profiling.active()):
        from . import poseidon_pallas

        return poseidon_pallas.permute_planes(state[0], state[1])

    if profiling.active():
        profiling.record("poseidon_permute", n)

    def scan_rounds(body, st, lo_r, hi_r):
        rc = (jnp.asarray(_RC_HI[lo_r:hi_r])[:, :, None],
              jnp.asarray(_RC_LO[lo_r:hi_r])[:, :, None])

        def step(carry, x):
            return body(carry, x), None

        with profiling.multiplier(hi_r - lo_r):
            st, _ = jax.lax.scan(step, st, rc)
        return st

    r0 = HALF_N_FULL_ROUNDS
    r1 = HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS
    state = scan_rounds(_full_round_planes, state, 0, r0)
    state = scan_rounds(_partial_round_planes, state, r0, r1)
    state = scan_rounds(_full_round_planes, state, r1, N_ROUNDS)
    return state


def hash_no_pad_planes(inputs):
    """(hi, lo) pair of (w, N) planes -> (4, N) hash planes (plonky2
    hash_n_to_m_no_pad, overwrite-mode rate-8 absorb; permutation.rs:286-305).
    Dispatches to the fused in-VMEM Pallas sponge on TPU."""
    from ..utils import profiling

    w, n = inputs[0].shape
    if _impl() == "pallas" and not profiling.active():
        from . import merkle_pallas

        return merkle_pallas.hash_no_pad_planes(inputs)
    state = (jnp.zeros((W, n), jnp.uint32), jnp.zeros((W, n), jnp.uint32))
    off = 0
    while off < w:
        k = min(SPONGE_RATE, w - off)
        state = (jnp.concatenate([inputs[0][off:off + k], state[0][k:]], axis=0),
                 jnp.concatenate([inputs[1][off:off + k], state[1][k:]], axis=0))
        state = permute_planes(state)
        off += k
    return (state[0][:4, :], state[1][:4, :])


def hash_or_noop_planes(inputs):
    """Plane-form hash_or_noop (reference: hash/mod.rs:109-119): <= 4 input
    rows are zero-padded to 4 (noop); wider inputs are sponged."""
    w = inputs[0].shape[0]
    if w <= 4:
        pad = ((0, 4 - w), (0, 0))
        return (jnp.pad(inputs[0], pad), jnp.pad(inputs[1], pad))
    return hash_no_pad_planes(inputs)


def two_to_one_planes(left, right):
    """left/right: (4, N) hash planes -> (4, N) compressed hash planes."""
    z = (jnp.zeros_like(left[0]), jnp.zeros_like(left[1]))
    state = (jnp.concatenate([left[0], right[0], z[0]], axis=0),
             jnp.concatenate([left[1], right[1], z[1]], axis=0))
    out = permute_planes(state)
    return (out[0][:4, :], out[1][:4, :])


# ----------------------------------------------------------------------------
# Sponge / hashing (plonky2 semantics)
# ----------------------------------------------------------------------------

def zero_state(shape=()):
    return gl.zeros(tuple(shape) + (W,))


def _overwrite_prefix(state, chunk):
    """state[..., :k] = chunk (k static)."""
    k = chunk[0].shape[-1]
    return (jnp.concatenate([chunk[0], state[0][..., k:]], axis=-1),
            jnp.concatenate([chunk[1], state[1][..., k:]], axis=-1))


def absorb(state, inputs):
    """Overwrite-mode sponge absorb of (..., k) inputs, k static
    (reference: permutation.rs:286-301).  Full rate-chunks are scanned so the
    graph holds a single permute instance for them."""
    k = inputs[0].shape[-1]
    n_full = k // SPONGE_RATE
    if n_full > 1:
        # (..., n_full, 8) -> scan over chunk axis
        chunks_hi = inputs[0][..., :n_full * SPONGE_RATE].reshape(
            inputs[0].shape[:-1] + (n_full, SPONGE_RATE))
        chunks_lo = inputs[1][..., :n_full * SPONGE_RATE].reshape(
            inputs[1].shape[:-1] + (n_full, SPONGE_RATE))
        # move chunk axis to front for scan
        chunks_hi = jnp.moveaxis(chunks_hi, -2, 0)
        chunks_lo = jnp.moveaxis(chunks_lo, -2, 0)

        def step(st, chunk):
            st = _overwrite_prefix(st, chunk)
            return permute(st), None

        from ..utils import profiling
        with profiling.multiplier(n_full):
            state, _ = jax.lax.scan(step, state, (chunks_hi, chunks_lo))
    elif n_full == 1:
        state = permute(_overwrite_prefix(
            state, (inputs[0][..., :SPONGE_RATE], inputs[1][..., :SPONGE_RATE])))
    rem = k - n_full * SPONGE_RATE
    if rem:
        tail = (inputs[0][..., k - rem:], inputs[1][..., k - rem:])
        state = permute(_overwrite_prefix(state, tail))
    return state


def hash_no_pad(inputs):
    """(..., k) -> (..., 4) (plonky2 hash_n_to_m_no_pad with 4 outputs)."""
    batch = inputs[0].shape[:-1]
    state = absorb(zero_state(batch), inputs)
    return (state[0][..., :4], state[1][..., :4])


def hash_or_noop(inputs):
    """<= 4 inputs: zero-pad; else sponge (reference: hash/mod.rs:109-119)."""
    k = inputs[0].shape[-1]
    if k <= 4:
        pad = [(0, 0)] * (inputs[0].ndim - 1) + [(0, 4 - k)]
        return (jnp.pad(inputs[0], pad), jnp.pad(inputs[1], pad))
    return hash_no_pad(inputs)


def two_to_one(left, right):
    """Compress two (..., 4) hashes: state[0:8] = left||right, one permute
    (reference: hash.rs:188-214)."""
    z = jnp.zeros_like(left[0])
    state = (jnp.concatenate([left[0], right[0], z], axis=-1),
             jnp.concatenate([left[1], right[1], z], axis=-1))
    state = permute(state)
    return (state[0][..., :4], state[1][..., :4])
