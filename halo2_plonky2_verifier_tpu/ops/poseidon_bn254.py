"""Batched Poseidon-over-BN254-Fr permutation and hashing on TPU lanes.

Executor analog of the reference's PoseidonBN254 chips
(verifier/src/hash/poseidon_bn254/): the circomlib t=4 instance (x^5 S-box,
8 full + 56 partial rounds) in naive round form — equivalent to the gnark
optimized C/P/S schedule the chips execute (validated via external KATs, see
constants/poseidon_bn254.py).

State: 4 Fr lanes, each a (..., 16) u16-limb array (ops.bn254), kept in
Montgomery form inside the permutation; round loops are lax.scans over
Montgomery-form constant tables so the graph holds one full-round and one
partial-round body.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..constants.poseidon_bn254 import (
    FULL_ROUNDS,
    PARTIAL_ROUNDS,
    RATE,
    WIDTH,
    generate,
)
from . import bn254 as fr

_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS
_HALF = FULL_ROUNDS // 2


def _tables():
    c, m = generate()
    c_mont = np.zeros((_ROUNDS, WIDTH, fr.N_LIMBS), dtype=np.uint32)
    for r in range(_ROUNDS):
        for i in range(WIDTH):
            v = c[r * WIDTH + i] * fr.R_INT % fr.P_INT
            for k in range(fr.N_LIMBS):
                c_mont[r, i, k] = (v >> (16 * k)) & 0xFFFF
    m_mont = np.zeros((WIDTH, WIDTH, fr.N_LIMBS), dtype=np.uint32)
    for i in range(WIDTH):
        for j in range(WIDTH):
            v = m[i][j] * fr.R_INT % fr.P_INT
            for k in range(fr.N_LIMBS):
                m_mont[i, j, k] = (v >> (16 * k)) & 0xFFFF
    return c_mont, m_mont


_C_MONT, _M_MONT = None, None


def _get_tables():
    global _C_MONT, _M_MONT
    if _C_MONT is None:
        _C_MONT, _M_MONT = _tables()
    return _C_MONT, _M_MONT


def _sbox5(x):
    x2 = fr.mont_mul(x, x)
    x4 = fr.mont_mul(x2, x2)
    return fr.mont_mul(x4, x)


def _mix(state, m_mont):
    """state: (..., 4, 16) Montgomery; new[i] = sum_j M[i][j] * state[j]."""
    # products: (..., 4out, 4in, 16) in ONE mont_mul instance
    prod = fr.mont_mul(m_mont, state[..., None, :, :])
    acc = prod[..., 0, :]
    for j in range(1, WIDTH):
        acc = fr.add_mod(acc, prod[..., j, :])
    return acc


def _round_body(state, rc, m_mont, full):
    state = fr.add_mod(state, rc)
    if full:
        state = _sbox5(state)
    else:
        s0 = _sbox5(state[..., 0:1, :])
        state = jnp.concatenate([s0, state[..., 1:, :]], axis=-2)
    return _mix(state, m_mont)


def permute_mont(state):
    """(..., 4, 16) Montgomery-form state -> permuted Montgomery state.
    Dispatches to the fused in-VMEM Pallas plane kernel on TPU
    (ops/poseidon_bn254_pallas.py); jnp scan elsewhere / under the census."""
    from ..utils import profiling

    if profiling.active():
        n = 1
        for d in state.shape[:-2]:
            n *= d
        profiling.record("poseidon_bn254_permute", n)
    else:
        from . import poseidon

        if poseidon._impl() == "pallas":
            from . import poseidon_bn254_pallas

            return poseidon_bn254_pallas.permute_mont_batchlast(state)
    c_mont, m_mont = _get_tables()
    mm = jnp.asarray(m_mont)

    def scan_rounds(state, lo, hi, full):
        rc = jnp.asarray(c_mont[lo:hi])

        def step(st, x):
            return _round_body(st, x, mm, full), None

        with profiling.multiplier(hi - lo):
            state, _ = jax.lax.scan(step, state, rc)
        return state

    state = scan_rounds(state, 0, _HALF, True)
    state = scan_rounds(state, _HALF, _ROUNDS - _HALF, False)
    state = scan_rounds(state, _ROUNDS - _HALF, _ROUNDS, True)
    return state


def permute(state_std):
    """Standard-form (..., 4, 16) state -> standard-form permuted state."""
    r2 = jnp.asarray(np.array(
        [int(x) for x in fr.R2_LIMBS], dtype=np.uint32))
    mont = fr.mont_mul(state_std, jnp.broadcast_to(r2, state_std.shape))
    out = permute_mont(mont)
    return fr.from_mont(out)


# ----------------------------------------------------------------------------
# plonky2x hashing conventions (reference: hash.rs, permutation.rs:205-252)
# ----------------------------------------------------------------------------

def hash_or_noop_gl(gl_inputs):
    """gl_inputs: (hi, lo) pair of (..., k) Goldilocks arrays, k static.
    Returns standard-form Fr (..., 16): packed if k <= 3 else sponge."""
    k = gl_inputs[0].shape[-1]
    pairs = [(gl_inputs[0][..., i], gl_inputs[1][..., i]) for i in range(k)]
    if k <= 3:
        return fr.pack_goldilocks(pairs)
    return hash_no_pad_gl(gl_inputs)


def hash_no_pad_gl(gl_inputs):
    """Sponge over Goldilocks inputs: chunks of 9 -> 3 packed Fr into
    state[1..3], permute per chunk; output = state[0] (standard form)."""
    k = gl_inputs[0].shape[-1]
    batch = gl_inputs[0].shape[:-1]
    state = jnp.zeros(batch + (WIDTH, fr.N_LIMBS), jnp.uint32)  # 0 is Montgomery 0
    pairs = [(gl_inputs[0][..., i], gl_inputs[1][..., i]) for i in range(k)]
    for i in range(0, k, RATE * 3):
        chunk = pairs[i:i + RATE * 3]
        slots = []
        for j in range(0, len(chunk), 3):
            packed = fr.pack_goldilocks(chunk[j:j + 3])
            slots.append(fr.to_mont(packed))
        parts = [state[..., 0:1, :]]
        for sj, slot in enumerate(slots):
            parts.append(slot[..., None, :])
        parts.append(state[..., 1 + len(slots):, :])
        state = jnp.concatenate(parts, axis=-2)
        state = permute_mont(state)
    return fr.from_mont(state[..., 0, :])


def two_to_one(left_std, right_std):
    """left/right: standard-form Fr (..., 16); zero state with slots 2, 3."""
    batch = left_std.shape[:-1]
    zero = jnp.zeros(batch + (1, fr.N_LIMBS), jnp.uint32)
    lm = fr.to_mont(left_std)[..., None, :]
    rm = fr.to_mont(right_std)[..., None, :]
    state = jnp.concatenate([zero, zero, lm, rm], axis=-2)
    state = permute_mont(state)
    return fr.from_mont(state[..., 0, :])
