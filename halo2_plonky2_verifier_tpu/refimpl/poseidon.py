"""Poseidon permutation and hashing over Goldilocks, pure-int reference.

Mirrors plonky2's Poseidon (width 12, rate 8, x^7 S-box, 4+22+4 rounds) in the
mathematically-equivalent "naive" form (constant layer -> S-box -> dense MDS
every round; plonky2's fast-partial-round machinery is an algebraic
re-association of the same map — see
constants/poseidon_goldilocks.derive_fast_partial_round_constants and
reference: verifier/src/hash/poseidon/permutation.rs:217-284).

Hash API mirrors plonky2 hash_n_to_m_no_pad / hash_or_noop / two_to_one
(reference: verifier/src/hash/poseidon/hash.rs:162-214, verifier/src/hash/mod.rs:101-126).
"""

from ..constants.poseidon_goldilocks import (
    ALL_ROUND_CONSTANTS,
    GOLDILOCKS_PRIME as P,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    N_ROUNDS,
    SPONGE_RATE,
    SPONGE_WIDTH,
)

NUM_HASH_OUT_ELTS = 4

_T = SPONGE_WIDTH
# Dense MDS rows: row r maps state s to sum_c M[r][c] * s[c].
_MDS_ROWS = [
    [
        MDS_MATRIX_CIRC[(c - r) % _T] + (MDS_MATRIX_DIAG[r] if r == c else 0)
        for c in range(_T)
    ]
    for r in range(_T)
]


def _mds_layer(state):
    return [sum(row[c] * state[c] for c in range(_T)) % P for row in _MDS_ROWS]


def _sbox(x):
    # x^7 (reference: verifier/src/hash/poseidon/permutation.rs:196-207)
    x2 = x * x % P
    x4 = x2 * x2 % P
    x6 = x4 * x2 % P
    return x6 * x % P


def permute(state):
    """The full 30-round Poseidon permutation on a 12-element state."""
    assert len(state) == _T
    state = [s % P for s in state]
    for rnd in range(N_ROUNDS):
        base = rnd * _T
        state = [(s + ALL_ROUND_CONSTANTS[base + i]) % P for i, s in enumerate(state)]
        if HALF_N_FULL_ROUNDS <= rnd < HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS:
            state[0] = _sbox(state[0])
        else:
            state = [_sbox(s) for s in state]
        state = _mds_layer(state)
    return state


def absorb(state, inputs):
    """Overwrite-mode sponge absorb in rate-8 chunks, permuting per chunk.

    (reference: verifier/src/hash/poseidon/permutation.rs:286-301)
    """
    state = list(state)
    for i in range(0, len(inputs), SPONGE_RATE):
        chunk = inputs[i:i + SPONGE_RATE]
        state[:len(chunk)] = chunk
        state = permute(state)
    return state


def squeeze(state):
    return state[:SPONGE_RATE]


def hash_no_pad(inputs):
    """plonky2 hash_n_to_m_no_pad with 4 outputs: zero state, absorb, take 4."""
    state = absorb([0] * _T, inputs)
    return state[:NUM_HASH_OUT_ELTS]


def hash_or_noop(inputs):
    """If <= 4 inputs, zero-pad to a 4-element hash; else hash_no_pad.

    (reference: verifier/src/hash/mod.rs:109-119)
    """
    if len(inputs) <= NUM_HASH_OUT_ELTS:
        return list(inputs) + [0] * (NUM_HASH_OUT_ELTS - len(inputs))
    return hash_no_pad(inputs)


def two_to_one(left, right):
    """Compress two 4-element hashes: state[0:8] = left||right, one permute.

    (reference: verifier/src/hash/poseidon/hash.rs:188-214)
    """
    state = [0] * _T
    state[0:NUM_HASH_OUT_ELTS] = left
    state[NUM_HASH_OUT_ELTS:2 * NUM_HASH_OUT_ELTS] = right
    state = permute(state)
    return state[:NUM_HASH_OUT_ELTS]
