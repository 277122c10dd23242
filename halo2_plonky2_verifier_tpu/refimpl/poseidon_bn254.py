"""Poseidon over BN254 Fr + plonky2x PoseidonBN128Hash conventions (pure-int).

Mirrors the reference's PoseidonBN254 chips
(verifier/src/hash/poseidon_bn254/{permutation.rs, hash.rs}) in executor form.
The permutation is the circomlib t=4 instance in the naive round structure.
Equivalence to the optimized C/S/P schedule the chips actually execute
(plonky2x `permution`) is PROVEN executable: `poseidon_bn254_opt.permute_opt`
derives the C/S/P tables from the same Grain constants and the differential
test pins naive == optimized (tests/test_poseidon_bn254_opt.py); the base
constants are KAT-pinned in constants/poseidon_bn254.py.

Hashing conventions (hash.rs:100-209, permutation.rs:205-252):
  - a hash value is a SINGLE Fr element;
  - <= 3 Goldilocks elements pack into one Fr base 2^64 (hash_or_noop noop);
  - sponge absorb: chunks of RATE*3 = 9 Goldilocks elements, each triple
    packed into one Fr placed in state[1..3] (state[0] is capacity),
    permuting per chunk; hash output = state[0];
  - two_to_one: zero state with state[2] = left, state[3] = right, one
    permutation, output state[0];
  - Fr -> Goldilocks observation: 5 x 56-bit little-endian limbs.
"""

from ..constants.poseidon_bn254 import (
    FULL_ROUNDS,
    P_BN254 as P,
    PARTIAL_ROUNDS,
    RATE,
    WIDTH,
    generate,
)

GL_BITS = 64
_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS


def permute(state):
    """Naive circomlib-form permutation on a WIDTH-element Fr state."""
    assert len(state) == WIDTH
    c, m = generate()
    state = [s % P for s in state]
    half = FULL_ROUNDS // 2
    for r in range(_ROUNDS):
        state = [(s + c[r * WIDTH + i]) % P for i, s in enumerate(state)]
        if r < half or r >= _ROUNDS - half:
            state = [pow(s, 5, P) for s in state]
        else:
            state[0] = pow(state[0], 5, P)
        state = [sum(m[i][j] * state[j] for j in range(WIDTH)) % P
                 for i in range(WIDTH)]
    return state


def pack_goldilocks(elements):
    """<= 3 Goldilocks values -> one Fr, little-endian base 2^64
    (NativeChip::limbs_to_num, reference: hash.rs:101-114)."""
    assert len(elements) <= 3
    acc = 0
    for x in reversed(elements):
        acc = (acc << GL_BITS) | int(x)
    return acc % P


def absorb_goldilocks(state, inputs):
    """Chunks of 9 GL -> 3 packed Fr in state[1..3], permute per chunk
    (reference: permutation.rs:205-228)."""
    state = list(state)
    for i in range(0, len(inputs), RATE * 3):
        chunk = inputs[i:i + RATE * 3]
        for j in range(0, len(chunk), 3):
            state[j // 3 + 1] = pack_goldilocks(chunk[j:j + 3])
        state = permute(state)
    return state


def hash_no_pad(inputs):
    state = absorb_goldilocks([0] * WIDTH, inputs)
    return state[0]


def hash_or_noop(inputs):
    """<= 3 GL elements: packed Fr; else sponge (MAX_GOLDILOCKS = 3)."""
    if len(inputs) <= 3:
        return pack_goldilocks(inputs)
    return hash_no_pad(inputs)


def two_to_one(left, right):
    state = [0, 0, left % P, right % P]
    return permute(state)[0]


def to_goldilocks_vec(value):
    """Fr -> 5 x 56-bit limbs (each < 2^56 < p_gl, so canonical Goldilocks)
    (reference: hash.rs:30-43)."""
    v = int(value)
    out = []
    for _ in range(5):
        out.append(v & ((1 << 56) - 1))
        v >>= 56
    assert v == 0
    return out


def squeeze_goldilocks(state):
    """First RATE elements, each decomposed into 5 x 56-bit limbs
    (reference: permutation.rs:234-252)."""
    out = []
    for x in state[:RATE]:
        out.extend(to_goldilocks_vec(x))
    return out
