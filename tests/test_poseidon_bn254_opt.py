"""The optimized C/S/P schedule (go-iden3/plonky2x evaluation form) must be
bit-identical to the naive circomlib-form permutation — this closes the
algebraic-equivalence assumption in the BN254 lineage chain (VERDICT r3
missing #3): the reference's chips consume gnark/plonky2x's C/S/P tables
(reference: verifier/src/hash/poseidon_bn254/permutation.rs:7-11), which are
this exact re-association of the circomlib instance our Grain-regenerated
constants are KAT-pinned to."""

import random

from halo2_plonky2_verifier_tpu.constants.poseidon_bn254 import (
    FULL_ROUNDS, P_BN254, PARTIAL_ROUNDS, WIDTH)
from halo2_plonky2_verifier_tpu.refimpl import poseidon_bn254 as naive
from halo2_plonky2_verifier_tpu.refimpl import poseidon_bn254_opt as opt


def test_opt_schedule_matches_naive_random_states():
    rng = random.Random(0xB254)
    for _ in range(25):
        state = [rng.randrange(P_BN254) for _ in range(WIDTH)]
        assert opt.permute_opt(state) == naive.permute(state)


def test_opt_schedule_matches_naive_edge_states():
    for state in ([0] * WIDTH, [1] * WIDTH,
                  [P_BN254 - 1] * WIDTH,
                  [0, 0, 1, 2], [7, 0, 0, 0]):
        assert opt.permute_opt(state) == naive.permute(state)


def test_goiden3_table_shapes():
    """The exported flat tables have exactly go-iden3-crypto's layout:
    C has t*R_F + R_P entries, S has (2t-1)*R_P, P and M are t x t."""
    C, S, m, p = opt.goiden3_layout()
    assert len(C) == WIDTH * FULL_ROUNDS + PARTIAL_ROUNDS
    assert len(S) == (2 * WIDTH - 1) * PARTIAL_ROUNDS
    assert len(m) == WIDTH and all(len(r) == WIDTH for r in m)
    assert len(p) == WIDTH and all(len(r) == WIDTH for r in p)
    assert all(0 <= x < P_BN254 for x in C)
    assert all(0 <= x < P_BN254 for x in S)


def test_two_to_one_through_opt_schedule():
    """The Merkle compression primitive agrees between schedules."""
    left = 0x1234567890ABCDEF << 64 | 42
    right = (1 << 200) + 17
    state = [0, 0, left % P_BN254, right % P_BN254]
    assert opt.permute_opt(state)[0] == naive.two_to_one(left, right)
