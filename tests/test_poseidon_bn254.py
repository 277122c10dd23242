"""BN254 Poseidon constants + hashing conventions + BN254-config e2e
(the executor analog of test_fibonacci_stark_bn254, stark/mod.rs:462-518)."""

import pytest

from halo2_plonky2_verifier_tpu.constants import poseidon_bn254 as pc
from halo2_plonky2_verifier_tpu.refimpl import (
    field as gl, hashers, merkle, poseidon_bn254 as pb, verifier)
from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof


def test_grain_generation_matches_circomlib_t3():
    c, m = pc.generate(3, 8, 57)
    state = [0, 1, 2]
    # naive permutation for t=3
    p = pc.P_BN254
    rounds = 8 + 57
    for r in range(rounds):
        state = [(s + c[r * 3 + i]) % p for i, s in enumerate(state)]
        if r < 4 or r >= rounds - 4:
            state = [pow(s, 5, p) for s in state]
        else:
            state[0] = pow(state[0], 5, p)
        state = [sum(m[i][j] * state[j] for j in range(3)) % p for i in range(3)]
    assert state[0] == pc.KAT_T3_HASH_1_2


def test_t4_instance_matches_go_iden3():
    out = pb.permute([0, 1, 2, 3])
    assert out[0] == pc.KAT_T4_HASH_1_2_3


def test_hashing_conventions():
    # pack <= 3 GL elements, little-endian base 2^64
    assert pb.hash_or_noop([5, 7]) == 5 + (7 << 64)
    assert pb.hash_or_noop([1, 2, 3]) == 1 + (2 << 64) + (3 << 128)
    # 4 elements hash through the sponge (MAX_GOLDILOCKS = 3)
    h4 = pb.hash_or_noop([1, 2, 3, 4])
    state = [0, 1 + (2 << 64) + (3 << 128), 4, 0]
    assert h4 == pb.permute(state)[0]
    # two_to_one places inputs at state slots 2, 3 (hash.rs:200-203)
    l, r = 123456789, 987654321
    assert pb.two_to_one(l, r) == pb.permute([0, 0, l, r])[0]
    # 56-bit limb decomposition round-trips
    v = pc.P_BN254 - 12345
    limbs = pb.to_goldilocks_vec(v)
    assert len(limbs) == 5 and all(x < (1 << 56) for x in limbs)
    assert sum(x << (56 * i) for i, x in enumerate(limbs)) == v


def test_bn254_merkle_tree():
    import random
    rng = random.Random(9)
    leaves = [[rng.randrange(gl.P) for _ in range(4)] for _ in range(16)]
    tree = merkle.MerkleTree(leaves, 2, hashers.BN254)
    assert all(isinstance(h, int) for h in tree.cap)
    for idx in (0, 7, 15):
        assert merkle.verify_merkle_proof_to_cap(
            leaves[idx], idx, tree.cap, tree.prove(idx), hashers.BN254)


@pytest.mark.parametrize("num_rows", [1 << 3, 1 << 5])
def test_fibonacci_stark_bn254_e2e(num_rows):
    stark, config, pwp = get_fibonacci_proof(num_rows, hasher=hashers.BN254)
    verifier.verify(stark, pwp, config, hasher=hashers.BN254)
    # BN254 caps are single Fr values
    assert isinstance(pwp.proof.trace_cap[0], int)


def test_bn254_tampered_rejected():
    stark, config, pwp = get_fibonacci_proof(1 << 3, hasher=hashers.BN254)
    import copy
    bad = copy.deepcopy(pwp)
    bad.proof.trace_cap[0] ^= 1
    with pytest.raises(verifier.VerificationError):
        verifier.verify(stark, bad, config, hasher=hashers.BN254)
