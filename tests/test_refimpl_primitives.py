"""Tests of the pure-int reference layer: field, FFT, Merkle, challenger."""

import random

from halo2_plonky2_verifier_tpu.refimpl import challenger, fft, field as gl, merkle, poseidon


def test_field_constants():
    assert gl.P == (1 << 64) - (1 << 32) + 1
    # POWER_OF_TWO_GENERATOR is exactly 7^((p-1)/2^32): plonky2's choice.
    assert gl.POWER_OF_TWO_GENERATOR == pow(7, (gl.P - 1) >> 32, gl.P)
    assert pow(gl.POWER_OF_TWO_GENERATOR, 1 << 32, gl.P) == 1
    assert pow(gl.POWER_OF_TWO_GENERATOR, 1 << 31, gl.P) == gl.P - 1


def test_field_ops():
    rng = random.Random(0)
    for _ in range(200):
        a, b = rng.randrange(gl.P), rng.randrange(1, gl.P)
        assert gl.mul(gl.div(a, b), b) == a % gl.P
        assert gl.mul(a, gl.inv(a) if a else 1) in (1, 0)
    xs = [rng.randrange(1, gl.P) for _ in range(17)]
    assert gl.batch_inv(xs) == [gl.inv(x) for x in xs]


def test_ext_ops():
    rng = random.Random(1)
    for _ in range(100):
        a = (rng.randrange(gl.P), rng.randrange(gl.P))
        b = (rng.randrange(gl.P), rng.randrange(gl.P))
        if a == (0, 0):
            continue
        assert gl.ext_mul(gl.ext_inv(a), a) == gl.EXT_ONE
        # distributivity spot check
        c = (rng.randrange(gl.P), rng.randrange(gl.P))
        lhs = gl.ext_mul(a, gl.ext_add(b, c))
        rhs = gl.ext_add(gl.ext_mul(a, b), gl.ext_mul(a, c))
        assert lhs == rhs
    # X * X == W
    assert gl.ext_mul((0, 1), (0, 1)) == (gl.W, 0)


def test_fft_roundtrip_and_evaluation():
    rng = random.Random(2)
    for log_n in (0, 1, 3, 6):
        n = 1 << log_n
        coeffs = [rng.randrange(gl.P) for _ in range(n)]
        vals = fft.fft(coeffs)
        g = gl.primitive_root_of_unity(log_n)
        for i in {0, min(1, n - 1), n - 1}:
            assert vals[i] == fft.eval_poly(coeffs, pow(g, i, gl.P))
        assert fft.ifft(vals) == coeffs
        shifted = fft.coset_fft(coeffs, gl.GENERATOR)
        if n > 1:
            assert shifted[1] == fft.eval_poly(coeffs, gl.GENERATOR * g % gl.P)
        assert fft.coset_ifft(shifted, gl.GENERATOR) == coeffs


def test_reverse_index_bits():
    assert fft.reverse_index_bits(list(range(8))) == [0, 4, 2, 6, 1, 5, 3, 7]


def test_merkle_tree_and_proofs():
    rng = random.Random(3)
    leaves = [[rng.randrange(gl.P) for _ in range(7)] for _ in range(32)]
    for cap_height in (0, 2, 5):
        tree = merkle.MerkleTree(leaves, cap_height)
        assert len(tree.cap) == 1 << cap_height
        for idx in (0, 5, 31):
            siblings = tree.prove(idx)
            assert len(siblings) == 5 - cap_height
            assert merkle.verify_merkle_proof_to_cap(leaves[idx], idx, tree.cap, siblings)
        # corrupt leaf fails
        assert not merkle.verify_merkle_proof_to_cap(
            [x + 1 for x in leaves[0]], 0, tree.cap, tree.prove(0)
        )


def test_challenger_duplex_semantics():
    ch = challenger.Challenger()
    # With no observations, challenges come from permutations of the zero state,
    # popped from the END of the rate window.
    zero_perm = poseidon.permute([0] * 12)
    c0 = ch.get_challenge()
    assert c0 == zero_perm[7]
    c1 = ch.get_challenge()
    assert c1 == zero_perm[6]
    # Observing invalidates buffered outputs and absorbs in overwrite mode.
    ch2 = challenger.Challenger()
    ch2.get_challenge()
    ch2.observe_element(42)
    state = list(zero_perm)
    state[0] = 42
    expect = poseidon.permute(state)
    assert ch2.get_challenge() == expect[7]


def test_challenger_chunked_absorb_equivalence():
    # Observing 20 elements then squeezing must equal eager per-8 duplexing.
    xs = list(range(100, 120))
    ch = challenger.Challenger()
    ch.observe_elements(xs)
    got = ch.get_challenge()

    state = [0] * 12
    state[:8] = xs[0:8]
    state = poseidon.permute(state)
    state[:8] = xs[8:16]
    state = poseidon.permute(state)
    state[:4] = xs[16:20]
    state = poseidon.permute(state)
    assert got == state[7]
