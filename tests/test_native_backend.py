"""Native C++ backend vs the pure-int reference (differential)."""

import random

import numpy as np
import pytest

from halo2_plonky2_verifier_tpu.refimpl import (
    fft, field as gl, merkle, native_backend as nb, poseidon)

pytestmark = pytest.mark.skipif(not nb.available(),
                                reason="native toolchain unavailable")
_rng = random.Random(0xC11)


def test_permute_matches():
    states = np.array([[_rng.randrange(gl.P) for _ in range(12)]
                       for _ in range(32)], dtype=np.uint64)
    out = nb.poseidon_permute_batch(states)
    for i in range(32):
        assert list(map(int, out[i])) == poseidon.permute(
            [int(x) for x in states[i]])


def test_hash_leaves_and_merkle():
    for width in (2, 4, 7, 20):
        leaves = np.array([[_rng.randrange(gl.P) for _ in range(width)]
                           for _ in range(16)], dtype=np.uint64)
        got = nb.hash_leaves(leaves)
        for i in range(16):
            assert list(map(int, got[i])) == poseidon.hash_or_noop(
                [int(x) for x in leaves[i]])
    leaves = np.array([[_rng.randrange(gl.P) for _ in range(6)]
                       for _ in range(32)], dtype=np.uint64)
    levels = nb.merkle_levels(leaves, 2)
    ref = merkle.MerkleTree([[int(x) for x in row] for row in leaves], 2)
    assert len(levels) == len(ref.levels)
    for lv, rlv in zip(levels, ref.levels):
        assert [[int(x) for x in h] for h in lv] == rlv


def test_ntt_matches():
    for log_n in (1, 4, 8):
        n = 1 << log_n
        coeffs = [_rng.randrange(gl.P) for _ in range(n)]
        got = nb.coset_fft(np.array(coeffs, dtype=np.uint64), gl.GENERATOR)
        want = fft.coset_fft(coeffs, gl.GENERATOR)
        assert list(map(int, got)) == want
        back = nb.coset_ifft(got, gl.GENERATOR)
        assert list(map(int, back)) == coeffs
        plain = nb.ntt(np.array(coeffs, dtype=np.uint64))
        assert list(map(int, plain)) == fft.fft(coeffs)


def test_pow_grind_matches_semantics():
    from halo2_plonky2_verifier_tpu.refimpl.challenger import Challenger
    ch = Challenger()
    ch.observe_elements(list(range(100, 120)))  # 2 full chunks + 4 tail
    # replicate the prover's shared-prefix setup
    state = [0] * 12
    pending = list(ch.input_buffer)
    n_full = (len(pending) // 8) * 8
    for i in range(0, n_full, 8):
        state[:8] = pending[i:i + 8]
        state = poseidon.permute(state)
    tail = pending[n_full:]
    w = nb.pow_grind(np.array(state, dtype=np.uint64),
                     np.array(tail, dtype=np.uint64), pow_bits=10)
    fork = Challenger()
    fork.sponge_state = list(ch.sponge_state)
    fork.input_buffer = list(ch.input_buffer)
    fork.observe_element(w)
    assert fork.get_challenge() < (1 << 54)
    # minimality: no smaller witness works
    for cand in range(w):
        f2 = Challenger()
        f2.sponge_state = list(ch.sponge_state)
        f2.input_buffer = list(ch.input_buffer)
        f2.observe_element(cand)
        assert f2.get_challenge() >= (1 << 54)


def test_batch_inverse():
    lib = nb.get_lib()
    vals = np.array([_rng.randrange(1, gl.P) for _ in range(33)], dtype=np.uint64)
    out = np.empty_like(vals)
    lib.gl_batch_inverse(nb._ptr(vals), len(vals), nb._ptr(out))
    assert [int(x) for x in out] == [gl.inv(int(v)) for v in vals]
