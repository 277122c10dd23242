"""Differential tests: JAX BN254 Fr ops + Poseidon vs the pure-int reference."""

import random

import numpy as np

import jax

from halo2_plonky2_verifier_tpu.constants.poseidon_bn254 import P_BN254 as P
from halo2_plonky2_verifier_tpu.utils.compile import smart_jit
from halo2_plonky2_verifier_tpu.ops import bn254 as fr
from halo2_plonky2_verifier_tpu.ops import goldilocks as gl_ops
from halo2_plonky2_verifier_tpu.ops import poseidon_bn254 as pb_ops
from halo2_plonky2_verifier_tpu.refimpl import field as gl, poseidon_bn254 as pb_ref

_rng = random.Random(0xB254)


def _rand(n):
    vals = [_rng.randrange(P) for _ in range(n)]
    vals[:4] = [0, 1, P - 1, P - 2]
    return vals


def test_roundtrip_and_predicates():
    vals = _rand(32) + [P, P + 5]
    a = fr.from_ints(vals)
    assert list(fr.to_ints(a)) == [v % (1 << 256) for v in vals]
    canon = np.asarray(fr.is_canonical(a))
    assert list(canon) == [v < P for v in vals]


def test_add_sub_mul():
    n = 64
    av, bv = _rand(n), list(reversed(_rand(n)))
    a, b = fr.from_ints(av), fr.from_ints(bv)
    assert list(fr.to_ints(smart_jit(fr.add_mod)(a, b))) == \
        [(x + y) % P for x, y in zip(av, bv)]
    assert list(fr.to_ints(smart_jit(fr.sub_mod)(a, b))) == \
        [(x - y) % P for x, y in zip(av, bv)]
    # mont_mul(aR, b) = a*b; check via to_mont
    am = smart_jit(fr.to_mont)(a)
    got = fr.to_ints(smart_jit(fr.mont_mul)(am, b))
    assert list(got) == [x * y % P for x, y in zip(av, bv)]
    # from_mont(to_mont(a)) == a
    assert list(fr.to_ints(fr.from_mont(am))) == [x % P for x in av]


def test_permute_matches_reference():
    B = 6
    states = [[_rng.randrange(P) for _ in range(4)] for _ in range(B)]
    dev = fr.from_ints(states)
    out = smart_jit(pb_ops.permute)(dev)
    got = fr.to_ints(out)
    for i in range(B):
        assert list(got[i]) == pb_ref.permute(states[i]), i


def test_hashing_matches_reference():
    B = 4
    for k in (2, 3, 4, 9, 14):
        data = np.array([[_rng.randrange(gl.P) for _ in range(k)]
                         for _ in range(B)], dtype=np.uint64)
        out = smart_jit(pb_ops.hash_or_noop_gl)(gl_ops.from_u64(data))
        got = fr.to_ints(out)
        for i in range(B):
            assert got[i] == pb_ref.hash_or_noop([int(x) for x in data[i]]), k

    lv = _rand(B)
    rv = list(reversed(_rand(B)))
    out = smart_jit(pb_ops.two_to_one)(fr.from_ints(lv), fr.from_ints(rv))
    got = fr.to_ints(out)
    for i in range(B):
        assert got[i] == pb_ref.two_to_one(lv[i], rv[i])


def test_56bit_observation():
    vals = _rand(16)
    a = fr.from_ints(vals)
    wins = fr.to_goldilocks_56(a)
    assert len(wins) == 5
    for i, v in enumerate(vals):
        want = pb_ref.to_goldilocks_vec(v)
        for j in range(5):
            got = (int(np.asarray(wins[j][0])[i]) << 32) | int(np.asarray(wins[j][1])[i])
            assert got == want[j], (i, j)
