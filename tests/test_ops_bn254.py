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


def test_school_sq_matches_school():
    """Symmetric-square schoolbook (136 limb products) == school(a, a) on
    raw columns after normalization, including edge values (0, 1, p-1 and
    non-canonical lazy values up to ~2.6p as the kernel rounds produce)."""
    import jax.numpy as jnp

    from halo2_plonky2_verifier_tpu.ops import bn254_planes as frp

    vals = _rand(32) + [0, 1, P - 1, int(P * 2.6) - 3, (1 << 256) - 1]
    n = len(vals)
    a = np.zeros((16, n), np.uint32)
    for c, v in enumerate(vals):
        for k in range(16):
            a[k, c] = (v >> (16 * k)) & 0xFFFF
    a = jnp.asarray(a)

    def both(x):
        s1, c1 = frp.normalize(frp.school(x, x))
        s2, c2 = frp.normalize(frp.school_sq(x))
        return s1, c1, s2, c2

    s1, c1, s2, c2 = smart_jit(both)(a)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_bn254_kernel_tile_boundaries():
    """The fused BN254 permutation kernel at lane counts straddling the
    small-input tile (256): below, exactly at, and just above — all must
    agree with the wide-batch result (padding correctness)."""
    import jax.numpy as jnp

    from halo2_plonky2_verifier_tpu.ops import poseidon_bn254_pallas as pbp

    rng = np.random.default_rng(0xB254)
    n = 300
    st = np.zeros((64, n), np.uint32)
    vals = [[_rng.randrange(P) for _ in range(4)] for _ in range(n)]
    for c in range(n):
        for i in range(4):
            vm = vals[c][i] * pbp.fr.R_INT % pbp.fr.P_INT
            for k in range(16):
                st[i * 16 + k, c] = (vm >> (16 * k)) & 0xFFFF
    full = np.asarray(pbp.permute_mont_planes(jnp.asarray(st),
                                              interpret=True))
    for m in (13, 256, 300):
        part = np.asarray(pbp.permute_mont_planes(jnp.asarray(st[:, :m]),
                                                  interpret=True))
        np.testing.assert_array_equal(part, full[:, :m])
