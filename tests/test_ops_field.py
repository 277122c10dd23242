"""Differential tests: TPU-lane (JAX) field ops vs the pure-int reference."""

import random

import numpy as np
import pytest

import jax

from halo2_plonky2_verifier_tpu.ops import goldilocks as gl_ops
from halo2_plonky2_verifier_tpu.ops import goldilocks_ext as gle_ops
from halo2_plonky2_verifier_tpu.ops import poseidon as pos_ops
from halo2_plonky2_verifier_tpu.refimpl import field as gl, poseidon as pos_ref

P = gl.P
_rng = random.Random(0xC0FFEE)


def _rand_u64(n, edge=True):
    vals = [_rng.randrange(P) for _ in range(n)]
    if edge:
        vals[:8] = [0, 1, P - 1, P - 2, (1 << 32), (1 << 32) - 1, (1 << 63) % P, 2]
    return np.array(vals, dtype=np.uint64)


def test_roundtrip():
    x = _rand_u64(64)
    assert (gl_ops.to_u64(gl_ops.from_u64(x)) == x).all()


@pytest.mark.parametrize("op,ref", [
    ("add", gl.add), ("sub", gl.sub), ("mul", gl.mul),
])
def test_binary_ops(op, ref):
    n = 512
    a, b = _rand_u64(n), _rand_u64(n)
    b[:8] = a[:8][::-1] % P  # exercise equal/edge combinations
    fn = getattr(gl_ops, op)
    got = gl_ops.to_u64(jax.jit(fn)(gl_ops.from_u64(a), gl_ops.from_u64(b)))
    want = np.array([ref(int(x), int(y)) for x, y in zip(a, b)], dtype=np.uint64)
    assert (got == want).all()


def test_mul_const_small():
    n = 256
    a = _rand_u64(n)
    for c in (0, 1, 7, 41, 65535):
        got = gl_ops.to_u64(gl_ops.mul_const_small(gl_ops.from_u64(a), c))
        want = np.array([int(x) * c % P for x in a], dtype=np.uint64)
        assert (got == want).all(), c


def test_inv_and_div():
    a = _rand_u64(128)
    a[a == 0] = 1
    got = gl_ops.to_u64(jax.jit(gl_ops.inv)(gl_ops.from_u64(a)))
    want = np.array([gl.inv(int(x)) for x in a], dtype=np.uint64)
    assert (got == want).all()


def test_exp_const():
    a = _rand_u64(32)
    for e in (0, 1, 2, 7, 1 << 16, P - 2):
        got = gl_ops.to_u64(gl_ops.exp_const(gl_ops.from_u64(a), e))
        want = np.array([pow(int(x), e, P) for x in a], dtype=np.uint64)
        assert (got == want).all(), e


def test_predicates():
    a = np.array([0, 1, P - 1, P, P + 5, (1 << 64) - 1, 1 << 48, (1 << 48) - 1],
                 dtype=np.uint64)
    pair = gl_ops.from_u64(a)
    assert list(np.asarray(gl_ops.is_canonical(pair))) == \
        [int(x) < P for x in a]
    assert list(np.asarray(gl_ops.lt_pow2(pair, 48))) == \
        [int(x) < (1 << 48) for x in a]
    bits = [int(np.asarray(gl_ops.bit(pair, i))[2]) for i in range(64)]
    assert sum(b << i for i, b in enumerate(bits)) == P - 1
    got = gl_ops.to_u64(gl_ops.mod_pow2(pair, 6))
    assert (got == (a % (1 << 6))).all()


def test_ext_ops():
    n = 128
    a = np.stack([_rand_u64(n), _rand_u64(n, edge=False)], axis=-1)
    b = np.stack([_rand_u64(n, edge=False), _rand_u64(n, edge=False)], axis=-1)
    ea, eb = gle_ops.from_u64(a), gle_ops.from_u64(b)

    def ref_pairs(f):
        return np.array([f((int(x[0]), int(x[1])), (int(y[0]), int(y[1])))
                         for x, y in zip(a, b)], dtype=np.uint64)

    assert (gle_ops.to_u64(jax.jit(gle_ops.mul)(ea, eb)) == ref_pairs(gl.ext_mul)).all()
    assert (gle_ops.to_u64(gle_ops.add(ea, eb)) == ref_pairs(gl.ext_add)).all()
    assert (gle_ops.to_u64(gle_ops.sub(ea, eb)) == ref_pairs(gl.ext_sub)).all()
    # square == mul(a, a)
    assert (gle_ops.to_u64(gle_ops.square(ea)) ==
            np.array([gl.ext_mul((int(x[0]), int(x[1])), (int(x[0]), int(x[1])))
                      for x in a], dtype=np.uint64)).all()
    # inv
    got = gle_ops.to_u64(jax.jit(gle_ops.inv)(ea))
    want = np.array([gl.ext_inv((int(x[0]), int(x[1]))) for x in a], dtype=np.uint64)
    assert (got == want).all()
    # Horner
    terms = [gle_ops.from_u64(np.stack([_rand_u64(n, edge=False)] * 2, -1))
             for _ in range(5)]
    got = gle_ops.to_u64(gle_ops.reduce_with_powers(terms, ea))
    terms_int = [gle_ops.to_u64(t) for t in terms]
    want = np.array([
        gl.reduce_with_powers_ext(
            [(int(t[i][0]), int(t[i][1])) for t in terms_int],
            (int(a[i][0]), int(a[i][1])))
        for i in range(n)], dtype=np.uint64)
    assert (got == want).all()


def test_poseidon_permute_matches_reference():
    B = 16
    states = np.array([[_rng.randrange(P) for _ in range(12)] for _ in range(B)],
                      dtype=np.uint64)
    out = jax.jit(pos_ops.permute)(gl_ops.from_u64(states))
    got = gl_ops.to_u64(out)
    for i in range(B):
        assert list(map(int, got[i])) == pos_ref.permute([int(x) for x in states[i]])


def test_poseidon_hashing_matches_reference():
    B = 8
    for k in (3, 4, 7, 12, 20):
        data = np.array([[_rng.randrange(P) for _ in range(k)] for _ in range(B)],
                        dtype=np.uint64)
        got = gl_ops.to_u64(pos_ops.hash_or_noop(gl_ops.from_u64(data)))
        for i in range(B):
            assert list(map(int, got[i])) == pos_ref.hash_or_noop(
                [int(x) for x in data[i]]), k
    left = np.array([[_rng.randrange(P) for _ in range(4)] for _ in range(B)],
                    dtype=np.uint64)
    right = np.array([[_rng.randrange(P) for _ in range(4)] for _ in range(B)],
                     dtype=np.uint64)
    got = gl_ops.to_u64(jax.jit(pos_ops.two_to_one)(
        gl_ops.from_u64(left), gl_ops.from_u64(right)))
    for i in range(B):
        assert list(map(int, got[i])) == pos_ref.two_to_one(
            [int(x) for x in left[i]], [int(x) for x in right[i]])


def test_poseidon_absorb_matches_reference():
    # 20 elements = 2 full chunks (scanned) + 1 tail chunk
    B = 4
    data = np.array([[_rng.randrange(P) for _ in range(20)] for _ in range(B)],
                    dtype=np.uint64)
    state = pos_ops.zero_state((B,))
    out = gl_ops.to_u64(jax.jit(pos_ops.absorb)(state, gl_ops.from_u64(data)))
    for i in range(B):
        want = pos_ref.absorb([0] * 12, [int(x) for x in data[i]])
        assert list(map(int, out[i])) == want


def test_square_and_lazy_ops():
    """The lazy (non-canonical < 2^64) mul/square/add variants used inside
    the Pallas permutation rounds: results must be congruent mod p to the
    canonical ops for arbitrary u64 (not just < p) inputs, and canonicalize
    must land them back in [0, p)."""
    rng = np.random.default_rng(11)
    # include values in [p, 2^64) to exercise the lazy domain
    a64 = rng.integers(0, 1 << 64, size=(512,), dtype=np.uint64)
    b64 = rng.integers(0, 1 << 64, size=(512,), dtype=np.uint64)
    a = gl_ops.from_u64(a64)
    b = gl_ops.from_u64(b64)

    got = gl_ops.to_u64(jax.tree_util.tree_map(
        np.asarray, gl_ops.canonicalize(gl_ops.mul_lazy(a, b))))
    want = (a64.astype(object) * b64.astype(object)) % gl.P
    assert (got.astype(object) == want).all()

    got_sq = gl_ops.to_u64(jax.tree_util.tree_map(
        np.asarray, gl_ops.canonicalize(gl_ops.square_lazy(a))))
    want_sq = (a64.astype(object) * a64.astype(object)) % gl.P
    assert (got_sq.astype(object) == want_sq).all()

    # canonical square must equal mul(a, a) for canonical inputs
    ac = gl_ops.from_u64(a64 % np.uint64(gl.P))
    got_c = gl_ops.to_u64(jax.tree_util.tree_map(np.asarray, gl_ops.square(ac)))
    want_c = gl_ops.to_u64(jax.tree_util.tree_map(np.asarray, gl_ops.mul(ac, ac)))
    assert (got_c == want_c).all()

    # add_lazy: a < 2^64, b < p
    bc = gl_ops.from_u64(b64 % np.uint64(gl.P))
    got_add = gl_ops.to_u64(jax.tree_util.tree_map(
        np.asarray, gl_ops.canonicalize(gl_ops.add_lazy(a, bc))))
    want_add = (a64.astype(object) + (b64 % np.uint64(gl.P)).astype(object)) % gl.P
    assert (got_add.astype(object) == want_add).all()
