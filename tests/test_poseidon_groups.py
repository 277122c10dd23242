"""Differential tests for the element-major multi-state (POSEIDON_GROUPS)
kernel layout: G independent sponge states stacked on the sublane axis with
row = element*G + group, so the partial-round sbox runs on an aligned (G, T)
block and elementwise ops pack full 8-sublane vregs.

Each grouped kernel (permute, chained permute, Merkle path loop, leaf
sponge) must be bit-identical to the G=1 form / the jnp plane path, across
padding edges (N not a multiple of G*TILE)."""

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_plonky2_verifier_tpu.ops import goldilocks as gl
from halo2_plonky2_verifier_tpu.ops import merkle_pallas, poseidon
from halo2_plonky2_verifier_tpu.ops import poseidon_pallas as pp

P = (1 << 64) - (1 << 32) + 1


def _rand_planes(rng, rows, n):
    v = rng.integers(0, P, size=(rows, n), dtype=np.uint64)
    return (jnp.asarray((v >> 32).astype(np.uint32)),
            jnp.asarray((v & 0xFFFFFFFF).astype(np.uint32)))


def _np64(pair):
    hi, lo = np.asarray(pair[0], np.uint64), np.asarray(pair[1], np.uint64)
    return (hi << np.uint64(32)) | lo


def test_group_reshape_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, size=(12, 64), dtype=np.uint64)
                    .astype(np.uint32))
    for g in (2, 4, 8):
        y = pp.from_groups(pp.to_groups(x, g), g)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # element-major row placement: row e*G+g holds chunk g of element e
    g = 4
    t = pp.to_groups(x, g)
    np.testing.assert_array_equal(
        np.asarray(t)[2 * g + 3], np.asarray(x)[2, 3 * 16:4 * 16])


@pytest.mark.parametrize("n", [1024, 1000])
def test_permute_grouped_matches_jnp(n):
    rng = np.random.default_rng(1)
    hi, lo = _rand_planes(rng, 12, n)
    ref = poseidon.permute_planes((hi, lo))
    for g in (8, 4):
        oh, ol = pp.permute_planes(hi, lo, interpret=True, groups=g)
        np.testing.assert_array_equal(_np64((oh, ol)), _np64(ref))


def test_permute_chained_grouped(n=640):
    rng = np.random.default_rng(2)
    hi, lo = _rand_planes(rng, 12, n)
    st = (hi, lo)
    for _ in range(3):
        st = poseidon.permute_planes(st)
    oh, ol = pp.permute_planes_chained(hi, lo, 3, interpret=True, groups=8)
    np.testing.assert_array_equal(_np64((oh, ol)), _np64(st))


@pytest.mark.parametrize("n", [512, 500])
def test_merkle_paths_grouped(n):
    rng = np.random.default_rng(3)
    d_max = 5
    node = _rand_planes(rng, 4, n)
    sib = tuple(
        jnp.stack([p for p in planes])
        for planes in zip(*[_rand_planes(rng, 4, n) for _ in range(d_max)]))
    idx = jnp.asarray(rng.integers(0, 1 << d_max, size=n, dtype=np.uint32))
    depth = rng.integers(1, d_max + 1, size=n)
    active = jnp.asarray(
        (np.arange(d_max)[:, None] < depth[None, :]).astype(np.uint32))
    ref = merkle_pallas.verify_paths_planes(node, sib, idx, active,
                                            interpret=True, groups=1)
    out = merkle_pallas.verify_paths_planes(node, sib, idx, active,
                                            interpret=True, groups=8)
    np.testing.assert_array_equal(_np64(out), _np64(ref))


@pytest.mark.parametrize("b", [256, 250])
def test_transcript_grouped(b):
    from halo2_plonky2_verifier_tpu.ops import transcript_pallas

    rng = np.random.default_rng(5)
    n_steps = 4
    ch = _rand_planes(rng, n_steps * 8, b)
    chunks = tuple(p.reshape(n_steps, 8, b) for p in ch)
    mask = jnp.asarray(
        rng.integers(0, 2, size=(n_steps, 8, 1)).astype(np.uint32))
    ref = transcript_pallas.run_steps_planes(chunks, mask, interpret=True,
                                             groups=1)
    out = transcript_pallas.run_steps_planes(chunks, mask, interpret=True,
                                             groups=8)
    np.testing.assert_array_equal(_np64(out), _np64(ref))


def test_transcript_grouped_vs_refimpl(b=64):
    """g=8 transcript vs the pure-int duplex sponge (not just g=1 parity)."""
    from halo2_plonky2_verifier_tpu.ops import transcript_pallas
    from halo2_plonky2_verifier_tpu.refimpl import poseidon as pos_ref

    rng = np.random.default_rng(6)
    n_steps = 3
    ch = _rand_planes(rng, n_steps * 8, b)
    chunks = tuple(p.reshape(n_steps, 8, b) for p in ch)
    mask = np.ones((n_steps, 8, 1), np.uint32)  # full-rate overwrite steps
    ys = transcript_pallas.run_steps_planes(
        chunks, jnp.asarray(mask), interpret=True, groups=8)
    got = _np64(ys)                              # (ns, 8, b)
    vals = _np64(chunks)
    for lane in range(0, b, 17):
        st = [0] * 12
        for s in range(n_steps):
            st[:8] = [int(v) for v in vals[s, :, lane]]
            st = pos_ref.permute(st)
            np.testing.assert_array_equal(got[s, :, lane],
                                          np.array(st[:8], np.uint64))


@pytest.mark.parametrize("w", [7, 13])
def test_sponge_grouped(w, n=384):
    rng = np.random.default_rng(4)
    inputs = _rand_planes(rng, w, n)
    ref = merkle_pallas.hash_no_pad_planes(inputs, interpret=True, groups=1)
    out = merkle_pallas.hash_no_pad_planes(inputs, interpret=True, groups=8)
    np.testing.assert_array_equal(_np64(out), _np64(ref))


def test_e2e_verifier_grouped(monkeypatch):
    """Full verifier (transcript + Merkle + FRI) with POSEIDON_GROUPS=8:
    valid proof accepted, tampered pow_witness rejected."""
    import copy

    from halo2_plonky2_verifier_tpu import (build_verifier, load_proofs,
                                            proof_shape)
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof
    from halo2_plonky2_verifier_tpu.utils.compile import smart_jit

    monkeypatch.setenv("POSEIDON_GROUPS", "8")
    stark, config, pwp = get_fibonacci_proof(1 << 3)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits)
    bad = copy.deepcopy(pwp)
    bad.proof.opening_proof.pow_witness ^= 1
    batch = load_proofs([pwp, bad], shape)
    verdict = np.asarray(smart_jit(build_verifier(stark, config,
                                                  degree_bits))(batch))
    assert verdict.tolist() == [True, False]
