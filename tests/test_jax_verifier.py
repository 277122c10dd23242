"""End-to-end: JAX TPU-lane verifier vs fixture proofs (the executor analog of
the reference's test_fibonacci_stark_gl, stark/mod.rs:406-459)."""

import copy

import numpy as np
import pytest

import jax

from halo2_plonky2_verifier_tpu.utils.compile import smart_jit
from halo2_plonky2_verifier_tpu import build_verifier, load_proofs, proof_shape
from halo2_plonky2_verifier_tpu.refimpl import field as gl
from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof


def _setup(num_rows, batch=2):
    stark, config, pwp = get_fibonacci_proof(num_rows)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits)
    proofs = [copy.deepcopy(pwp) for _ in range(batch)]
    return stark, config, degree_bits, shape, proofs


_VCACHE = {}


def _verifier(stark, config, degree_bits, hasher="poseidon_goldilocks"):
    """One compiled verifier per shape for the whole test session."""
    key = (stark.num_rows, degree_bits, hasher)
    if key not in _VCACHE:
        _VCACHE[key] = smart_jit(build_verifier(
            stark, config, degree_bits, hasher=hasher))
    return _VCACHE[key]


@pytest.mark.parametrize("num_rows", [1 << 3, 1 << 5])
def test_verify_accepts_valid_proofs(num_rows):
    stark, config, degree_bits, shape, proofs = _setup(num_rows, batch=6)
    batch = load_proofs(proofs, shape)
    verify = _verifier(stark, config, degree_bits)
    verdict = np.asarray(verify(batch))
    assert verdict.shape == (6,)
    assert verdict.all(), "valid proofs must verify"


def test_verify_rejects_tampering():
    stark, config, degree_bits, shape, proofs = _setup(1 << 3, batch=6)
    # proof 0 stays valid; each other proof gets a distinct corruption
    proofs[1].proof.opening_proof.pow_witness ^= 1
    proofs[2].proof.trace_cap[0][0] = (proofs[2].proof.trace_cap[0][0] + 1) % gl.P
    lv = proofs[3].proof.openings.local_values
    lv[0] = ((lv[0][0] + 1) % gl.P, lv[0][1])
    proofs[4].public_inputs[2] = (proofs[4].public_inputs[2] + 1) % gl.P
    ev = proofs[5].proof.opening_proof.query_round_proofs[10].initial_trees_proof
    ev.evals_proofs[0][0][1] = (ev.evals_proofs[0][0][1] + 1) % gl.P

    batch = load_proofs(proofs, shape)
    verify = _verifier(stark, config, degree_bits)
    verdict = np.asarray(verify(batch))
    assert verdict[0], "untampered lane must stay valid"
    assert not verdict[1:].any(), f"tampered lanes must fail: {verdict}"


def test_verify_rejects_noncanonical_witness():
    stark, config, degree_bits, shape, proofs = _setup(1 << 3, batch=6)
    # a value >= p must be rejected by the canonicality (range) check
    proofs[1].proof.openings.next_values[0] = (gl.P, 0)
    batch = load_proofs(proofs, shape)
    verify = _verifier(stark, config, degree_bits)
    verdict = np.asarray(verify(batch))
    assert verdict[0] and not verdict[1] and verdict[2:].all()


def test_challenges_match_refimpl():
    """The scan-based transcript must reproduce the reference challenger."""
    from halo2_plonky2_verifier_tpu.refimpl import verifier as ref_verifier
    from halo2_plonky2_verifier_tpu import stark as stark_mod
    from halo2_plonky2_verifier_tpu.transcript import (
        TranscriptSchedule, extract, run_schedule)
    from halo2_plonky2_verifier_tpu.ops import goldilocks as gl_ops

    stark, config, degree_bits, shape, proofs = _setup(1 << 5, batch=1)
    ref = ref_verifier.get_stark_challenges(proofs[0].proof, stark, config)

    # run just the schedule part by reusing build_verifier internals via a
    # tiny schedule replay: observe the same stream and compare a few draws
    sched = TranscriptSchedule()
    import numpy as np
    p = proofs[0].proof
    stream = []
    for h in p.trace_cap:
        stream.extend(h)
    sched.observe(64)
    perm = [[(sched.get_challenge(), sched.get_challenge())
             for _ in range(config.num_challenges)]
            for _ in range(stark.permutation_batch_size())]
    for h in p.permutation_zs_cap:
        stream.extend(h)
    sched.observe(64)
    alphas = sched.get_n_challenges(config.num_challenges)
    els = gl_ops.from_u64(np.array(stream, dtype=np.uint64))
    ys = run_schedule(sched, els)
    got_beta0 = int(gl_ops.to_u64(extract(ys, perm[0][0][0])))
    want_beta0 = ref["permutation_challenge_sets"][0][0][0]
    assert got_beta0 == want_beta0
    got_alpha0 = int(gl_ops.to_u64(extract(ys, alphas[0])))
    assert got_alpha0 == ref["stark_alphas"][0]


def test_bn254_config_verify():
    """JAX verifier with the BN254 Merkle backend (the executor analog of
    test_fibonacci_stark_bn254, stark/mod.rs:462-518)."""
    from halo2_plonky2_verifier_tpu.refimpl import hashers

    stark, config, pwp = get_fibonacci_proof(1 << 3, hasher=hashers.BN254)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits, hasher="poseidon_bn254")
    proofs = [copy.deepcopy(pwp) for _ in range(3)]
    proofs[1].proof.trace_cap[2] ^= 1                      # corrupt a cap Fr
    proofs[2].proof.opening_proof.pow_witness ^= 1
    batch = load_proofs(proofs, shape)
    verify = smart_jit(build_verifier(stark, config, degree_bits,
                                      hasher="poseidon_bn254"))
    verdict = np.asarray(verify(batch))
    assert list(verdict) == [True, False, False], verdict


@pytest.mark.parametrize("num_rows", [1 << 7, 1 << 11])
def test_verify_with_fri_folding(num_rows):
    """Shapes with commit-phase reduction steps: n=2^7 (one arity-16 fold),
    n=2^11 (two folds, nonzero step-tree depth) — exercising eval-consistency
    gathers, barycentric coset interpolation, step Merkle paths, and beta
    challenges in the JAX verifier."""
    stark, config, degree_bits, shape, proofs = _setup(num_rows, batch=4)
    assert len(proofs[0].proof.opening_proof.query_round_proofs[0].steps) >= 1
    # tamper: corrupt one step eval (must break eval-consistency or the fold)
    st = proofs[1].proof.opening_proof.query_round_proofs[5].steps[0]
    st.evals[3] = ((st.evals[3][0] + 1) % gl.P, st.evals[3][1])
    # tamper: corrupt a commit-phase cap hash
    proofs[2].proof.opening_proof.commit_phase_merkle_caps[0][1][0] ^= 1
    # tamper: corrupt the final polynomial
    fp = proofs[3].proof.opening_proof.final_poly
    fp[0] = ((fp[0][0] + 1) % gl.P, fp[0][1])
    batch = load_proofs(proofs, shape)
    verify = smart_jit(build_verifier(stark, config, degree_bits))
    verdict = np.asarray(verify(batch))
    assert list(verdict) == [True, False, False, False], verdict
