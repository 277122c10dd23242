"""End-to-end: pure-int prover -> pure-int verifier, mirroring the reference's
test_fibonacci_stark / test_fibonacci_stark_gl flow (n = 2^5 and 2^3)."""

import copy

import pytest

from halo2_plonky2_verifier_tpu.refimpl import field as gl, verifier
from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof
from halo2_plonky2_verifier_tpu.refimpl.proof import proof_from_json, proof_to_json


def _prove_fib(num_rows):
    stark, config, pwp = get_fibonacci_proof(num_rows)
    return stark, config, copy.deepcopy(pwp)


@pytest.mark.parametrize("num_rows", [1 << 3, 1 << 5])
def test_fibonacci_stark_prove_and_verify(num_rows):
    stark, config, pwp = _prove_fib(num_rows)
    verifier.verify(stark, pwp, config)  # raises on failure


def test_fibonacci_stark_proof_shape_n32():
    """Shape checks against the reference flamegraph workload (n=2^5,
    degree_bits=5, lde_bits=6, cap_height=4 -> 2 siblings per initial proof,
    no FRI folds, 84 query rounds, 2 Z polys, 2 quotient polys)."""
    stark, config, pwp = _prove_fib(1 << 5)
    p = pwp.proof
    assert p.recover_degree_bits(config) == 5
    assert len(p.trace_cap) == 16
    assert len(p.permutation_zs_cap) == 16
    assert len(p.openings.local_values) == 4
    assert len(p.openings.permutation_zs) == 2
    assert len(p.openings.quotient_polys) == 2
    fri = p.opening_proof
    assert len(fri.commit_phase_merkle_caps) == 0
    assert len(fri.query_round_proofs) == 84
    assert len(fri.final_poly) == 32
    qr = fri.query_round_proofs[0]
    assert [len(ep[0]) for ep in qr.initial_trees_proof.evals_proofs] == [4, 2, 2]
    assert [len(ep[1].siblings) for ep in qr.initial_trees_proof.evals_proofs] == [2, 2, 2]
    assert qr.steps == []
    assert pwp.proof.opening_proof.pow_witness >= 0


def test_tampered_proof_rejected():
    stark, config, pwp = _prove_fib(1 << 3)
    # corrupt one opening value
    lv = list(pwp.proof.openings.local_values)
    lv[0] = ((lv[0][0] + 1) % gl.P, lv[0][1])
    pwp.proof.openings.local_values = lv
    with pytest.raises(verifier.VerificationError):
        verifier.verify(stark, pwp, config)


def test_wrong_public_input_rejected():
    stark, config, pwp = _prove_fib(1 << 3)
    pwp.public_inputs = [0, 1, 12345]
    with pytest.raises(verifier.VerificationError):
        verifier.verify(stark, pwp, config)


def test_proof_json_roundtrip():
    stark, config, pwp = _prove_fib(1 << 3)
    s = proof_to_json(pwp)
    pwp2 = proof_from_json(s)
    verifier.verify(stark, pwp2, config)
    assert proof_to_json(pwp2) == s
