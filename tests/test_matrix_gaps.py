"""Coverage for the geometry corners the flagship shape misses:
BN254 commitments with commit-phase folds (step trees + leaf sponges),
step-tree sibling tampering, and additional mesh shapes."""

import copy

import numpy as np

import jax
import pytest

from halo2_plonky2_verifier_tpu import build_verifier, load_proofs, proof_shape
from halo2_plonky2_verifier_tpu.models.fibonacci import FibonacciStark
from halo2_plonky2_verifier_tpu.refimpl import field as gl
from halo2_plonky2_verifier_tpu.refimpl import hashers, prover, verifier
from halo2_plonky2_verifier_tpu.refimpl.fixtures import fibonacci_public_inputs
from halo2_plonky2_verifier_tpu.utils.compile import smart_jit
from halo2_plonky2_verifier_tpu.utils.config import FriConfig, StarkConfig


def _prove(num_rows, config, hasher=None):
    stark = FibonacciStark(num_rows)
    pis = fibonacci_public_inputs(num_rows)
    trace = stark.generate_trace(pis[0], pis[1], gl.P)
    return stark, prover.prove(stark, config, trace, pis, hasher)


def test_bn254_fold_shape_e2e():
    """BN254 Merkle commitments with a commit-phase fold: step trees, wide
    leaf sponges through the BN254 pack-3 absorb, GL transcript."""
    config = StarkConfig(
        num_challenges=2,
        fri_config=FriConfig(rate_bits=1, cap_height=1, proof_of_work_bits=8,
                             reduction_strategy=(2, 1), num_query_rounds=4))
    stark, pwp = _prove(128, config, hashers.BN254)
    verifier.verify(stark, pwp, config, hasher=hashers.BN254)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits, "poseidon_bn254")
    assert len(shape.reduction_arity_bits) >= 2, "must exercise step trees"

    bad = copy.deepcopy(pwp)
    # BN254 siblings are single Fr values; corrupt one step-tree sibling
    bad.proof.opening_proof.query_round_proofs[0].steps[1] \
        .merkle_proof.siblings[0] = 12345
    batch = load_proofs([pwp, bad], shape)
    vf = smart_jit(build_verifier(stark, config, degree_bits,
                                  hasher="poseidon_bn254"))
    assert np.asarray(vf(batch)).tolist() == [True, False]


def test_gl_step_sibling_tamper():
    """Tamper specifically with a STEP-tree sibling (commit-phase Merkle
    path) — distinct from the initial-tree tamper the sweep covers."""
    config = StarkConfig(
        num_challenges=2,
        fri_config=FriConfig(rate_bits=1, cap_height=1, proof_of_work_bits=8,
                             reduction_strategy=(2, 1), num_query_rounds=4))
    stark, pwp = _prove(128, config)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits)
    assert len(shape.reduction_arity_bits) >= 2

    bad = copy.deepcopy(pwp)
    sib = bad.proof.opening_proof.query_round_proofs[2].steps[1] \
        .merkle_proof.siblings
    sib[0] = [(x + 1) % gl.P for x in sib[0]]
    batch = load_proofs([bad, pwp], shape)
    vf = smart_jit(build_verifier(stark, config, degree_bits))
    assert np.asarray(vf(batch)).tolist() == [False, True]


@pytest.mark.parametrize("dp,qp", [(8, 1), (2, 4)])
def test_mesh_shapes(dp, qp):
    from halo2_plonky2_verifier_tpu.parallel.mesh import (
        make_mesh, shard_batch, sharded_verifier)
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof

    assert len(jax.devices()) >= dp * qp
    mesh = make_mesh(jax.devices()[:dp * qp], dp=dp, qp=qp)
    stark, config, pwp = get_fibonacci_proof(8)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits)
    proofs = [copy.deepcopy(pwp) for _ in range(dp)]
    proofs[1].proof.openings.local_values[0] = (
        (proofs[1].proof.openings.local_values[0][0] + 1) % gl.P,
        proofs[1].proof.openings.local_values[0][1])
    batch = load_proofs(proofs, shape)
    sharded = shard_batch(batch, mesh)
    verify = sharded_verifier(stark, config, degree_bits, mesh)
    verdict = np.asarray(verify(sharded)).tolist()
    expect = [True] * dp
    expect[1] = False
    assert verdict == expect
