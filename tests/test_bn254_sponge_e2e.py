"""All-BN254 configuration end-to-end: BN254 Merkle commitments AND the
BN254-sponge Fiat-Shamir transcript, prover -> refimpl verifier -> batched
TPU verifier, with tamper lanes.

The reference's ChallengerChip is generic over the permutation chip
(verifier/src/challenger/mod.rs:19); its test configs only ever instantiate
the Goldilocks sponge (stark/mod.rs:493-499).  This file occupies the other
instantiation slot with a real proof pipeline: refimpl.prover.prove(...,
transcript="poseidon_bn254") grinds/draws every challenge through
BN254Challenger, and the TPU verifier recomputes them through
BN254TranscriptSchedule / run_schedule_bn254."""

import copy

import numpy as np
import pytest

from halo2_plonky2_verifier_tpu import build_verifier, load_proofs, proof_shape
from halo2_plonky2_verifier_tpu.models.fibonacci import FibonacciStark
from halo2_plonky2_verifier_tpu.refimpl import field as gl
from halo2_plonky2_verifier_tpu.refimpl import hashers, prover, verifier
from halo2_plonky2_verifier_tpu.refimpl.fixtures import fibonacci_public_inputs
from halo2_plonky2_verifier_tpu.utils.compile import smart_jit
from halo2_plonky2_verifier_tpu.utils.config import FriConfig, StarkConfig


def _small_config(num_queries=4):
    return StarkConfig(
        num_challenges=2,
        fri_config=FriConfig(rate_bits=1, cap_height=1, proof_of_work_bits=8,
                             reduction_strategy=(2, 1),
                             num_query_rounds=num_queries))


@pytest.fixture(scope="module")
def bn254_sponge_proof():
    config = _small_config()
    stark = FibonacciStark(8)
    pis = fibonacci_public_inputs(8)
    trace = stark.generate_trace(pis[0], pis[1], gl.P)
    pwp = prover.prove(stark, config, trace, pis, hashers.BN254,
                       transcript="poseidon_bn254")
    return stark, config, pwp


def test_all_bn254_refimpl_roundtrip(bn254_sponge_proof):
    stark, config, pwp = bn254_sponge_proof
    verifier.verify(stark, pwp, config, hasher=hashers.BN254,
                    transcript="poseidon_bn254")


def test_transcript_backends_disagree(bn254_sponge_proof):
    """A proof made with the BN254 sponge must NOT verify under the GL
    sponge (the challenge streams genuinely differ)."""
    stark, config, pwp = bn254_sponge_proof
    with pytest.raises(verifier.VerificationError):
        verifier.verify(stark, pwp, config, hasher=hashers.BN254)


def test_all_bn254_tpu_batch(bn254_sponge_proof):
    """Batched TPU verification of the all-BN254 config, with tamper lanes
    on the transcript-facing surfaces (cap observation, PoW witness)."""
    stark, config, pwp = bn254_sponge_proof
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits, "poseidon_bn254")

    bad_cap = copy.deepcopy(pwp)
    bad_cap.proof.trace_cap[0] = (bad_cap.proof.trace_cap[0] + 1)
    bad_pow = copy.deepcopy(pwp)
    bad_pow.proof.opening_proof.pow_witness = (
        bad_pow.proof.opening_proof.pow_witness + 1) % gl.P
    bad_open = copy.deepcopy(pwp)
    lv = bad_open.proof.openings.local_values
    lv[0] = ((lv[0][0] + 1) % gl.P, lv[0][1])

    batch = load_proofs([pwp, bad_cap, bad_pow, bad_open], shape)
    vf = smart_jit(build_verifier(stark, config, degree_bits,
                                  hasher="poseidon_bn254",
                                  transcript="poseidon_bn254"))
    assert np.asarray(vf(batch)).tolist() == [True, False, False, False]
