"""Config-space property sweep: prove + verify across the StarkConfig / FRI
parameter matrix, refimpl <-> JAX differential.

The reference only ever exercises standard_fast_config (stark/mod.rs:412);
a shared semantic error in any hand-reconstructed starky convention (e.g.
permutation-batch indexing, final-poly alpha shift, arity scheduling) could
hide there.  This sweep varies rate_bits, cap_height, proof_of_work_bits,
reduction arity/final-poly bits, num_challenges, and degree_bits so such an
error has to survive MANY geometries at once — and tampering must be
rejected in each.
"""

import numpy as np
import pytest

from halo2_plonky2_verifier_tpu.models.fibonacci import FibonacciStark
from halo2_plonky2_verifier_tpu.refimpl import field as gl
from halo2_plonky2_verifier_tpu.refimpl import prover, verifier
from halo2_plonky2_verifier_tpu.refimpl.fixtures import fibonacci_public_inputs
from halo2_plonky2_verifier_tpu.utils.config import FriConfig, StarkConfig


def _prove(num_rows, config):
    stark = FibonacciStark(num_rows)
    pis = fibonacci_public_inputs(num_rows)
    trace = stark.generate_trace(pis[0], pis[1], gl.P)
    return stark, prover.prove(stark, config, trace, pis)


def _verifies(stark, pwp, config):
    try:
        verifier.verify(stark, pwp, config)
        return True
    except verifier.VerificationError:
        return False


# The broad matrix (pure-int, fast): every row varies at least one knob the
# reference never moves.  num_query_rounds is kept small — query soundness is
# config-independent and Q only scales the workload.
SWEEP = [
    # (num_rows, rate_bits, cap_height, pow_bits, (arity, final_poly), n_chal)
    (8, 1, 0, 4, (1, 1), 1),      # minimal everything; arity-2 folds
    (8, 2, 1, 8, (2, 2), 2),      # rate 2, arity 4
    (8, 3, 0, 5, (3, 3), 1),      # rate 3, arity 8
    (16, 1, 2, 9, (2, 1), 2),     # two arity-4 folds (4+4 <= degree 4... sched)
    (32, 1, 4, 16, (4, 5), 2),    # the standard_fast_config shape
    (32, 2, 3, 10, (4, 1), 1),    # deeper folding, odd cap height
    (64, 1, 1, 6, (5, 1), 2),     # arity-32 fold
    (128, 1, 2, 8, (3, 1), 3),    # three challenges, arity-8 chain
    (2048, 1, 4, 16, (4, 5), 2),  # the n=2^11 two-fold benchmark shape
]


@pytest.mark.parametrize("num_rows,rate,cap,pow_bits,strategy,n_chal", SWEEP)
def test_refimpl_prove_verify_sweep(num_rows, rate, cap, pow_bits, strategy,
                                    n_chal):
    config = StarkConfig(
        num_challenges=n_chal,
        fri_config=FriConfig(
            rate_bits=rate, cap_height=cap, proof_of_work_bits=pow_bits,
            reduction_strategy=strategy, num_query_rounds=7))
    stark, pwp = _prove(num_rows, config)
    assert _verifies(stark, pwp, config)

    # tamper: one opening value, one sibling hash element, the pow witness
    import copy

    t1 = copy.deepcopy(pwp)
    t1.proof.openings.local_values[0] = (
        (t1.proof.openings.local_values[0][0] + 1) % gl.P,
        t1.proof.openings.local_values[0][1])
    assert not _verifies(stark, t1, config)

    t2 = copy.deepcopy(pwp)
    qr = t2.proof.opening_proof.query_round_proofs[0]
    sib = qr.initial_trees_proof.evals_proofs[0][1].siblings
    if sib:
        sib[0] = tuple((x + 1) % gl.P for x in sib[0])
        assert not _verifies(stark, t2, config)

    t3 = copy.deepcopy(pwp)
    t3.proof.opening_proof.pow_witness = (
        t3.proof.opening_proof.pow_witness + 1) % gl.P
    assert not _verifies(stark, t3, config)


# The JAX differential subset: small-Q configs so the compiled graphs stay
# cheap on CPU, but covering degenerate cap_height=0, arity-2 folds, rate 2,
# and a single-challenge run — none of which the flagship shape exercises.
JAX_SWEEP = [
    (8, 1, 0, 4, (1, 1), 1),
    (8, 2, 1, 8, (2, 2), 2),
    (16, 1, 2, 9, (2, 1), 2),
    (64, 1, 1, 6, (5, 1), 2),
]


@pytest.mark.parametrize("num_rows,rate,cap,pow_bits,strategy,n_chal", JAX_SWEEP)
def test_jax_verifier_config_sweep(num_rows, rate, cap, pow_bits, strategy,
                                   n_chal):
    from halo2_plonky2_verifier_tpu import build_verifier, load_proofs, proof_shape
    from halo2_plonky2_verifier_tpu.utils.compile import smart_jit

    config = StarkConfig(
        num_challenges=n_chal,
        fri_config=FriConfig(
            rate_bits=rate, cap_height=cap, proof_of_work_bits=pow_bits,
            reduction_strategy=strategy, num_query_rounds=4))
    stark, pwp = _prove(num_rows, config)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits)

    import copy

    bad = copy.deepcopy(pwp)
    bad.proof.openings.next_values[1] = (
        (bad.proof.openings.next_values[1][0] + 1) % gl.P,
        bad.proof.openings.next_values[1][1])
    batch = load_proofs([pwp, bad, pwp], shape)
    verify = smart_jit(build_verifier(stark, config, degree_bits))
    verdict = np.asarray(verify(batch))
    assert verdict.tolist() == [True, False, True]
