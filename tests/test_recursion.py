"""Recursive verification: a PLONK circuit that verifies a STARK proof
IN-CIRCUIT — the executor analog of the reference's north star
(test_recursive_stark_verifier,
/root/reference/verifier/src/test_util/fibonacci_stark.rs:210-232).

Chain under test: refimpl STARK prover (inner proof) -> in-circuit verifier
(refimpl/plonk/recursion.py: PoseidonGate challenger + Merkle paths,
BaseSumGate index bits, RandomAccessGate picks, CosetInterpolationGate
folds, Reducing(Extension)Gate Horner reductions, vanishing check) ->
refimpl PLONK prover (outer proof) -> refimpl PLONK verifier AND the
batched TPU PLONK verifier.

Tamper lanes corrupt the INNER proof: witness generation must fail (an
honest outer prover cannot attest to an invalid inner proof); the same
equalities are copy constraints, so a malicious prover is caught by the
outer verifier instead."""

import copy
import os

import numpy as np
import pytest

from halo2_plonky2_verifier_tpu.refimpl import field as gl
from halo2_plonky2_verifier_tpu.refimpl import verifier as sverifier
from halo2_plonky2_verifier_tpu.refimpl.fixtures import (
    get_recursive_proof_batch, recursive_fib_setup)
from halo2_plonky2_verifier_tpu.refimpl.plonk.prover import (
    prove as plonk_prove)
from halo2_plonky2_verifier_tpu.refimpl.plonk.recursion import (
    recursive_witness)
from halo2_plonky2_verifier_tpu.refimpl.plonk.verifier import (
    verify as plonk_verify)


@pytest.fixture(scope="module")
def rec():
    return get_recursive_proof_batch(count=2)


def test_inner_proofs_native_valid():
    stark, cfg, inners, _b, _t = recursive_fib_setup(count=2)
    for inner in inners:
        sverifier.verify(stark, inner, cfg)


def test_recursive_outer_proofs_verify(rec):
    common, vd, outers, inners = rec
    for outer, inner in zip(outers, inners):
        plonk_verify(common, vd, outer)
        # the outer statement IS the inner public inputs
        assert outer.public_inputs == inner.public_inputs


def test_recursive_circuit_is_the_recursion_workload():
    """The gate frequencies/compositions are plonky2's recursive-verifier
    mix: a Poseidon sponge dominates (transcript + Merkle two_to_one),
    plus folds, picks, reductions, and bit splits."""
    *_, b, _t = recursive_fib_setup(count=1)
    from collections import Counter
    counts = Counter(type(g).__name__ for g, _ in b.rows)
    assert counts["PoseidonGate"] >= 25          # sponge-dominated
    for name in ("CosetInterpolationGate", "RandomAccessGate",
                 "BaseSumGate", "ReducingGate", "ReducingExtensionGate",
                 "ArithmeticExtensionGate", "MulExtensionGate",
                 "ArithmeticGate"):
        assert counts[name] >= 1, f"missing {name}"


def test_same_circuit_verifies_distinct_inner_proofs(rec):
    common, vd, outers, inners = rec
    assert len({tuple(o.public_inputs) for o in outers}) == len(outers)
    digests = {tuple(i.public_inputs) for i in inners}
    assert len(digests) == len(inners)


@pytest.mark.parametrize("surface,mutate", [
    ("merkle_sibling", lambda p: p.proof.opening_proof.query_round_proofs[0]
        .initial_trees_proof.evals_proofs[0][1].siblings[0].__setitem__(
            0, 12345)),
    ("initial_evals", lambda p: p.proof.opening_proof.query_round_proofs[0]
        .initial_trees_proof.evals_proofs[0][0].__setitem__(1, 7)),
    ("opening_local", lambda p: p.proof.openings.local_values.__setitem__(
        0, ((p.proof.openings.local_values[0][0] + 1) % gl.P,
            p.proof.openings.local_values[0][1]))),
    ("opening_quotient", lambda p: p.proof.openings.quotient_polys
        .__setitem__(0, ((p.proof.openings.quotient_polys[0][0] + 1) % gl.P,
                         p.proof.openings.quotient_polys[0][1]))),
    ("step_evals", lambda p: p.proof.opening_proof.query_round_proofs[1]
        .steps[0].__setattr__(
            "evals", [((e[0] + 1) % gl.P, e[1])
                      for e in p.proof.opening_proof
                      .query_round_proofs[1].steps[0].evals])),
    ("final_poly", lambda p: p.proof.opening_proof.__setattr__(
        "final_poly", [((e[0] + 1) % gl.P, e[1])
                       for e in p.proof.opening_proof.final_poly])),
    ("pow_witness", lambda p: p.proof.opening_proof.__setattr__(
        "pow_witness", (p.proof.opening_proof.pow_witness + 1) % gl.P)),
    ("trace_cap", lambda p: p.proof.trace_cap[0].__setitem__(0, 99)),
    ("public_input", lambda p: p.public_inputs.__setitem__(
        2, (p.public_inputs[2] + 1) % gl.P)),
])
def test_tampered_inner_proof_unprovable(surface, mutate):
    """Corrupting ANY inner-proof surface must make outer witness
    generation fail (conflicting copy constraints / range asserts)."""
    stark, cfg, inners, b, proof_t = recursive_fib_setup(count=1)
    common, pd, vd, builder = b.build()
    bad = copy.deepcopy(inners[0])
    mutate(bad)
    with pytest.raises((AssertionError, ValueError, ZeroDivisionError)):
        plonk_prove(common, pd, builder, recursive_witness(proof_t, bad))


@pytest.mark.skipif(
    os.environ.get("RUN_RECURSION_TPU", "0") != "1",
    reason="XLA compiles the recursion-circuit batched verifier for ~26 min "
           "(TPU) / ~50 min (CPU); opt in with RUN_RECURSION_TPU=1.  "
           "Validated on real TPU v5e in round 5: verdict "
           "[True, True, False] (tools: /tmp analog in STATUS.md r5 notes).")
def test_recursive_tpu_batch(rec):
    """Outer proofs verify on the batched TPU-lane PLONK verifier; a
    tampered outer statement (claiming a different inner PI) is rejected."""
    from halo2_plonky2_verifier_tpu.plonk import (build_plonk_verifier,
                                                  load_plonk_proofs,
                                                  plonk_proof_shape)
    from halo2_plonky2_verifier_tpu.utils.compile import smart_jit

    common, vd, outers, inners = rec
    shape = plonk_proof_shape(common, len(outers[0].public_inputs))
    bad = copy.deepcopy(outers[0])
    bad.public_inputs[2] = (bad.public_inputs[2] + 1) % gl.P
    batch = load_plonk_proofs(list(outers) + [bad], shape, vd)
    vf = smart_jit(build_plonk_verifier(common, vd))
    verdict = np.asarray(vf(batch))
    assert verdict.tolist() == [True] * len(outers) + [False]
