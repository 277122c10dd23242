"""plonky2 PLONK protocol tests (refimpl): prove/verify cycle, selector
groups, partial products, JSON round-trip, tamper rejection.

This covers the reference's WIP roadmap item "PLONK verification"
(/root/reference/README.md:5-12) in the strong sense: plonky2-format proofs
(gates + selector filters, copy constraints via sigmas/k_is, partial-product
Z checks, 4-oracle FRI instance)."""

import copy

import pytest

from halo2_plonky2_verifier_tpu.refimpl import field as gl
from halo2_plonky2_verifier_tpu.refimpl.plonk import (
    CircuitBuilder, CircuitConfig, PlonkProofWithPublicInputs,
    plonk_proof_from_json, plonk_proof_to_json, prove, verify)
from halo2_plonky2_verifier_tpu.refimpl.plonk.verifier import VerificationError
from halo2_plonky2_verifier_tpu.utils.config import FriConfig


def small_fri(q=8):
    return FriConfig(rate_bits=1, cap_height=1, proof_of_work_bits=8,
                     reduction_strategy=(2, 2), num_query_rounds=q)


def build_fib_circuit(cfg, steps=6):
    """a, x public; iterate x, a+x; plus a mul and a full arithmetic op."""
    b = CircuitBuilder(cfg)
    a = b.add_input()
    x = b.add_input()
    b.register_public_input(a)
    b.register_public_input(x)
    cur, prev = x, a
    for _ in range(steps):
        cur, prev = b.add(cur, prev), cur
    y = b.mul(cur, cur)
    z = b.arithmetic(3, 5, y, b.constant(2), cur)
    b.register_public_input(z)
    return b, (a, x)


def _prove(cfg=None, steps=6, inputs=(1, 1)):
    cfg = cfg or CircuitConfig(fri_config=small_fri())
    b, (a, x) = build_fib_circuit(cfg, steps)
    common, prover_data, verifier_data, builder = b.build()
    pwp = prove(common, prover_data, builder, {a: inputs[0], x: inputs[1]})
    return common, verifier_data, pwp


def test_plonk_prove_verify_roundtrip():
    common, vd, pwp = _prove()
    verify(common, vd, pwp)
    s = plonk_proof_to_json(pwp)
    rt = plonk_proof_from_json(s)
    verify(common, vd, rt)
    assert plonk_proof_to_json(rt) == s


def test_plonk_partial_products_exercised():
    common, vd, pwp = _prove()
    # num_routed_wires=16, chunk=8 -> exactly one stored partial product
    assert common.num_partial_products == 1
    assert len(pwp.proof.openings.partial_products) == 2  # x num_challenges
    verify(common, vd, pwp)


def test_plonk_multiple_selector_groups():
    """max_quotient_degree_factor=4 splits the gate list into several selector
    groups (UNUSED factor in filters) and yields 3 partial products."""
    cfg = CircuitConfig(max_quotient_degree_factor=4,
                        fri_config=small_fri())
    common, vd, pwp = _prove(cfg)
    assert common.num_selectors > 1
    assert common.num_partial_products == 3
    verify(common, vd, pwp)


def test_plonk_public_input_binding():
    common, vd, pwp = _prove(inputs=(2, 5))
    verify(common, vd, pwp)
    bad = copy.deepcopy(pwp)
    bad.public_inputs[2] = (bad.public_inputs[2] + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(common, vd, bad)


TAMPERS = {
    "wire_opening": lambda t: t.proof.openings.wires.__setitem__(0, (1, 1)),
    "sigma_opening": lambda t: t.proof.openings.plonk_sigmas.__setitem__(0, (1, 1)),
    "constant_opening": lambda t: t.proof.openings.constants.__setitem__(0, (1, 1)),
    "z_opening": lambda t: t.proof.openings.plonk_zs.__setitem__(0, (1, 1)),
    "z_next_opening": lambda t: t.proof.openings.plonk_zs_next.__setitem__(0, (1, 1)),
    "partial_product": lambda t: t.proof.openings.partial_products.__setitem__(0, (1, 1)),
    "quotient_opening": lambda t: t.proof.openings.quotient_polys.__setitem__(0, (1, 1)),
    "wires_cap": lambda t: t.proof.wires_cap.__setitem__(
        0, [(x + 1) % gl.P for x in t.proof.wires_cap[0]]),
    "zs_pp_cap": lambda t: t.proof.plonk_zs_partial_products_cap.__setitem__(
        0, [(x + 1) % gl.P for x in t.proof.plonk_zs_partial_products_cap[0]]),
    "pow_witness": lambda t: setattr(
        t.proof.opening_proof, "pow_witness",
        (t.proof.opening_proof.pow_witness + 1) % gl.P),
    "final_poly": lambda t: t.proof.opening_proof.final_poly.__setitem__(
        0, ((t.proof.opening_proof.final_poly[0][0] + 1) % gl.P,
            t.proof.opening_proof.final_poly[0][1])),
    "initial_sibling": lambda t: t.proof.opening_proof.query_round_proofs[0]
        .initial_trees_proof.evals_proofs[0][1].siblings.__setitem__(
            0, [1, 2, 3, 4]),
    "step_sibling": lambda t: t.proof.opening_proof.query_round_proofs[0]
        .steps[0].merkle_proof.siblings.__setitem__(0, [1, 2, 3, 4]),
}


@pytest.mark.parametrize("name", sorted(TAMPERS))
def test_plonk_tamper_rejection(name):
    common, vd, pwp = _prove()
    t = copy.deepcopy(pwp)
    TAMPERS[name](t)
    with pytest.raises(VerificationError):
        verify(common, vd, t)


def test_plonk_wrong_circuit_rejected():
    """A proof for one circuit must not verify against another circuit's
    verifier data (circuit digest + constants_sigmas cap binding)."""
    common1, vd1, pwp1 = _prove(steps=6)
    common2, vd2, _ = _prove(steps=7)
    with pytest.raises(VerificationError):
        verify(common2, vd2, pwp1)
