"""Extended PLONK gate set: BaseSumGate (range-checked decomposition) and
ExponentiationGate, through the full chain — refimpl prove/verify and the
batched JAX verifier with tamper lanes.  The gate `eval` definitions are
written against the abstract field ops F, so one definition drives the
prover grid (ints), the refimpl verifier at zeta (extension tuples), and
the TPU verifier (jnp lanes) — no JAX-side changes were needed for the new
gates."""

import copy

import numpy as np
import pytest

from halo2_plonky2_verifier_tpu.plonk import (
    build_plonk_verifier, load_plonk_proofs, plonk_proof_shape)
from halo2_plonky2_verifier_tpu.refimpl import field as gl
from halo2_plonky2_verifier_tpu.refimpl.plonk import prove, verify
from halo2_plonky2_verifier_tpu.refimpl.plonk.circuit import (
    CircuitBuilder, CircuitConfig)
from halo2_plonky2_verifier_tpu.refimpl.plonk.verifier import VerificationError
from halo2_plonky2_verifier_tpu.utils.compile import smart_jit

from test_plonk import small_fri

NUM_BITS = 6


def build_exp_circuit(cfg):
    """out = base ^ e (e range-checked to NUM_BITS bits), all public."""
    b = CircuitBuilder(cfg)
    base = b.add_input()
    e = b.add_input()
    out = b.exp(base, e, NUM_BITS)
    b.register_public_input(base)
    b.register_public_input(e)
    b.register_public_input(out)
    return b, (base, e)


def _setup(num_queries=4):
    cfg = CircuitConfig(fri_config=small_fri(num_queries))
    b, (base, e) = build_exp_circuit(cfg)
    common, prover_data, verifier_data, builder = b.build()
    return common, prover_data, verifier_data, builder, (base, e)


def test_exponentiation_gate_refimpl():
    common, pd, vd, builder, (base, e) = _setup()
    assert any("ExponentiationGate" in g.id() for g in common.gates)
    assert any("BaseSumGate" in g.id() for g in common.gates)
    for bv, ev in ((3, 45), (7, 0), (2, 63)):
        pwp = prove(common, pd, builder, {base: bv, e: ev})
        assert pwp.public_inputs[2] == pow(bv, ev, gl.P)
        verify(common, vd, pwp)

    # wrong claimed output must be rejected
    pwp = prove(common, pd, builder, {base: 3, e: 45})
    bad = copy.deepcopy(pwp)
    bad.public_inputs[2] = (bad.public_inputs[2] + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(common, vd, bad)


def test_base_sum_range_check():
    """The BaseSumGate witness generator must refuse values outside the
    declared bit width (the in-circuit constraint a malicious prover would
    have to break is the limb booleanity product)."""
    common, pd, vd, builder, (base, e) = _setup()
    with pytest.raises(AssertionError):
        prove(common, pd, builder, {base: 2, e: 1 << NUM_BITS})


def test_exponentiation_gate_jax():
    common, pd, vd, builder, (base, e) = _setup()
    proofs = [prove(common, pd, builder, {base: bv, e: ev})
              for bv, ev in ((3, 45), (2, 63), (11, 1))]
    bad = copy.deepcopy(proofs[0])
    bad.public_inputs[2] = (bad.public_inputs[2] + 1) % gl.P

    shape = plonk_proof_shape(common, len(proofs[0].public_inputs))
    batch = load_plonk_proofs(proofs + [bad], shape, vd)
    vf = smart_jit(build_plonk_verifier(common, vd))
    assert np.asarray(vf(batch)).tolist() == [True, True, True, False]
