"""TPU-lane PLONK verifier vs refimpl: batched verification + tamper lanes.

Differential closure of the PLONK chain: refimpl prover -> refimpl verifier
(tests/test_plonk.py) -> JAX verifier (this file), mirroring the STARK chain.
"""

import copy

import numpy as np

from halo2_plonky2_verifier_tpu.plonk import (
    build_plonk_verifier, load_plonk_proofs, plonk_proof_shape)
from halo2_plonky2_verifier_tpu.refimpl import field as gl
from halo2_plonky2_verifier_tpu.refimpl.plonk import prove, verify
from halo2_plonky2_verifier_tpu.refimpl.plonk.circuit import (
    CircuitBuilder, CircuitConfig)
from halo2_plonky2_verifier_tpu.utils.compile import smart_jit
from halo2_plonky2_verifier_tpu.utils.config import FriConfig

from test_plonk import build_fib_circuit, small_fri


def _setup(num_queries=4):
    cfg = CircuitConfig(fri_config=small_fri(num_queries))
    b, (a, x) = build_fib_circuit(cfg)
    common, prover_data, verifier_data, builder = b.build()
    proofs = [prove(common, prover_data, builder, {a: i + 1, x: 2 * i + 1})
              for i in range(3)]
    for p in proofs:
        verify(common, verifier_data, p)
    return common, verifier_data, proofs


def test_jax_plonk_verifier_accepts_and_rejects():
    common, vd, proofs = _setup()
    shape = plonk_proof_shape(common, len(proofs[0].public_inputs))

    bad_pi = copy.deepcopy(proofs[0])
    bad_pi.public_inputs[2] = (bad_pi.public_inputs[2] + 1) % gl.P
    bad_wire = copy.deepcopy(proofs[1])
    bad_wire.proof.openings.wires[3] = (
        (bad_wire.proof.openings.wires[3][0] + 1) % gl.P,
        bad_wire.proof.openings.wires[3][1])
    bad_sib = copy.deepcopy(proofs[2])
    bad_sib.proof.opening_proof.query_round_proofs[1] \
        .initial_trees_proof.evals_proofs[2][1].siblings[0] = [9, 9, 9, 9]

    batch = load_plonk_proofs(
        proofs + [bad_pi, bad_wire, bad_sib], shape, vd)
    vf = smart_jit(build_plonk_verifier(common, vd))
    verdict = np.asarray(vf(batch))
    assert verdict.tolist() == [True, True, True, False, False, False]


def test_jax_plonk_multi_selector_groups():
    cfg = CircuitConfig(max_quotient_degree_factor=4,
                        fri_config=small_fri(3))
    b, (a, x) = build_fib_circuit(cfg)
    common, prover_data, verifier_data, builder = b.build()
    assert common.num_selectors > 1
    pwp = prove(common, prover_data, builder, {a: 3, x: 4})
    shape = plonk_proof_shape(common, len(pwp.public_inputs))
    batch = load_plonk_proofs([pwp], shape, verifier_data)
    vf = smart_jit(build_plonk_verifier(common, verifier_data))
    assert np.asarray(vf(batch)).tolist() == [True]
