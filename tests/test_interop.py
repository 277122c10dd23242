"""External proof interop: plonky2 serde-JSON layout (interop.py) round-trips
through the refimpl containers and verifies, for both STARK and PLONK proofs,
and the documented schema shape is pinned so drift from plonky2's serde
output fails loudly.  This is the executor analog of the reference loading
native plonky2 proof structs (verifier/src/witness/mod.rs:236-294)."""

import json

from halo2_plonky2_verifier_tpu.interop import (
    plonk_proof_from_plonky2_json, plonk_proof_to_plonky2_json,
    stark_proof_from_plonky2_json, stark_proof_to_plonky2_json)
from halo2_plonky2_verifier_tpu.refimpl import verifier as ref_verifier
from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof


def test_stark_plonky2_json_roundtrip():
    stark, config, pwp = get_fibonacci_proof(32)
    s = stark_proof_to_plonky2_json(pwp)
    back = stark_proof_from_plonky2_json(s)
    assert back == pwp                      # dataclass equality, full tree
    ref_verifier.verify(stark, back, config)


import functools


@functools.lru_cache(maxsize=1)
def _small_stark_proof():
    """n=32 with a (2,2) fold strategy so the proof HAS FriQueryStep nodes
    (standard_fast on n=2^5 folds zero times)."""
    from halo2_plonky2_verifier_tpu.models.fibonacci import FibonacciStark
    from halo2_plonky2_verifier_tpu.refimpl import field as gl
    from halo2_plonky2_verifier_tpu.refimpl import prover
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import (
        fibonacci_public_inputs)
    from halo2_plonky2_verifier_tpu.utils.config import FriConfig, StarkConfig

    config = StarkConfig(fri_config=FriConfig(
        rate_bits=1, cap_height=1, proof_of_work_bits=8,
        reduction_strategy=(2, 2), num_query_rounds=4))
    stark = FibonacciStark(32)
    pis = fibonacci_public_inputs(32)
    trace = stark.generate_trace(pis[0], pis[1], gl.P)
    return stark, config, prover.prove(stark, config, trace, pis)


def test_stark_plonky2_json_schema_shape():
    """Pin the serde field layout: HashOut as {"elements": [..4]}, MerkleCap
    as a plain array, PolynomialCoeffs as {"coeffs": [...]}, evals_proofs as
    (evals, proof) pairs, extension elements as [a0, a1]."""
    _, _, pwp = _small_stark_proof()
    assert pwp.proof.opening_proof.query_round_proofs[0].steps, \
        "schema test needs a proof with fold steps"
    doc = json.loads(stark_proof_to_plonky2_json(pwp))
    assert set(doc) == {"proof", "public_inputs"}
    p = doc["proof"]
    assert set(p) == {"trace_cap", "permutation_zs_cap", "quotient_polys_cap",
                      "openings", "opening_proof"}
    h = p["trace_cap"][0]
    assert set(h) == {"elements"} and len(h["elements"]) == 4
    assert all(isinstance(x, int) for x in h["elements"])
    o = p["openings"]
    assert set(o) == {"local_values", "next_values", "permutation_zs",
                      "permutation_zs_next", "quotient_polys"}
    e = o["local_values"][0]
    assert isinstance(e, list) and len(e) == 2
    op = p["opening_proof"]
    assert set(op) == {"commit_phase_merkle_caps", "query_round_proofs",
                       "final_poly", "pow_witness"}
    assert set(op["final_poly"]) == {"coeffs"}
    qr = op["query_round_proofs"][0]
    assert set(qr) == {"initial_trees_proof", "steps"}
    ep = qr["initial_trees_proof"]["evals_proofs"][0]
    assert len(ep) == 2 and set(ep[1]) == {"siblings"}
    st = qr["steps"][0]
    assert set(st) == {"evals", "merkle_proof"}


def test_plonk_plonky2_json_roundtrip():
    from halo2_plonky2_verifier_tpu.refimpl.plonk import prove, verify
    from halo2_plonky2_verifier_tpu.refimpl.plonk.circuit import (
        CircuitBuilder, CircuitConfig)
    from halo2_plonky2_verifier_tpu.utils.config import FriConfig

    cfg = CircuitConfig(fri_config=FriConfig(
        rate_bits=1, cap_height=1, proof_of_work_bits=8,
        reduction_strategy=(2, 2), num_query_rounds=4))
    b = CircuitBuilder(cfg)
    a, x = b.add_input(), b.add_input()
    y = b.mul(b.add(a, x), x)
    for t in (a, x, y):
        b.register_public_input(t)
    common, pd, vd, builder = b.build()
    pwp = prove(common, pd, builder, {a: 3, x: 5})

    s = plonk_proof_to_plonky2_json(pwp)
    back = plonk_proof_from_plonky2_json(s)
    assert back == pwp
    verify(common, vd, back)
    doc = json.loads(s)
    assert set(doc["proof"]) == {"wires_cap", "plonk_zs_partial_products_cap",
                                 "quotient_polys_cap", "openings",
                                 "opening_proof"}
    assert set(doc["proof"]["openings"]) == {
        "constants", "plonk_sigmas", "wires", "plonk_zs", "plonk_zs_next",
        "partial_products", "quotient_polys", "lookup_zs", "lookup_zs_next"}


def test_external_proof_enters_tpu_pipeline():
    """A proof that exists ONLY as plonky2-format JSON loads into the batched
    TPU verifier and verifies; a tampered one is rejected."""
    import numpy as np

    from halo2_plonky2_verifier_tpu import (build_verifier, load_proofs,
                                            proof_shape)
    from halo2_plonky2_verifier_tpu.refimpl import field as gl
    from halo2_plonky2_verifier_tpu.utils.compile import smart_jit

    stark, config, pwp = _small_stark_proof()
    wire = stark_proof_to_plonky2_json(pwp)         # the external format

    good = stark_proof_from_plonky2_json(wire)
    bad_doc = json.loads(wire)
    bad_doc["public_inputs"][2] = (bad_doc["public_inputs"][2] + 1) % gl.P
    bad = stark_proof_from_plonky2_json(json.dumps(bad_doc))

    degree_bits = good.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits)
    batch = load_proofs([good, bad, good], shape)
    verify = smart_jit(build_verifier(stark, config, degree_bits))
    assert np.asarray(verify(batch)).tolist() == [True, False, True]
