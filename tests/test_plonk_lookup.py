"""plonky2-style lookup argument (logUp): prover <-> refimpl verifier <->
batched TPU verifier chain, with per-surface tamper rejection.

Covers the post-1.0 plonky2 lookup feature in role (LookupGate /
LookupTableGate / lookup Z polynomials committed with the partial products;
see refimpl/plonk/vanishing.py for the exact argument)."""

import copy

import numpy as np
import pytest

from halo2_plonky2_verifier_tpu.refimpl import field as gl_int
from halo2_plonky2_verifier_tpu.refimpl.plonk import (CircuitBuilder,
                                                      CircuitConfig)
from halo2_plonky2_verifier_tpu.refimpl.plonk.prover import prove
from halo2_plonky2_verifier_tpu.refimpl.plonk.verifier import (
    VerificationError, verify)
from halo2_plonky2_verifier_tpu.utils.config import FriConfig


def _small_cfg():
    return CircuitConfig(fri_config=FriConfig(
        rate_bits=1, cap_height=1, proof_of_work_bits=8,
        reduction_strategy=(2, 2), num_query_rounds=4))


def _build_lookup_circuit():
    """Two luts: a square table and a bit-flip table, multiple lookups
    (incl. repeats, which exercise multiplicities > 1)."""
    b = CircuitBuilder(_small_cfg())
    sq = b.add_lookup_table([(i, i * i) for i in range(16)])
    flip = b.add_lookup_table([(i, 15 - i) for i in range(16)])
    x = b.add_input()
    y = b.add_lookup(x, sq)           # x^2
    y2 = b.add_lookup(x, sq)          # repeat: multiplicity 2
    f = b.add_lookup(x, flip)         # 15 - x
    c = b.add_lookup(b.constant(7), sq)
    out = b.add(b.add(y, y2), b.add(f, c))
    b.register_public_input(out)
    common, pd, vd, builder = b.build()
    return common, pd, vd, builder, x


@pytest.fixture(scope="module")
def lookup_proof():
    common, pd, vd, builder, x = _build_lookup_circuit()
    pwp = prove(common, pd, builder, {x: 5})
    return common, vd, pwp


def test_lookup_prove_verify(lookup_proof):
    common, vd, pwp = lookup_proof
    assert pwp.public_inputs == [25 + 25 + (15 - 5) + 49]
    verify(common, vd, pwp)
    assert common.num_lookup_polys == common.config.num_challenges * 2


def test_lookup_tamper_rejected(lookup_proof):
    common, vd, pwp = lookup_proof
    p = gl_int.P

    def tamper(mutate):
        bad = copy.deepcopy(pwp)
        mutate(bad)
        with pytest.raises(VerificationError):
            verify(common, vd, bad)

    # the lookup running sum itself
    tamper(lambda b: b.proof.openings.lookup_zs.__setitem__(
        0, ((b.proof.openings.lookup_zs[0][0] + 1) % p,
            b.proof.openings.lookup_zs[0][1])))
    tamper(lambda b: b.proof.openings.lookup_zs_next.__setitem__(
        1, ((b.proof.openings.lookup_zs_next[1][0] + 3) % p,
            b.proof.openings.lookup_zs_next[1][1])))
    # a multiplicity / looked-wire opening
    tamper(lambda b: b.proof.openings.wires.__setitem__(
        0, ((b.proof.openings.wires[0][0] + 2) % p,
            b.proof.openings.wires[0][1])))
    # the preprocessed lookup-selector opening (q_lookup column)
    sel = common.luts[0].sel_lk
    tamper(lambda b: b.proof.openings.constants.__setitem__(
        sel, ((b.proof.openings.constants[sel][0] + 1) % p,
              b.proof.openings.constants[sel][1])))
    # a claimed public input downstream of a lookup output
    tamper(lambda b: b.__setattr__(
        "public_inputs", [(b.public_inputs[0] + 1) % p]))


def test_lookup_abandoned_row_padded():
    """Regression (ADVICE r4): a LookupGate row abandoned by add_lookup's
    row-ordering re-allocation must have its unused slots aliased to slot 0
    at abandonment time.  With a table lacking input 0, an unpadded slot
    defaults to witness 0 and LookupGate.fill crashes during proving."""
    b = CircuitBuilder(_small_cfg())
    sq = b.add_lookup_table([(i, i * i) for i in range(1, 17)])  # no input 0
    x = b.add_input()
    y = b.add_lookup(x, sq)     # slot row with free slots remaining
    z = b.add(y, y)             # produced on a later row
    w = b.add_lookup(z, sq)     # inp row > slot row: first row abandoned
    out = b.add(w, y)
    b.register_public_input(out)
    common, pd, vd, builder = b.build()
    pwp = prove(common, pd, builder, {x: 2})    # y=4, z=8, w=64
    assert pwp.public_inputs == [68]
    verify(common, vd, pwp)


def test_lookup_value_not_in_table_unprovable():
    common, pd, vd, builder, x = _build_lookup_circuit()
    with pytest.raises(AssertionError):
        prove(common, pd, builder, {x: 99})   # 99 not in the tables


def test_lookup_tpu_batch_verifies(lookup_proof):
    from halo2_plonky2_verifier_tpu.plonk import (build_plonk_verifier,
                                                  load_plonk_proofs,
                                                  plonk_proof_shape)
    from halo2_plonky2_verifier_tpu.utils.compile import smart_jit

    common, vd, pwp = lookup_proof
    # a second, different witness for a genuine batch
    common2, pd2, vd2, builder2, x2 = _build_lookup_circuit()
    pwp2 = prove(common2, pd2, builder2, {x2: 11})

    shape = plonk_proof_shape(common, len(pwp.public_inputs))
    assert shape.num_lookup_polys == common.num_lookup_polys
    batch = load_plonk_proofs([pwp, pwp2, pwp], shape, vd)
    verify_fn = smart_jit(build_plonk_verifier(common, vd))
    verdict = np.asarray(verify_fn(batch))
    assert verdict.tolist() == [True, True, True]

    # tamper one lane's lookup_zs: only that lane flips
    bad = copy.deepcopy(pwp2)
    bad.proof.openings.lookup_zs[0] = (
        (bad.proof.openings.lookup_zs[0][0] + 1) % gl_int.P,
        bad.proof.openings.lookup_zs[0][1])
    batch_bad = load_plonk_proofs([pwp, bad, pwp], shape, vd)
    verdict = np.asarray(verify_fn(batch_bad))
    assert verdict.tolist() == [True, False, True]


def test_lookup_json_roundtrip(lookup_proof):
    from halo2_plonky2_verifier_tpu.refimpl.plonk.proof import (
        plonk_proof_from_json, plonk_proof_to_json)

    common, vd, pwp = lookup_proof
    rt = plonk_proof_from_json(plonk_proof_to_json(pwp))
    assert rt.proof.openings.lookup_zs == pwp.proof.openings.lookup_zs
    assert rt.proof.openings.lookup_zs_next == pwp.proof.openings.lookup_zs_next
    verify(common, vd, rt)
