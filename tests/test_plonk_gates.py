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


# ----------------------------------------------------------------------------
# Extension-algebra gates + RandomAccessGate
# ----------------------------------------------------------------------------

def build_ext_ra_circuit(cfg):
    """out = a * b + c over GF(p^2) (MulExtensionGate +
    ArithmeticExtensionGate) and picked = items[idx] (RandomAccessGate);
    everything public."""
    b = CircuitBuilder(cfg)
    a = (b.add_input(), b.add_input())
    bb = (b.add_input(), b.add_input())
    c = (b.add_input(), b.add_input())
    s = b.add_extension(b.mul_extension(a, bb), c)
    idx = b.add_input()
    items = [b.constant(v) for v in (11, 22, 33, 44, 55)]
    picked = b.random_access(idx, items)
    for t in (*a, *bb, *c, *s, picked, idx):
        b.register_public_input(t)
    return b, (a, bb, c, idx)


def _setup_ext(num_queries=4):
    cfg = CircuitConfig(fri_config=small_fri(num_queries))
    b, ins = build_ext_ra_circuit(cfg)
    common, prover_data, verifier_data, builder = b.build()
    return common, prover_data, verifier_data, builder, ins


def _ext_inputs(av, bv, cv, iv, ins):
    a, bb, c, idx = ins
    return {a[0]: av[0], a[1]: av[1], bb[0]: bv[0], bb[1]: bv[1],
            c[0]: cv[0], c[1]: cv[1], idx: iv}


def test_extension_gates_refimpl():
    common, pd, vd, builder, ins = _setup_ext()
    ids = [g.id() for g in common.gates]
    assert any("ArithmeticExtensionGate" in i for i in ids)
    assert any("MulExtensionGate" in i for i in ids)
    assert any("RandomAccessGate" in i for i in ids)
    items = (11, 22, 33, 44, 55)
    for av, bv, cv, iv in (((3, 5), (7, 9), (100, 200), 3),
                           ((0, 1), (0, 1), (0, 0), 0),
                           ((gl.P - 1, 2), (5, gl.P - 3), (1, 1), 4)):
        pwp = prove(common, pd, builder, _ext_inputs(av, bv, cv, iv, ins))
        exp = gl.ext_add(gl.ext_mul(av, bv), cv)
        assert (pwp.public_inputs[6], pwp.public_inputs[7]) == exp
        assert pwp.public_inputs[8] == items[iv]
        verify(common, vd, pwp)

    # tampered random-access result must be rejected
    pwp = prove(common, pd, builder, _ext_inputs((3, 5), (7, 9), (1, 2), 2, ins))
    bad = copy.deepcopy(pwp)
    bad.public_inputs[8] = items[3]
    with pytest.raises(VerificationError):
        verify(common, vd, bad)


def test_random_access_index_range():
    """The witness generator must refuse an out-of-range access index (the
    in-circuit defense is the bit recomposition + booleanity constraints)."""
    common, pd, vd, builder, ins = _setup_ext()
    with pytest.raises(AssertionError):
        prove(common, pd, builder, _ext_inputs((1, 1), (1, 1), (0, 0), 8, ins))


def test_extension_gates_jax():
    common, pd, vd, builder, ins = _setup_ext()
    proofs = [prove(common, pd, builder, _ext_inputs(av, bv, cv, iv, ins))
              for av, bv, cv, iv in (((3, 5), (7, 9), (100, 200), 3),
                                     ((2, 0), (0, 4), (9, 9), 1))]
    bad = copy.deepcopy(proofs[0])
    bad.public_inputs[6] = (bad.public_inputs[6] + 1) % gl.P

    shape = plonk_proof_shape(common, len(proofs[0].public_inputs))
    batch = load_plonk_proofs(proofs + [bad], shape, vd)
    vf = smart_jit(build_plonk_verifier(common, vd))
    assert np.asarray(vf(batch)).tolist() == [True, True, False]


# ----------------------------------------------------------------------------
# PoseidonGate (in-circuit Poseidon permutation / sponge)
# ----------------------------------------------------------------------------

from halo2_plonky2_verifier_tpu.refimpl import poseidon as pos


def _poseidon_cfg(num_queries=4):
    return CircuitConfig(num_wires=135, num_routed_wires=28,
                         fri_config=small_fri(num_queries))


def _setup_poseidon():
    b = CircuitBuilder(_poseidon_cfg())
    ins = [b.add_input() for _ in range(12)]
    swap = b.add_input()
    outs = b.permute_poseidon(ins, swap=swap)
    for t in ins + [swap] + outs:
        b.register_public_input(t)
    common, pd, vd, builder = b.build()
    return common, pd, vd, builder, (ins, swap)


def _permute_inputs(vals12, sw, ins, swap):
    m = {t: v for t, v in zip(ins, vals12)}
    m[swap] = sw
    return m


def test_poseidon_gate_refimpl():
    """In-circuit permutation == refimpl.poseidon.permute (which is itself
    KAT-pinned), for both swap polarities; tampered output rejected."""
    common, pd, vd, builder, (ins, swap) = _setup_poseidon()
    assert any("PoseidonGate" in g.id() for g in common.gates)
    g = next(g for g in common.gates if "PoseidonGate" in g.id())
    assert g.num_wires == 135 and g.num_constraints() == 123  # plonky2 parity
    vals12 = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    for sw in (0, 1):
        pwp = prove(common, pd, builder,
                    _permute_inputs(vals12, sw, ins, swap))
        st = list(vals12)
        if sw:
            for i in range(4):
                st[i], st[i + 4] = st[i + 4], st[i]
        assert pwp.public_inputs[13:25] == pos.permute(st)
        verify(common, vd, pwp)

    bad = copy.deepcopy(pwp)
    bad.public_inputs[13] = (bad.public_inputs[13] + 1) % gl.P
    with pytest.raises(VerificationError):
        verify(common, vd, bad)


def test_poseidon_gate_swap_booleanity():
    """A non-boolean swap wire must be refused by the witness generator (the
    in-circuit constraint is swap * (swap - 1) == 0)."""
    common, pd, vd, builder, (ins, swap) = _setup_poseidon()
    with pytest.raises(AssertionError):
        prove(common, pd, builder,
              _permute_inputs(list(range(12)), 2, ins, swap))


def test_poseidon_sponge_circuit():
    """hash_n_to_m_no_pad builder helper (2 chained PoseidonGates for a
    9-element input) == refimpl hash_no_pad."""
    b = CircuitBuilder(_poseidon_cfg())
    ins = [b.add_input() for _ in range(9)]
    digest = b.hash_n_to_m_no_pad(ins)
    for t in ins + digest:
        b.register_public_input(t)
    common, pd, vd, builder = b.build()
    assert sum(1 for gi, _ in common.gate_instances
               if "PoseidonGate" in common.gates[gi].id()) == 2
    vals = [11, 22, 33, 44, 55, 66, 77, 88, 99]
    pwp = prove(common, pd, builder, {t: v for t, v in zip(ins, vals)})
    from halo2_plonky2_verifier_tpu.refimpl.poseidon import hash_no_pad
    assert pwp.public_inputs[9:13] == hash_no_pad(vals)
    verify(common, vd, pwp)


def test_poseidon_gate_jax():
    """The batched TPU-lane verifier accepts PoseidonGate proofs and rejects
    a tampered one — the gate eval is F-generic, so the same definition
    drives the jnp path (mul_const_small keeps the MDS out of the unrolled
    modmul budget)."""
    common, pd, vd, builder, (ins, swap) = _setup_poseidon()
    vals12 = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    proofs = [prove(common, pd, builder,
                    _permute_inputs(vals12, sw, ins, swap)) for sw in (0, 1)]
    bad = copy.deepcopy(proofs[0])
    bad.public_inputs[13] = (bad.public_inputs[13] + 1) % gl.P

    shape = plonk_proof_shape(common, len(proofs[0].public_inputs))
    batch = load_plonk_proofs(proofs + [bad], shape, vd)
    vf = smart_jit(build_plonk_verifier(common, vd))
    assert np.asarray(vf(batch)).tolist() == [True, True, False]


# ----------------------------------------------------------------------------
# Recursion gate set: ReducingGate, ReducingExtensionGate, PoseidonMdsGate,
# CosetInterpolationGate — the four gates completing plonky2's
# standard_recursion gate mix (the reference's recursion target,
# /root/reference/verifier/src/test_util/fibonacci_stark.rs:210-232).
# ----------------------------------------------------------------------------

from halo2_plonky2_verifier_tpu.refimpl.plonk.gates import (
    CosetInterpolationGate, PoseidonMdsGate, ReducingExtensionGate,
    ReducingGate)


def _recursion_cfg(num_queries=4):
    """plonky2 standard_recursion_config geometry (135 wires / 80 routed)."""
    return CircuitConfig(num_wires=135, num_routed_wires=80,
                         fri_config=small_fri(num_queries))


REDUCE_BASE_TERMS = (5, 9, 13, 21, 2, 77)
REDUCE_EXT_TERMS = ((3, 1), (0, 4), (12, 12), (gl.P - 1, 6))
COSET_BITS = 4                      # 16-point coset = FRI arity-4 fold shape
COSET_POLY = tuple((7 * k + 3, 11 * k + 1) for k in range(1 << COSET_BITS))


def _coset_values(shift):
    """Evaluations of the COSET_POLY extension polynomial on shift * H."""
    g = gl.primitive_root_of_unity(COSET_BITS)
    vals = []
    for i in range(1 << COSET_BITS):
        x = gl.ext_from_base(shift * pow(g, i, gl.P) % gl.P)
        acc = gl.EXT_ZERO
        for c in reversed(COSET_POLY):
            acc = gl.ext_add(gl.ext_mul(acc, x), c)
        vals.append(acc)
    return vals


def _poly_eval_ext(x):
    acc = gl.EXT_ZERO
    for c in reversed(COSET_POLY):
        acc = gl.ext_add(gl.ext_mul(acc, x), c)
    return acc


def build_recursion_gates_circuit(cfg):
    """All four recursion gates fed from public inputs:
      red  = sum_i alpha^i * base_terms[i]          (ReducingGate)
      rede = sum_i alpha^i * ext_terms[i]           (ReducingExtensionGate)
      mds  = PoseidonMds(state of 12 ext elements built from alpha)
      interp = CosetInterpolationGate over a 16-point coset at point `pt`
    Public inputs: alpha (2), shift, pt (2), then red, rede, mds[0], interp
    (2 each)."""
    b = CircuitBuilder(cfg)
    alpha = (b.add_input(), b.add_input())
    shift = b.add_input()
    pt = (b.add_input(), b.add_input())
    for t in (*alpha, shift, *pt):
        b.register_public_input(t)

    red = b.reduce_with_powers(alpha, [b.constant(v) for v in REDUCE_BASE_TERMS])
    rede = b.reduce_with_powers_ext(
        alpha, [(b.constant(v0), b.constant(v1)) for v0, v1 in REDUCE_EXT_TERMS])

    state = [alpha] * 6 + [(alpha[1], alpha[0])] * 6
    mds = b.mds_permute_ext(state)

    values = [(b.add_input(), b.add_input()) for _ in range(1 << COSET_BITS)]
    interp = b.interpolate_coset(COSET_BITS, shift, values, pt)

    for t in (*red, *rede, *mds[0], *interp):
        b.register_public_input(t)
    return b, (alpha, shift, pt, values)


def _recursion_inputs(alpha_v, shift_v, pt_v, ins):
    alpha, shift, pt, values = ins
    m = {alpha[0]: alpha_v[0], alpha[1]: alpha_v[1], shift: shift_v,
         pt[0]: pt_v[0], pt[1]: pt_v[1]}
    for tgt, v in zip(values, _coset_values(shift_v)):
        m[tgt[0]] = v[0]
        m[tgt[1]] = v[1]
    return m


def _expected_recursion_outputs(alpha_v, shift_v, pt_v):
    red = gl.reduce_with_powers_ext(
        [gl.ext_from_base(v) for v in REDUCE_BASE_TERMS], alpha_v)
    rede = gl.reduce_with_powers_ext(list(REDUCE_EXT_TERMS), alpha_v)
    from halo2_plonky2_verifier_tpu.constants.poseidon_goldilocks import (
        MDS_MATRIX_CIRC, MDS_MATRIX_DIAG)
    state = [alpha_v] * 6 + [(alpha_v[1], alpha_v[0])] * 6
    mds0 = gl.EXT_ZERO
    for i in range(12):
        mds0 = gl.ext_add(mds0, gl.ext_scalar_mul(state[i % 12],
                                                  MDS_MATRIX_CIRC[i]))
    mds0 = gl.ext_add(mds0, gl.ext_scalar_mul(state[0], MDS_MATRIX_DIAG[0]))
    # interpolation of a degree-15 polynomial through 16 points is the
    # polynomial itself -> evaluating COSET_POLY at pt is an independent
    # expected value for the gate's output
    interp = _poly_eval_ext(pt_v)
    return red, rede, mds0, interp


def _setup_recursion():
    cfg = _recursion_cfg()
    b, ins = build_recursion_gates_circuit(cfg)
    common, pd, vd, builder = b.build()
    return common, pd, vd, builder, ins


def test_recursion_gates_refimpl():
    common, pd, vd, builder, ins = _setup_recursion()
    ids = [g.id() for g in common.gates]
    for want in ("ReducingGate", "ReducingExtensionGate", "PoseidonMdsGate",
                 "CosetInterpolationGate"):
        assert any(want in i for i in ids), f"{want} missing from {ids}"
    # plonky2 parity of the gate shapes
    cg = next(g for g in common.gates if isinstance(g, CosetInterpolationGate))
    assert cg.num_points == 16 and cg.num_intermediates == 2
    assert cg.num_constraints() == 12
    mg = next(g for g in common.gates if isinstance(g, PoseidonMdsGate))
    assert mg.num_wires == 48 and mg.num_constraints() == 24

    for alpha_v, shift_v, pt_v in (((3, 5), 7, (1000, 2000)),
                                   ((0, 1), 11, (5, 0)),
                                   ((gl.P - 2, 9), 13, (42, gl.P - 7))):
        pwp = prove(common, pd, builder,
                    _recursion_inputs(alpha_v, shift_v, pt_v, ins))
        red, rede, mds0, interp = _expected_recursion_outputs(
            alpha_v, shift_v, pt_v)
        got = pwp.public_inputs
        assert tuple(got[5:7]) == red
        assert tuple(got[7:9]) == rede
        assert tuple(got[9:11]) == mds0
        assert tuple(got[11:13]) == interp
        verify(common, vd, pwp)

    # tampering each gate's claimed output must be rejected
    pwp = prove(common, pd, builder, _recursion_inputs((3, 5), 7, (9, 9), ins))
    for pi_idx in (5, 7, 9, 11):
        bad = copy.deepcopy(pwp)
        bad.public_inputs[pi_idx] = (bad.public_inputs[pi_idx] + 1) % gl.P
        with pytest.raises(VerificationError):
            verify(common, vd, bad)


def test_reducing_gate_chunking():
    """More terms than one gate row holds must chain across rows with the
    accumulator threaded through old_acc."""
    cfg = CircuitConfig(num_wires=24, num_routed_wires=16,
                        fri_config=small_fri(4))
    b = CircuitBuilder(cfg)
    alpha = (b.add_input(), b.add_input())
    terms = [b.constant(3 * k + 1) for k in range(23)]
    out = b.reduce_with_powers(alpha, terms)
    for t in (*alpha, *out):
        b.register_public_input(t)
    common, pd, vd, builder = b.build()
    n_reducing = sum(1 for gi, _ in common.gate_instances
                     if isinstance(common.gates[gi], ReducingGate))
    assert n_reducing >= 2, "expected the reduction to span multiple rows"
    alpha_v = (17, 23)
    pwp = prove(common, pd, builder, {alpha[0]: 17, alpha[1]: 23})
    exp = gl.reduce_with_powers_ext(
        [gl.ext_from_base(3 * k + 1) for k in range(23)], alpha_v)
    assert tuple(pwp.public_inputs[2:4]) == exp
    verify(common, vd, pwp)


def test_recursion_gates_jax():
    """The batched TPU-lane verifier accepts recursion-gate proofs and
    rejects per-gate tampered ones (the gate evals are F-generic, so the
    same definitions drive the jnp extension lanes at zeta)."""
    common, pd, vd, builder, ins = _setup_recursion()
    proofs = [prove(common, pd, builder,
                    _recursion_inputs(av, sv, pv, ins))
              for av, sv, pv in (((3, 5), 7, (1000, 2000)),
                                 ((2, 0), 11, (5, 6)))]
    bads = []
    for pi_idx in (5, 7, 9, 11):     # red, rede, mds[0], interp outputs
        bad = copy.deepcopy(proofs[0])
        bad.public_inputs[pi_idx] = (bad.public_inputs[pi_idx] + 1) % gl.P
        bads.append(bad)

    shape = plonk_proof_shape(common, len(proofs[0].public_inputs))
    batch = load_plonk_proofs(proofs + bads, shape, vd)
    vf = smart_jit(build_plonk_verifier(common, vd))
    assert np.asarray(vf(batch)).tolist() == [True, True] + [False] * 4
