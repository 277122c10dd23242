"""In-circuit STARK/FRI verifier — the plonky2 recursion workload.

Builds a PLONK circuit (CircuitBuilder) that verifies a starky STARK proof
IN-CIRCUIT:

  - in-circuit Fiat-Shamir challenger: a PoseidonGate duplex sponge with the
    exact clear-on-observe / LIFO-pop semantics of the reference transcript
    (verifier/src/challenger/mod.rs:45-108);
  - Merkle cap path checks: PoseidonGate two_to_one with the swap wire for
    index-bit child ordering, BaseSumGate index-bit decomposition, and
    RandomAccessGate cap selection (verifier/src/merkle/mod.rs:57-78);
  - the vanishing-polynomial / quotient consistency check at zeta (the
    check the reference sketches at verifier/src/stark/mod.rs:202-321),
    including the permutation argument;
  - FRI: the proof-of-work range check (fri/mod.rs:131-145), per-batch
    reduced openings and initial-opening quotients through ReducingGate /
    ReducingExtensionGate rows, per-step CosetInterpolationGate arity folds
    (fri/mod.rs:286-322), and the final-poly Horner evaluation.

This is the executor analog of the reference's north star
(test_recursive_stark_verifier,
/root/reference/verifier/src/test_util/fibonacci_stark.rs:210-232): a
circuit whose gate types run at the frequencies and compositions of
plonky2's own recursive verifier.  Verification semantics mirror
refimpl/verifier.py step for step; equality checks become copy constraints
(`connect`), and out-of-circuit inverses become `hint_input` wires bound by
product constraints — exactly the reference's hint-then-constrain pattern
(verifier/src/field/goldilocks/base.rs:347-368, extension.rs:321-340).

The inner proof is pure witness: proving the outer circuit is possible
exactly when the prover holds a valid inner proof whose public inputs match
the outer circuit's public inputs (they are registered as such).
"""

from ...models.base import ConstraintConsumer
from ...utils.config import FriConfig, StarkConfig
from .. import fft, field as gl
from ..poseidon import SPONGE_RATE, SPONGE_WIDTH
from ..prover import fri_instance_batches, get_permutation_batches
from .circuit import CircuitBuilder, CircuitConfig


def standard_recursion_config():
    """plonky2 CircuitConfig::standard_recursion_config geometry."""
    return CircuitConfig(
        num_wires=135, num_routed_wires=80,
        fri_config=FriConfig(rate_bits=3, cap_height=4,
                             proof_of_work_bits=16,
                             reduction_strategy=(4, 5),
                             num_query_rounds=28))


# ----------------------------------------------------------------------------
# Structure walk: allocate proof targets / zip witness values
# ----------------------------------------------------------------------------

def _map_proof(pwp, visit):
    """Walk every scalar of a StarkProofWithPublicInputs(-of-targets) in a
    fixed order, applying `visit` to each scalar; returns the mapped
    structure (same dataclasses).  Used twice with the SAME walk order: once
    to allocate input targets, once to collect witness values."""
    from ..proof import (FriInitialTreeProof, FriProof, FriQueryRound,
                         FriQueryStep, MerkleProof, StarkOpeningSet,
                         StarkProof, StarkProofWithPublicInputs)

    def ext(e):
        return (visit(e[0]), visit(e[1]))

    def exts(es):
        return None if es is None else [ext(e) for e in es]

    def hsh(h):
        return [visit(x) for x in h]

    def cap(c):
        return None if c is None else [hsh(h) for h in c]

    def mproof(m):
        return MerkleProof(siblings=[hsh(s) for s in m.siblings])

    p = pwp.proof
    fri = p.opening_proof
    openings = StarkOpeningSet(
        local_values=exts(p.openings.local_values),
        next_values=exts(p.openings.next_values),
        permutation_zs=exts(p.openings.permutation_zs),
        permutation_zs_next=exts(p.openings.permutation_zs_next),
        quotient_polys=exts(p.openings.quotient_polys),
    )
    fri_t = FriProof(
        commit_phase_merkle_caps=[cap(c) for c in fri.commit_phase_merkle_caps],
        query_round_proofs=[
            FriQueryRound(
                initial_trees_proof=FriInitialTreeProof(evals_proofs=[
                    ([visit(x) for x in evals], mproof(mp))
                    for (evals, mp) in qr.initial_trees_proof.evals_proofs]),
                steps=[
                    FriQueryStep(evals=exts(st.evals),
                                 merkle_proof=mproof(st.merkle_proof))
                    for st in qr.steps])
            for qr in fri.query_round_proofs],
        final_poly=exts(fri.final_poly),
        pow_witness=visit(fri.pow_witness),
    )
    return StarkProofWithPublicInputs(
        proof=StarkProof(
            trace_cap=cap(p.trace_cap),
            permutation_zs_cap=cap(p.permutation_zs_cap),
            quotient_polys_cap=cap(p.quotient_polys_cap),
            openings=openings,
            opening_proof=fri_t,
        ),
        public_inputs=[visit(x) for x in pwp.public_inputs],
    )


def recursive_witness(proof_targets, pwp):
    """{input target: value} for proving the outer circuit on `pwp` (any
    proof of the same shape as the template the circuit was built from)."""
    targets, values = [], []
    _map_proof(proof_targets, targets.append)
    _map_proof(pwp, lambda v: values.append(int(v) % gl.P))
    assert len(targets) == len(values), "proof shape mismatch"
    return dict(zip(targets, values))


# ----------------------------------------------------------------------------
# Extension-field ops over target pairs (the F adapter for Stark.eval)
# ----------------------------------------------------------------------------

class ExtTargetOps:
    """GF(p^2) arithmetic over pairs of circuit targets — the in-circuit
    analog of GoldilocksQuadExtChip (extension.rs:43), and a Stark.eval /
    ConstraintConsumer F adapter."""

    def __init__(self, b: CircuitBuilder):
        self.b = b

    def zero(self):
        return self.b.zero_extension()

    def one(self):
        return (self.b.constant(1), self.b.constant(0))

    def from_base(self, x):
        return (self.b.constant(int(x) % gl.P), self.b.constant(0))

    def from_target(self, t):
        """Embed a base target as the extension element (t, 0)."""
        return (t, self.b.constant(0))

    def add(self, a, b):
        return self.b.add_extension(a, b)

    def sub(self, a, b):
        return self.b.sub_extension(a, b)

    def mul(self, a, b):
        return self.b.mul_extension(a, b)

    def scalar_mul(self, a, s):
        """a * s for a base TARGET s."""
        return self.b.mul_extension(a, (s, self.b.constant(0)))

    def scalar_mul_const(self, a, c):
        """a * c for a host-int constant c."""
        one = self.b.constant(1)
        return self.b.arithmetic_extension(
            c % gl.P, 0, a, (one, self.b.constant(0)), self.zero())

    def inv(self, a):
        """Extension inverse by hint + product constraint (the reference's
        pattern at extension.rs:321-340)."""
        h0 = self.b.hint_input(
            lambda x0, x1: gl.ext_inv((x0, x1))[0], [a[0], a[1]])
        h1 = self.b.hint_input(
            lambda x0, x1: gl.ext_inv((x0, x1))[1], [a[0], a[1]])
        prod = self.mul(a, (h0, h1))
        self.connect(prod, self.one())
        return (h0, h1)

    def exp_power_of_2(self, a, k):
        for _ in range(k):
            a = self.mul(a, a)
        return a

    def exp_const(self, a, e):
        """a^e for a host-int exponent (square-and-multiply)."""
        result = None
        base = a
        e = int(e)
        while e:
            if e & 1:
                result = base if result is None else self.mul(result, base)
            e >>= 1
            if e:
                base = self.mul(base, base)
        return result if result is not None else self.one()

    def connect(self, a, b):
        self.b.connect(a[0], b[0])
        self.b.connect(a[1], b[1])


# ----------------------------------------------------------------------------
# In-circuit duplex-sponge challenger
# ----------------------------------------------------------------------------

class TargetChallenger:
    """refimpl.challenger.Challenger over targets: one PoseidonGate row per
    permutation; observe/squeeze control flow depends only on static shape
    counts, so the Python mirror traces a fixed circuit."""

    def __init__(self, b: CircuitBuilder):
        self.b = b
        zero = b.constant(0)
        self.sponge_state = [zero] * SPONGE_WIDTH
        self.input_buffer = []
        self.output_buffer = []

    def observe_element(self, t):
        self.output_buffer.clear()
        self.input_buffer.append(t)

    def observe_elements(self, ts):
        for t in ts:
            self.observe_element(t)

    def observe_hash(self, h):
        assert len(h) == 4
        self.observe_elements(h)

    def observe_cap(self, cap):
        for h in cap:
            self.observe_hash(h)

    def observe_extension_element(self, e):
        self.observe_elements([e[0], e[1]])

    def observe_extension_elements(self, es):
        for e in es:
            self.observe_extension_element(e)

    def _absorb_buffered_inputs(self):
        if not self.input_buffer:
            return
        for i in range(0, len(self.input_buffer), SPONGE_RATE):
            chunk = self.input_buffer[i:i + SPONGE_RATE]
            state = list(chunk) + self.sponge_state[len(chunk):]
            self.sponge_state = self.b.permute_poseidon(state)
        self.output_buffer = list(self.sponge_state[:SPONGE_RATE])
        self.input_buffer.clear()

    def get_challenge(self):
        self._absorb_buffered_inputs()
        if not self.output_buffer:
            self.sponge_state = self.b.permute_poseidon(self.sponge_state)
            self.output_buffer = list(self.sponge_state[:SPONGE_RATE])
        return self.output_buffer.pop()

    def get_n_challenges(self, n):
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self):
        c = self.get_n_challenges(2)
        return (c[0], c[1])


# ----------------------------------------------------------------------------
# In-circuit verification building blocks (mirror refimpl/verifier.py)
# ----------------------------------------------------------------------------

def _recompose_bits(b, bits):
    """sum_i bits[i] * 2^i as a target (bits LSB-first)."""
    if not bits:
        return b.constant(0)
    acc = bits[-1]
    for bit in reversed(bits[:-1]):
        acc = b.arithmetic(2, 1, acc, b.constant(1), bit)   # 2*acc + bit
    return acc


def _hash_or_noop_targets(b, leaf):
    """hash/mod.rs:109-119 over targets: noop (zero-pad to 4) iff len <= 4."""
    if len(leaf) <= 4:
        zero = b.constant(0)
        return list(leaf) + [zero] * (4 - len(leaf))
    return b.hash_n_to_m_no_pad(list(leaf), 4)


def _verify_merkle_circuit(b, leaf, index_bits, cap_t, siblings_t):
    """merkle/mod.rs:57-78 over targets: per level a PoseidonGate two_to_one
    with the swap wire doing the (node, sibling) ordering by index bit; the
    remaining index bits select the cap entry via RandomAccessGate rows."""
    node = _hash_or_noop_targets(b, leaf)
    zero = b.constant(0)
    assert len(index_bits) >= len(siblings_t)
    for sib, bit in zip(siblings_t, index_bits):
        state = list(node) + list(sib) + [zero] * 4
        node = b.permute_poseidon(state, swap=bit)[:4]
    rest = index_bits[len(siblings_t):]
    if rest and len(cap_t) > 1:
        cap_index = _recompose_bits(b, rest)
        for k in range(4):
            sel = b.random_access(cap_index, [h[k] for h in cap_t])
            b.connect(sel, node[k])
    else:
        for k in range(4):
            b.connect(cap_t[0][k], node[k])


def _get_stark_challenges_circuit(ch, proof_t, stark, config):
    """challenger/mod.rs:168-222 over targets (mirrors
    refimpl.verifier.get_stark_challenges)."""
    p = proof_t.proof
    ch.observe_cap(p.trace_cap)

    permutation_challenge_sets = None
    if p.permutation_zs_cap is not None:
        permutation_challenge_sets = [
            [(ch.get_challenge(), ch.get_challenge())
             for _ in range(config.num_challenges)]
            for _ in range(stark.permutation_batch_size())]
        ch.observe_cap(p.permutation_zs_cap)

    stark_alphas = ch.get_n_challenges(config.num_challenges)
    ch.observe_cap(p.quotient_polys_cap)
    stark_zeta = ch.get_extension_challenge()

    for batch in p.openings.to_fri_openings():
        ch.observe_extension_elements(batch)

    fri = p.opening_proof
    fri_alpha = ch.get_extension_challenge()
    fri_betas = []
    for cap in fri.commit_phase_merkle_caps:
        ch.observe_cap(cap)
        fri_betas.append(ch.get_extension_challenge())
    ch.observe_extension_elements(fri.final_poly)
    ch.observe_element(fri.pow_witness)
    fri_pow_response = ch.get_challenge()
    fri_query_indices = ch.get_n_challenges(
        config.fri_config.num_query_rounds)

    return {
        "permutation_challenge_sets": permutation_challenge_sets,
        "stark_alphas": stark_alphas,
        "stark_zeta": stark_zeta,
        "fri_alpha": fri_alpha,
        "fri_betas": fri_betas,
        "fri_pow_response": fri_pow_response,
        "fri_query_indices": fri_query_indices,
    }


def _eval_permutation_checks_circuit(E, local_values, local_zs, next_zs,
                                     batches, consumer):
    """refimpl.prover.eval_permutation_checks with (beta, gamma) as TARGETS
    (they come from the in-circuit challenger, not host ints)."""
    one = E.one()
    for z in local_zs:
        consumer.constraint_first_row(E.sub(z, one))
    for i, instances in enumerate(batches):
        red_l_prod = one
        red_r_prod = one
        for (pair, (beta, gamma)) in instances:
            red_l = E.from_target(gamma)
            red_r = red_l
            w = one
            for (lhs, rhs) in pair.column_pairs:
                red_l = E.add(red_l, E.mul(w, local_values[lhs]))
                red_r = E.add(red_r, E.mul(w, local_values[rhs]))
                w = E.mul(w, E.from_target(beta))
            red_l_prod = E.mul(red_l_prod, red_l)
            red_r_prod = E.mul(red_r_prod, red_r)
        consumer.constraint(E.sub(E.mul(next_zs[i], red_r_prod),
                                  E.mul(local_zs[i], red_l_prod)))


def _check_quotient_consistency_circuit(b, E, stark, config, proof_t,
                                        challenges, degree_bits):
    """vanishing(zeta) == Z_H(zeta) * quotient(zeta) per challenge — the
    reference's WIP extension (stark/mod.rs:202-321) in-circuit, mirroring
    refimpl.verifier.check_quotient_consistency."""
    openings = proof_t.proof.openings
    zeta = challenges["stark_zeta"]
    n = 1 << degree_bits
    g_sub = gl.primitive_root_of_unity(degree_bits)
    one = E.one()

    zeta_pow_n = E.exp_power_of_2(zeta, degree_bits)
    z_h_zeta = E.sub(zeta_pow_n, one)
    l0 = E.mul(z_h_zeta,
               E.inv(E.scalar_mul_const(E.sub(zeta, one), n)))
    llast = E.mul(z_h_zeta, E.inv(E.scalar_mul_const(
        E.sub(E.scalar_mul_const(zeta, g_sub), one), n)))
    z_last = E.sub(zeta, E.from_base(pow(g_sub, n - 1, gl.P)))

    alphas_ext = [E.from_target(a) for a in challenges["stark_alphas"]]
    consumer = ConstraintConsumer(E, alphas_ext, z_last, l0, llast)
    pis = [E.from_target(t) for t in proof_t.public_inputs]
    stark.eval(E, openings.local_values, openings.next_values, pis, consumer)

    if stark.uses_permutation_args():
        batches = get_permutation_batches(
            stark.permutation_pairs(),
            challenges["permutation_challenge_sets"],
            config.num_challenges, stark.permutation_batch_size())
        _eval_permutation_checks_circuit(
            E, openings.local_values, openings.permutation_zs,
            openings.permutation_zs_next, batches, consumer)

    factor = stark.quotient_degree_factor()
    for i, acc in enumerate(consumer.accumulators):
        chunk = openings.quotient_polys[i * factor:(i + 1) * factor]
        recombined = b.reduce_with_powers_ext(zeta_pow_n, chunk)
        E.connect(E.mul(z_h_zeta, recombined), acc)
    return zeta_pow_n


def _bit_weighted_power(b, bits, base_powers):
    """prod_j (bits[j] ? base_powers[j] : 1) — the in-circuit form of
    c^rev(index) etc.: per bit a degree-1 factor 1 + bit*(c - 1), chained
    multiplies."""
    one = b.constant(1)
    acc = one
    for bit, c in zip(bits, base_powers):
        f = b.arithmetic((c - 1) % gl.P, 1, bit, one, one)
        acc = b.mul(acc, f)
    return acc


def _combine_initial_circuit(b, E, batches_t, evals_proofs_t, alpha,
                             subgroup_x, reduced_openings):
    """fri/mod.rs:170-220 over targets: batched initial-opening quotients
    sum alpha^i (reduced_evals - reduced_openings) / (x - z)."""
    x_ext = E.from_target(subgroup_x)
    total = E.zero()
    for (point_t, polys), reduced_opening in zip(batches_t, reduced_openings):
        evals = [evals_proofs_t[oi][0][pi] for (oi, pi) in polys]
        reduced_evals = b.reduce_with_powers(alpha, evals)
        numerator = E.sub(reduced_evals, reduced_opening)
        denominator = E.sub(x_ext, point_t)
        alpha_shift = E.exp_const(alpha, len(evals))
        total = E.mul(alpha_shift, total)
        total = E.add(E.mul(numerator, E.inv(denominator)), total)
    return total


def _compute_evaluation_circuit(b, subgroup_x, within_bits, arity_bits,
                                evals_t, beta):
    """fri/mod.rs:286-322 over targets: bit-reverse the step evals (static
    reorder), build coset_start = x * g_inv^rev(within), interpolate via a
    CosetInterpolationGate and evaluate at beta."""
    arity = 1 << arity_bits
    g = gl.primitive_root_of_unity(arity_bits)
    g_inv = pow(g, arity - 1, gl.P)
    evals_brv = fft.reverse_index_bits(list(evals_t))
    # rev(within) bit j (LSB-first in `within`) carries weight
    # 2^(arity_bits-1-j), so g_inv^rev(within) is a per-bit product
    powers = [pow(g_inv, 1 << (arity_bits - 1 - j), gl.P)
              for j in range(arity_bits)]
    start = _bit_weighted_power(b, within_bits, powers)
    coset_start = b.mul(start, subgroup_x)
    return b.interpolate_coset(arity_bits, coset_start, evals_brv, beta)


def _verify_fri_proof_circuit(b, E, stark, config, proof_t, challenges,
                              degree_bits):
    """fri/mod.rs:447-502 over targets (mirrors
    refimpl.verifier.verify_fri_proof)."""
    fri_params = config.fri_params(degree_bits)
    fri_t = proof_t.proof.opening_proof
    n_log = fri_params.lde_bits
    assert fri_params.final_poly_len == len(fri_t.final_poly)
    assert config.fri_config.num_query_rounds == len(fri_t.query_round_proofs)

    # PoW: response < 2^(64 - proof_of_work_bits) via a BaseSumGate
    # decomposition that can only represent that range (fri/mod.rs:131-145)
    b.split_le(challenges["fri_pow_response"],
               64 - config.fri_config.proof_of_work_bits)

    alpha = challenges["fri_alpha"]
    openings_batches = proof_t.proof.openings.to_fri_openings()
    reduced_openings = [b.reduce_with_powers_ext(alpha, batch)
                        for batch in openings_batches]

    # instance batches: static poly layout + target opening points
    layout = fri_instance_batches(stark, config, gl.EXT_ONE,
                                  gl.primitive_root_of_unity(degree_bits))
    zeta = challenges["stark_zeta"]
    zeta_next = E.scalar_mul_const(
        zeta, gl.primitive_root_of_unity(degree_bits))
    batches_t = [(zeta, layout[0][1]), (zeta_next, layout[1][1])]

    caps = [proof_t.proof.trace_cap]
    if proof_t.proof.permutation_zs_cap is not None:
        caps.append(proof_t.proof.permutation_zs_cap)
    caps.append(proof_t.proof.quotient_polys_cap)

    phi = gl.primitive_root_of_unity(n_log)
    phi_powers = [pow(phi, 1 << (n_log - 1 - j), gl.P) for j in range(n_log)]

    for x_t, rp in zip(challenges["fri_query_indices"],
                       fri_t.query_round_proofs):
        # x_index = low n_log bits of the challenge (fri/mod.rs:363-364)
        bits = b.split_le(x_t, 64)
        idx_bits = bits[:n_log]

        for (evals_t, mp_t), cap_t in zip(
                rp.initial_trees_proof.evals_proofs, caps):
            _verify_merkle_circuit(b, evals_t, idx_bits, cap_t, mp_t.siblings)

        # subgroup_x = GENERATOR * phi^rev(x_index) (fri/mod.rs:379-389)
        subgroup_x = b.mul_const(
            gl.GENERATOR, _bit_weighted_power(b, idx_bits, phi_powers))

        old_eval = _combine_initial_circuit(
            b, E, batches_t, rp.initial_trees_proof.evals_proofs, alpha,
            subgroup_x, reduced_openings)

        xi_bits = idx_bits
        for step_i, arity_bits in enumerate(fri_params.reduction_arity_bits):
            evals_t = rp.steps[step_i].evals
            within_bits = xi_bits[:arity_bits]
            coset_bits = xi_bits[arity_bits:]
            # consistency with the previous eval (fri/mod.rs:412-413):
            # RandomAccessGate pick of the claimed eval at the coset index
            within_t = _recompose_bits(b, within_bits)
            sel0 = b.random_access(within_t, [e[0] for e in evals_t])
            sel1 = b.random_access(within_t, [e[1] for e in evals_t])
            b.connect(sel0, old_eval[0])
            b.connect(sel1, old_eval[1])
            old_eval = _compute_evaluation_circuit(
                b, subgroup_x, within_bits, arity_bits, evals_t,
                challenges["fri_betas"][step_i])
            leaf = [c for e in evals_t for c in e]
            _verify_merkle_circuit(
                b, leaf, coset_bits,
                fri_t.commit_phase_merkle_caps[step_i],
                rp.steps[step_i].merkle_proof.siblings)
            for _ in range(arity_bits):
                subgroup_x = b.mul(subgroup_x, subgroup_x)
            xi_bits = coset_bits

        final_eval = b.reduce_with_powers_ext(
            E.from_target(subgroup_x), fri_t.final_poly)
        E.connect(final_eval, old_eval)


# ----------------------------------------------------------------------------
# Top level
# ----------------------------------------------------------------------------

def build_recursive_stark_verifier(stark, config: StarkConfig, template_pwp,
                                   outer_config: CircuitConfig = None):
    """Build the outer PLONK circuit that verifies STARK proofs of
    `template_pwp`'s exact shape (stark model + StarkConfig + degree).

    Returns (builder, proof_targets): call builder.build() for the circuit
    data, and recursive_witness(proof_targets, inner_pwp) for the witness of
    a concrete inner proof.  The inner proof's public inputs are the outer
    circuit's public inputs.

    The in-circuit checks are the full executor verifier
    (refimpl.verifier.verify with check_vanishing=True — strictly stronger
    than the reference's StarkChip, which leaves the vanishing check
    commented out at stark/mod.rs:253-321)."""
    b = CircuitBuilder(outer_config or standard_recursion_config())
    assert b.config.num_wires >= 135 and b.config.num_routed_wires >= 80, \
        "recursive verifier needs the standard_recursion geometry"

    proof_t = _map_proof(template_pwp, lambda _v: b.add_input())
    assert len(proof_t.public_inputs) == stark.PUBLIC_INPUTS
    for t in proof_t.public_inputs:
        b.register_public_input(t)

    degree_bits = template_pwp.proof.recover_degree_bits(config)
    E = ExtTargetOps(b)
    ch = TargetChallenger(b)

    challenges = _get_stark_challenges_circuit(ch, proof_t, stark, config)
    _check_quotient_consistency_circuit(
        b, E, stark, config, proof_t, challenges, degree_bits)
    _verify_fri_proof_circuit(
        b, E, stark, config, proof_t, challenges, degree_bits)
    return b, proof_t
