"""Native STARK/FRI verifier (pure-int reference) — the executable spec the
TPU verifier is differentially tested against.

Mirrors the reference chips step-for-step:
  - challenge derivation: verifier/src/challenger/mod.rs:129-222
  - FRI verification:     verifier/src/fri/mod.rs:131-502
  - STARK glue:           verifier/src/stark/mod.rs:231-374
plus the vanishing-polynomial / quotient consistency check that the reference
sketches but leaves WIP (verifier/src/stark/mod.rs:202-321), reconstructed
from starky's native verifier semantics (enabled by default here).
"""

from ..models.base import ConstraintConsumer
from . import fft, field as gl
from .challenger import Challenger
from .field_ops import ExtOps
from .merkle import verify_merkle_proof_to_cap
from .prover import (
    eval_permutation_checks,
    fri_instance_batches,
    get_permutation_batches,
    get_permutation_challenge_sets,
)


class VerificationError(Exception):
    pass


def _check(cond, msg):
    if not cond:
        raise VerificationError(msg)


# ----------------------------------------------------------------------------
# Challenge derivation (mirrors ChallengerChip::get_stark_challenges)
# ----------------------------------------------------------------------------

def get_stark_challenges(proof, stark, config, hasher=None,
                         transcript="poseidon_goldilocks"):
    from .hashers import GOLDILOCKS
    from .prover import make_challenger
    hasher = hasher or GOLDILOCKS
    ch = make_challenger(transcript)
    ch.observe_cap(proof.trace_cap, hasher)

    permutation_challenge_sets = None
    if proof.permutation_zs_cap is not None:
        permutation_challenge_sets = get_permutation_challenge_sets(
            ch, config.num_challenges, stark.permutation_batch_size())
        ch.observe_cap(proof.permutation_zs_cap, hasher)

    stark_alphas = ch.get_n_challenges(config.num_challenges)

    ch.observe_cap(proof.quotient_polys_cap, hasher)
    stark_zeta = ch.get_extension_challenge()

    for batch in proof.openings.to_fri_openings():
        ch.observe_extension_elements(batch)

    fri = proof.opening_proof
    num_fri_queries = config.fri_config.num_query_rounds
    fri_alpha = ch.get_extension_challenge()
    fri_betas = []
    for cap in fri.commit_phase_merkle_caps:
        ch.observe_cap(cap, hasher)
        fri_betas.append(ch.get_extension_challenge())
    ch.observe_extension_elements(fri.final_poly)
    ch.observe_element(fri.pow_witness)
    fri_pow_response = ch.get_challenge()
    fri_query_indices = [ch.get_challenge() for _ in range(num_fri_queries)]

    return {
        "permutation_challenge_sets": permutation_challenge_sets,
        "stark_alphas": stark_alphas,
        "stark_zeta": stark_zeta,
        "fri_alpha": fri_alpha,
        "fri_betas": fri_betas,
        "fri_pow_response": fri_pow_response,
        "fri_query_indices": fri_query_indices,
    }


# ----------------------------------------------------------------------------
# FRI verification (mirrors FriChip)
# ----------------------------------------------------------------------------

def _combine_initial(instance_batches, evals_proofs, alpha, subgroup_x, reduced_openings):
    """reference: verifier/src/fri/mod.rs:170-220"""
    x_ext = gl.ext_from_base(subgroup_x)
    total = gl.EXT_ZERO
    for (point, polys), reduced_opening in zip(instance_batches, reduced_openings):
        evals = [gl.ext_from_base(evals_proofs[oi][0][pi]) for (oi, pi) in polys]
        reduced_evals = gl.reduce_with_powers_ext(evals, alpha)
        numerator = gl.ext_sub(reduced_evals, reduced_opening)
        denominator = gl.ext_sub(x_ext, point)
        alpha_shift = gl.ext_exp(alpha, len(evals))
        total = gl.ext_mul(alpha_shift, total)
        total = gl.ext_add(gl.ext_mul(numerator, gl.ext_inv(denominator)), total)
    return total


def _barycentric_weights(points):
    return gl.batch_inv([
        _prod((x_i - x_j) % gl.P for j, x_j in enumerate(points) if j != i)
        for i, x_i in enumerate(points)
    ])


def _prod(it):
    acc = 1
    for v in it:
        acc = acc * v % gl.P
    return acc


def _interpolate_coset(coset_shift, values, evaluation_point):
    """Barycentric interpolation over the coset coset_shift * <g_arity>,
    evaluated at evaluation_point (reference: verifier/src/fri/mod.rs:223-283)."""
    n = len(values)
    arity_bits = n.bit_length() - 1
    shifted_point = gl.ext_scalar_mul(evaluation_point, gl.inv(coset_shift))
    domain = gl.two_adic_subgroup(arity_bits)
    weights = _barycentric_weights(domain)
    weighted_values = [gl.ext_scalar_mul(v, w) for v, w in zip(values, weights)]

    ev = gl.EXT_ZERO
    partial_prod = gl.EXT_ONE
    for val, x_i in zip(weighted_values, domain):
        term = gl.ext_sub(shifted_point, gl.ext_from_base(x_i))
        ev = gl.ext_add(gl.ext_mul(ev, term), gl.ext_mul(val, partial_prod))
        partial_prod = gl.ext_mul(partial_prod, term)
    return ev


def _compute_evaluation(x, x_index_within_coset, arity_bits, evals, beta):
    """Fold one FRI reduction step (reference: verifier/src/fri/mod.rs:286-322)."""
    arity = 1 << arity_bits
    g = gl.primitive_root_of_unity(arity_bits)
    g_inv = pow(g, arity - 1, gl.P)
    evals_brv = fft.reverse_index_bits(list(evals))
    rev_idx = int(format(x_index_within_coset, f"0{arity_bits}b")[::-1], 2)
    start = pow(g_inv, rev_idx, gl.P)
    coset_start = start * x % gl.P
    return _interpolate_coset(coset_start, evals_brv, beta)


def verify_fri_proof(instance_batches, openings_batches, challenges, initial_caps,
                     fri_proof, fri_params, hasher=None):
    """reference: verifier/src/fri/mod.rs:447-502"""
    from .hashers import GOLDILOCKS
    hasher = hasher or GOLDILOCKS
    _check(fri_params.final_poly_len == len(fri_proof.final_poly),
           "final polynomial has wrong degree")
    n = fri_params.lde_size
    n_log = fri_params.lde_bits
    cap_height = fri_params.config.cap_height

    # PoW: proof_of_work_bits leading zeros (reference: fri/mod.rs:131-145)
    _check(challenges["fri_pow_response"] <
           1 << (64 - fri_params.config.proof_of_work_bits),
           "proof-of-work check failed")

    _check(fri_params.config.num_query_rounds == len(fri_proof.query_round_proofs),
           "number of query rounds does not match config")

    alpha = challenges["fri_alpha"]
    reduced_openings = [
        gl.reduce_with_powers_ext(batch, alpha) for batch in openings_batches
    ]

    for x_challenge, round_proof in zip(
            challenges["fri_query_indices"], fri_proof.query_round_proofs):
        x_index = x_challenge % n  # low n_log bits of the challenge
        cap_index = x_index >> (n_log - cap_height)

        # initial Merkle proofs, one per oracle
        for (evals, mproof), cap in zip(
                round_proof.initial_trees_proof.evals_proofs, initial_caps):
            _check(verify_merkle_proof_to_cap(evals, x_index, cap,
                                              mproof.siblings, hasher),
                   "initial tree Merkle proof failed")

        # subgroup_x = 7 * phi^rev(x_index)
        phi = gl.primitive_root_of_unity(n_log)
        rev_idx = int(format(x_index, f"0{n_log}b")[::-1], 2) if n_log else 0
        subgroup_x = gl.GENERATOR * pow(phi, rev_idx, gl.P) % gl.P

        old_eval = _combine_initial(
            instance_batches, round_proof.initial_trees_proof.evals_proofs,
            alpha, subgroup_x, reduced_openings)

        xi = x_index
        for i, arity_bits in enumerate(fri_params.reduction_arity_bits):
            evals = round_proof.steps[i].evals
            coset_index = xi >> arity_bits
            x_within = xi & ((1 << arity_bits) - 1)
            _check(evals[x_within] == old_eval,
                   "consistency with previous eval failed")
            old_eval = _compute_evaluation(
                subgroup_x, x_within, arity_bits, evals, challenges["fri_betas"][i])
            leaf = [c for e in evals for c in e]
            _check(verify_merkle_proof_to_cap(
                leaf, coset_index,
                fri_proof.commit_phase_merkle_caps[i],
                round_proof.steps[i].merkle_proof.siblings, hasher),
                "step Merkle proof failed")
            subgroup_x = gl.exp_power_of_2(subgroup_x, arity_bits)
            xi = coset_index

        final_eval = fft.eval_poly_ext_coeffs(
            fri_proof.final_poly, gl.ext_from_base(subgroup_x))
        _check(final_eval == old_eval, "final polynomial evaluation mismatch")


# ----------------------------------------------------------------------------
# Vanishing polynomial check at zeta (the reference's WIP extension)
# ----------------------------------------------------------------------------

def eval_vanishing_poly_at_zeta(stark, config, openings, public_inputs, challenges,
                                degree_bits):
    """Evaluate the alpha-folded constraint polynomial at zeta from the
    openings, mirroring starky eval_vanishing_poly (the executor form of
    verifier/src/stark/mod.rs:253-311's commented-out circuit)."""
    F = ExtOps
    zeta = challenges["stark_zeta"]
    n = 1 << degree_bits
    g_sub = gl.primitive_root_of_unity(degree_bits)
    one = gl.EXT_ONE

    zeta_pow_n = gl.ext_exp_power_of_2(zeta, degree_bits)
    z_h_zeta = gl.ext_sub(zeta_pow_n, one)
    # L_0(z) = Z_H(z) / (n (z - 1)); L_last(z) = Z_H(z) / (n (g z - 1))
    l0 = gl.ext_mul(z_h_zeta, gl.ext_inv(
        gl.ext_scalar_mul(gl.ext_sub(zeta, one), n)))
    llast = gl.ext_mul(z_h_zeta, gl.ext_inv(
        gl.ext_scalar_mul(gl.ext_sub(gl.ext_scalar_mul(zeta, g_sub), one), n)))
    z_last = gl.ext_sub(zeta, gl.ext_from_base(pow(g_sub, n - 1, gl.P)))

    alphas_ext = [gl.ext_from_base(a) for a in challenges["stark_alphas"]]
    consumer = ConstraintConsumer(F, alphas_ext, z_last, l0, llast)
    pis = [gl.ext_from_base(x) for x in public_inputs]
    stark.eval(F, openings.local_values, openings.next_values, pis, consumer)

    if stark.uses_permutation_args():
        batches = get_permutation_batches(
            stark.permutation_pairs(), challenges["permutation_challenge_sets"],
            config.num_challenges, stark.permutation_batch_size())
        eval_permutation_checks(
            F, openings.local_values, openings.permutation_zs,
            openings.permutation_zs_next, batches, consumer)

    return consumer.accumulators, z_h_zeta, zeta_pow_n


def check_quotient_consistency(stark, config, openings, public_inputs, challenges,
                               degree_bits):
    """Check vanishing(zeta) == Z_H(zeta) * quotient(zeta) for each challenge,
    recombining the degree-n quotient chunks with powers of zeta^n."""
    vanishing, z_h_zeta, zeta_pow_n = eval_vanishing_poly_at_zeta(
        stark, config, openings, public_inputs, challenges, degree_bits)
    factor = stark.quotient_degree_factor()
    for i, acc in enumerate(vanishing):
        chunk = openings.quotient_polys[i * factor:(i + 1) * factor]
        recombined = gl.reduce_with_powers_ext(chunk, zeta_pow_n)
        _check(gl.ext_mul(z_h_zeta, recombined) == acc,
               f"vanishing/quotient consistency failed for challenge {i}")


# ----------------------------------------------------------------------------
# Top-level verification (mirrors StarkChip::verify_proof)
# ----------------------------------------------------------------------------

def verify(stark, proof_with_pis, config, check_vanishing=True, hasher=None,
           transcript="poseidon_goldilocks"):
    """Returns None on success; raises VerificationError otherwise."""
    proof = proof_with_pis.proof
    public_inputs = proof_with_pis.public_inputs
    _check(len(public_inputs) == stark.PUBLIC_INPUTS, "bad public input count")

    degree_bits = proof.recover_degree_bits(config)
    challenges = get_stark_challenges(proof, stark, config, hasher, transcript)

    # check_permutation_options (reference: stark/mod.rs:123-142)
    opts = [proof.permutation_zs_cap is not None,
            proof.openings.permutation_zs is not None,
            proof.openings.permutation_zs_next is not None,
            challenges["permutation_challenge_sets"] is not None]
    _check(all(o == stark.uses_permutation_args() for o in opts),
           "permutation data doesn't match stark configuration")

    if check_vanishing:
        check_quotient_consistency(
            stark, config, proof.openings, public_inputs, challenges, degree_bits)

    caps = [proof.trace_cap]
    if proof.permutation_zs_cap is not None:
        caps.append(proof.permutation_zs_cap)
    caps.append(proof.quotient_polys_cap)

    g_sub = gl.primitive_root_of_unity(degree_bits)
    instance_batches = fri_instance_batches(
        stark, config, challenges["stark_zeta"], g_sub)
    verify_fri_proof(
        instance_batches,
        proof.openings.to_fri_openings(),
        challenges,
        caps,
        proof.opening_proof,
        config.fri_params(degree_bits),
        hasher,
    )
