"""plonky2 PLONK verifier — pure-int reference (plonk::verifier::verify).

The capability the reference's roadmap leaves WIP ("PLONK verification",
/root/reference/README.md:5-12): challenge derivation over the plonky2
transcript order, vanishing-polynomial evaluation at zeta (gate constraints
with selector filters, Z-init terms, partial-product checks), quotient
consistency, and the 4-oracle FRI proof — the FRI layer reuses
refimpl.verifier.verify_fri_proof verbatim (it is the same protocol)."""

from .. import field as gl
from ..challenger import Challenger
from ..field_ops import ExtOps
from ..poseidon import hash_no_pad
from ..verifier import VerificationError, _check, verify_fri_proof
from .vanishing import eval_vanishing_terms


def get_plonk_challenges(proof, pi_hash, common, verifier_data):
    """plonky2 ProofWithPublicInputs::get_challenges order."""
    cfg = common.config
    ch = Challenger()
    ch.observe_hash(verifier_data.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(proof.wires_cap)
    betas = ch.get_n_challenges(cfg.num_challenges)
    gammas = ch.get_n_challenges(cfg.num_challenges)
    deltas = (ch.get_n_challenges(2 * cfg.num_challenges)
              if common.luts else [])
    ch.observe_cap(proof.plonk_zs_partial_products_cap)
    alphas = ch.get_n_challenges(cfg.num_challenges)
    ch.observe_cap(proof.quotient_polys_cap)
    zeta = ch.get_extension_challenge()

    for batch in proof.openings.to_fri_openings():
        ch.observe_extension_elements(batch)

    fri = proof.opening_proof
    fri_alpha = ch.get_extension_challenge()
    fri_betas = []
    for cap in fri.commit_phase_merkle_caps:
        ch.observe_cap(cap)
        fri_betas.append(ch.get_extension_challenge())
    ch.observe_extension_elements(fri.final_poly)
    ch.observe_element(fri.pow_witness)
    fri_pow_response = ch.get_challenge()
    fri_query_indices = [
        ch.get_challenge() for _ in range(cfg.fri_config.num_query_rounds)]
    return {
        "plonk_betas": betas,
        "plonk_gammas": gammas,
        "plonk_deltas": deltas,
        "plonk_alphas": alphas,
        "plonk_zeta": zeta,
        "fri_alpha": fri_alpha,
        "fri_betas": fri_betas,
        "fri_pow_response": fri_pow_response,
        "fri_query_indices": fri_query_indices,
    }


def eval_vanishing_at_zeta(common, openings, pi_hash, challenges):
    """Alpha-folded vanishing values at zeta (plonky2 eval_vanishing_poly)."""
    F = ExtOps
    zeta = challenges["plonk_zeta"]
    n = common.degree
    one = gl.EXT_ONE
    zeta_pow_n = gl.ext_exp_power_of_2(zeta, common.degree_bits)
    z_h_zeta = gl.ext_sub(zeta_pow_n, one)
    l0 = gl.ext_mul(z_h_zeta, gl.ext_inv(
        gl.ext_scalar_mul(gl.ext_sub(zeta, one), n)))

    pi_hash_ext = [gl.ext_from_base(x) for x in pi_hash]
    terms = eval_vanishing_terms(
        F, common, zeta,
        openings.constants, openings.plonk_sigmas, openings.wires,
        openings.plonk_zs, openings.plonk_zs_next, openings.partial_products,
        pi_hash_ext, challenges["plonk_betas"], challenges["plonk_gammas"],
        l0, lookup_zs=openings.lookup_zs,
        lookup_zs_next=openings.lookup_zs_next,
        deltas=challenges["plonk_deltas"])
    vanishing = [gl.reduce_with_powers_ext(terms, gl.ext_from_base(a))
                 for a in challenges["plonk_alphas"]]
    return vanishing, z_h_zeta, zeta_pow_n


def verify(common, verifier_data, proof_with_pis):
    """Raises VerificationError unless the proof verifies."""
    proof = proof_with_pis.proof
    cfg = common.config
    o = proof.openings
    _check(len(o.constants) == common.num_constants, "bad constants count")
    _check(len(o.plonk_sigmas) == cfg.num_routed_wires, "bad sigmas count")
    _check(len(o.wires) == cfg.num_wires, "bad wires count")
    _check(len(o.plonk_zs) == cfg.num_challenges, "bad zs count")
    _check(len(o.plonk_zs_next) == cfg.num_challenges, "bad zs_next count")
    _check(len(o.partial_products)
           == cfg.num_challenges * common.num_partial_products,
           "bad partial products count")
    _check(len(o.quotient_polys)
           == cfg.num_challenges * common.quotient_degree_factor,
           "bad quotient count")
    _check(len(o.lookup_zs) == common.num_lookup_polys, "bad lookup_zs count")
    _check(len(o.lookup_zs_next) == common.num_lookup_polys,
           "bad lookup_zs_next count")

    pi_hash = hash_no_pad(list(proof_with_pis.public_inputs))
    challenges = get_plonk_challenges(proof, pi_hash, common, verifier_data)

    # vanishing(zeta) == Z_H(zeta) * quotient(zeta), per challenge
    vanishing, z_h_zeta, zeta_pow_n = eval_vanishing_at_zeta(
        common, o, pi_hash, challenges)
    q = common.quotient_degree_factor
    for i, v in enumerate(vanishing):
        chunk = o.quotient_polys[i * q:(i + 1) * q]
        recombined = gl.reduce_with_powers_ext(chunk, zeta_pow_n)
        _check(gl.ext_mul(z_h_zeta, recombined) == v,
               f"vanishing/quotient consistency failed for challenge {i}")

    caps = [verifier_data.constants_sigmas_cap, proof.wires_cap,
            proof.plonk_zs_partial_products_cap, proof.quotient_polys_cap]
    instance_batches = common.fri_instance_batches(challenges["plonk_zeta"])
    verify_fri_proof(
        instance_batches,
        o.to_fri_openings(),
        challenges,
        caps,
        proof.opening_proof,
        common.fri_params(),
    )
