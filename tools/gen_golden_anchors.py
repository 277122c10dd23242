"""Generate tests/fixtures/golden_anchors.json — frozen bit-exactness anchors
for the canonical proof fixtures.

Derivation audit (what pins what):

1. Poseidon-GL permutation: constants/poseidon_goldilocks.py is validated by
   external known-answer vectors (tests/test_poseidon_constants.py) — the
   zero-state and 0..11-range-input permutation outputs of plonky2's Poseidon.
   That is the external root of trust.
2. Transcript challenges: recomputed here from the committed fixture proof by
   refimpl/challenger.py (pure ints over the KAT-pinned permutation),
   following the exact observe/squeeze order of the reference
   (verifier/src/challenger/mod.rs:168-222).  Frozen into this file so ANY
   drift in challenger semantics (clear-on-observe, LIFO pop, cap observation
   order) fails tests/test_golden_anchors.py loudly.
3. Merkle caps: the trace commitment is recomputed from the regenerated trace
   (trace -> coset LDE -> bit-reversed leaves -> cap-4 tree) through THREE
   independent implementations — refimpl pure ints, the C++ native backend
   (native/goldilocks_native.cc), and the JAX ops layer — and must equal the
   committed fixture cap.  A shared semantic error would have to be present
   in three codebases written against different substrates.
4. The n=2^11 two-fold shape freezes the same values for a geometry with
   commit-phase steps (step trees, leaf sponges, two betas).

Regenerate (only if semantics legitimately change): python tools/gen_golden_anchors.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden_anchors.json")


def anchors_for(num_rows, hasher_name):
    from halo2_plonky2_verifier_tpu.refimpl import hashers, verifier
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof

    hasher = None if hasher_name == "poseidon_goldilocks" else hashers.BN254
    stark, config, pwp = get_fibonacci_proof(num_rows, hasher=hasher)
    ch = verifier.get_stark_challenges(pwp.proof, stark, config,
                                       hasher or hashers.GOLDILOCKS)
    out = {
        "num_rows": num_rows,
        "hasher": hasher_name,
        "trace_cap": [list(map(str, h)) if isinstance(h, (list, tuple))
                      else str(h) for h in pwp.proof.trace_cap],
        "stark_alphas": [str(a) for a in ch["stark_alphas"]],
        "stark_zeta": [str(ch["stark_zeta"][0]), str(ch["stark_zeta"][1])],
        "fri_alpha": [str(ch["fri_alpha"][0]), str(ch["fri_alpha"][1])],
        "fri_betas": [[str(b[0]), str(b[1])] for b in ch["fri_betas"]],
        "fri_pow_response": str(ch["fri_pow_response"]),
        "fri_query_indices_first8": [str(q) for q in ch["fri_query_indices"][:8]],
    }
    if ch["permutation_challenge_sets"] is not None:
        out["permutation_challenges"] = [
            [[str(b), str(g)] for (b, g) in cset]
            for cset in ch["permutation_challenge_sets"]]
    return out


def _ext_s(e):
    return [str(e[0]), str(e[1])]


def plonk_anchors():
    """Frozen Fiat-Shamir challenges + commitments for the PLONK path
    (VERDICT r4 item 7): the recursion-mix bench circuit's first fixture
    proof, pinning the plonky2 challenge order (circuit digest -> pi_hash ->
    wires cap -> betas/gammas -> zs cap -> alphas -> quotient cap -> zeta ->
    openings -> FRI) so prover/verifier co-drift is caught."""
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import (
        get_plonk_proof_batch)
    from halo2_plonky2_verifier_tpu.refimpl.plonk.verifier import (
        get_plonk_challenges)
    from halo2_plonky2_verifier_tpu.refimpl.poseidon import hash_no_pad

    common, vd, proofs = get_plonk_proof_batch(4)
    pwp = proofs[0]
    pi_hash = hash_no_pad(list(pwp.public_inputs))
    ch = get_plonk_challenges(pwp.proof, pi_hash, common, vd)
    return {
        "circuit": "plonk_recmix_s60",
        "degree_bits": common.degree_bits,
        "circuit_digest": [str(x) for x in vd.circuit_digest],
        "constants_sigmas_cap_first4": [
            [str(x) for x in h] for h in vd.constants_sigmas_cap[:4]],
        "wires_cap_first4": [[str(x) for x in h]
                             for h in pwp.proof.wires_cap[:4]],
        "public_inputs": [str(x) for x in pwp.public_inputs],
        "plonk_betas": [str(b) for b in ch["plonk_betas"]],
        "plonk_gammas": [str(g) for g in ch["plonk_gammas"]],
        "plonk_alphas": [str(a) for a in ch["plonk_alphas"]],
        "plonk_zeta": _ext_s(ch["plonk_zeta"]),
        "fri_alpha": _ext_s(ch["fri_alpha"]),
        "fri_betas": [_ext_s(b) for b in ch["fri_betas"]],
        "fri_pow_response": str(ch["fri_pow_response"]),
        "fri_query_indices_first8": [
            str(q) for q in ch["fri_query_indices"][:8]],
    }


def recursion_anchor():
    """The recursive-verifier circuit's digest + outer-proof zeta: pins the
    in-circuit verifier's construction (any change to the circuit layout,
    gate order, or copy-constraint structure changes the digest)."""
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import (
        get_recursive_proof_batch)
    from halo2_plonky2_verifier_tpu.refimpl.plonk.verifier import (
        get_plonk_challenges)
    from halo2_plonky2_verifier_tpu.refimpl.poseidon import hash_no_pad

    common, vd, outers, inners = get_recursive_proof_batch(count=2)
    pwp = outers[0]
    pi_hash = hash_no_pad(list(pwp.public_inputs))
    ch = get_plonk_challenges(pwp.proof, pi_hash, common, vd)
    return {
        "circuit": "recursive_fib_n8",
        "degree_bits": common.degree_bits,
        "circuit_digest": [str(x) for x in vd.circuit_digest],
        "public_inputs": [str(x) for x in pwp.public_inputs],
        "plonk_zeta": _ext_s(ch["plonk_zeta"]),
        "fri_pow_response": str(ch["fri_pow_response"]),
    }


def main():
    data = {
        "_derivation_audit": __doc__.strip().splitlines(),
        "anchors": [
            anchors_for(32, "poseidon_goldilocks"),
            anchors_for(2048, "poseidon_goldilocks"),
            anchors_for(8, "poseidon_bn254"),
        ],
        "plonk_anchors": [
            plonk_anchors(),
            recursion_anchor(),
        ],
    }
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
