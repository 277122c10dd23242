"""plonky2 serde-JSON proof interop — external proof ingestion.

This module reads and writes the JSON that `serde_json` produces for
plonky2/starky's own proof structs, so proofs serialized by a Rust
plonky2 toolchain can enter this framework directly (and proofs made by
the refimpl prover can round-trip through the external format).  It is
the executor analog of the reference's WitnessChip, which loads native
plonky2 proof structs (/root/reference/verifier/src/witness/mod.rs:236-294).

Exact struct layout mirrored (field names and nesting are the serde
derives of the pinned plonky2/starky crates the reference builds against,
/root/reference/verifier/Cargo.toml + Cargo.toml:5-13):

  GoldilocksField(u64)                  #[serde(transparent)] -> JSON number
  QuadraticExtension([F; 2])            newtype over array   -> [a0, a1]
  HashOut { elements: [F; 4] }                               -> {"elements": [..4]}
  MerkleCap(Vec<Hash>)                  newtype              -> [hash, ...]
  MerkleProof { siblings: Vec<Hash> }                        -> {"siblings": [...]}
  PolynomialCoeffs { coeffs: Vec<FE> }                       -> {"coeffs": [...]}
  FriInitialTreeProof { evals_proofs: Vec<(Vec<F>, MerkleProof)> }
      -> {"evals_proofs": [[[f, ...], {"siblings": ...}], ...]}
  FriQueryStep { evals: Vec<FE>, merkle_proof: MerkleProof }
  FriQueryRound { initial_trees_proof, steps }
  FriProof { commit_phase_merkle_caps, query_round_proofs, final_poly,
             pow_witness }
  starky StarkOpeningSet { local_values, next_values, permutation_zs,
                           permutation_zs_next, quotient_polys }
  starky StarkProof { trace_cap, permutation_zs_cap, quotient_polys_cap,
                      openings, opening_proof }
  starky StarkProofWithPublicInputs { proof, public_inputs }
  plonky2 OpeningSet { constants, plonk_sigmas, wires, plonk_zs,
                       plonk_zs_next, partial_products, quotient_polys }
  plonky2 Proof { wires_cap, plonk_zs_partial_products_cap,
                  quotient_polys_cap, openings, opening_proof }
  plonky2 ProofWithPublicInputs { proof, public_inputs }

Field elements are JSON numbers (serde_json emits u64 beyond 2^53 as
plain integers; Python's json reads them losslessly).  Every loaded
value is reduced-checked downstream: the canonicality verdict lanes in
witness.py/plonk.py (the analog of the reference's range-checked
load_witness, /root/reference/verifier/src/field/goldilocks/base.rs:108-119)
reject non-canonical (>= p) limbs, so a malformed external proof cannot
smuggle aliased values past Fiat-Shamir.
"""

import json

from .refimpl.proof import (FriInitialTreeProof, FriProof, FriQueryRound,
                            FriQueryStep, MerkleProof, StarkOpeningSet,
                            StarkProof, StarkProofWithPublicInputs)
from .refimpl.plonk.proof import (PlonkOpeningSet, PlonkProof,
                                  PlonkProofWithPublicInputs)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _hash_enc(h):
    return {"elements": [int(x) for x in h]}


def _hash_dec(d):
    e = d["elements"]
    if len(e) != 4:
        raise ValueError(f"HashOut needs 4 elements, got {len(e)}")
    return [int(x) for x in e]


def _cap_enc(cap):
    return [_hash_enc(h) for h in cap]


def _cap_dec(v):
    return [_hash_dec(h) for h in v]


def _ext_enc(e):
    return [int(e[0]), int(e[1])]


def _ext_dec(v):
    if len(v) != 2:
        raise ValueError("QuadraticExtension needs 2 coordinates")
    return (int(v[0]), int(v[1]))


def _exts_enc(es):
    return [_ext_enc(e) for e in es]


def _exts_dec(v):
    return [_ext_dec(e) for e in v]


def _merkle_proof_enc(mp):
    return {"siblings": [_hash_enc(h) for h in mp.siblings]}


def _merkle_proof_dec(d):
    return MerkleProof(siblings=[_hash_dec(h) for h in d["siblings"]])


# ---------------------------------------------------------------------------
# FRI proof
# ---------------------------------------------------------------------------

def fri_proof_enc(fp: FriProof) -> dict:
    return {
        "commit_phase_merkle_caps": [_cap_enc(c)
                                     for c in fp.commit_phase_merkle_caps],
        "query_round_proofs": [
            {
                "initial_trees_proof": {
                    "evals_proofs": [
                        [[int(x) for x in evals], _merkle_proof_enc(mp)]
                        for (evals, mp) in qr.initial_trees_proof.evals_proofs
                    ]
                },
                "steps": [
                    {"evals": _exts_enc(st.evals),
                     "merkle_proof": _merkle_proof_enc(st.merkle_proof)}
                    for st in qr.steps
                ],
            }
            for qr in fp.query_round_proofs
        ],
        "final_poly": {"coeffs": _exts_enc(fp.final_poly)},
        "pow_witness": int(fp.pow_witness),
    }


def fri_proof_dec(d: dict) -> FriProof:
    return FriProof(
        commit_phase_merkle_caps=[_cap_dec(c)
                                  for c in d["commit_phase_merkle_caps"]],
        query_round_proofs=[
            FriQueryRound(
                initial_trees_proof=FriInitialTreeProof(evals_proofs=[
                    ([int(x) for x in ep[0]], _merkle_proof_dec(ep[1]))
                    for ep in qr["initial_trees_proof"]["evals_proofs"]
                ]),
                steps=[
                    FriQueryStep(evals=_exts_dec(st["evals"]),
                                 merkle_proof=_merkle_proof_dec(
                                     st["merkle_proof"]))
                    for st in qr["steps"]
                ],
            )
            for qr in d["query_round_proofs"]
        ],
        final_poly=_exts_dec(d["final_poly"]["coeffs"]),
        pow_witness=int(d["pow_witness"]),
    )


# ---------------------------------------------------------------------------
# starky StarkProofWithPublicInputs
# ---------------------------------------------------------------------------

def stark_proof_to_plonky2_json(pwp: StarkProofWithPublicInputs) -> str:
    p = pwp.proof
    o = p.openings
    doc = {
        "proof": {
            "trace_cap": _cap_enc(p.trace_cap),
            "permutation_zs_cap": (None if p.permutation_zs_cap is None
                                   else _cap_enc(p.permutation_zs_cap)),
            "quotient_polys_cap": _cap_enc(p.quotient_polys_cap),
            "openings": {
                "local_values": _exts_enc(o.local_values),
                "next_values": _exts_enc(o.next_values),
                "permutation_zs": (None if o.permutation_zs is None
                                   else _exts_enc(o.permutation_zs)),
                "permutation_zs_next": (
                    None if o.permutation_zs_next is None
                    else _exts_enc(o.permutation_zs_next)),
                "quotient_polys": _exts_enc(o.quotient_polys),
            },
            "opening_proof": fri_proof_enc(p.opening_proof),
        },
        "public_inputs": [int(x) for x in pwp.public_inputs],
    }
    return json.dumps(doc)


def stark_proof_from_plonky2_json(s) -> StarkProofWithPublicInputs:
    doc = json.loads(s) if isinstance(s, str) else s
    p = doc["proof"]
    o = p["openings"]
    openings = StarkOpeningSet(
        local_values=_exts_dec(o["local_values"]),
        next_values=_exts_dec(o["next_values"]),
        permutation_zs=(None if o.get("permutation_zs") is None
                        else _exts_dec(o["permutation_zs"])),
        permutation_zs_next=(None if o.get("permutation_zs_next") is None
                             else _exts_dec(o["permutation_zs_next"])),
        quotient_polys=_exts_dec(o["quotient_polys"]),
    )
    proof = StarkProof(
        trace_cap=_cap_dec(p["trace_cap"]),
        permutation_zs_cap=(None if p.get("permutation_zs_cap") is None
                            else _cap_dec(p["permutation_zs_cap"])),
        quotient_polys_cap=_cap_dec(p["quotient_polys_cap"]),
        openings=openings,
        opening_proof=fri_proof_dec(p["opening_proof"]),
    )
    return StarkProofWithPublicInputs(
        proof=proof, public_inputs=[int(x) for x in doc["public_inputs"]])


# ---------------------------------------------------------------------------
# plonky2 ProofWithPublicInputs (PLONK)
# ---------------------------------------------------------------------------

_PLONK_OPENING_FIELDS = ("constants", "plonk_sigmas", "wires", "plonk_zs",
                         "plonk_zs_next", "partial_products",
                         "quotient_polys", "lookup_zs", "lookup_zs_next")


def plonk_proof_to_plonky2_json(pwp: PlonkProofWithPublicInputs) -> str:
    p = pwp.proof
    doc = {
        "proof": {
            "wires_cap": _cap_enc(p.wires_cap),
            "plonk_zs_partial_products_cap": _cap_enc(
                p.plonk_zs_partial_products_cap),
            "quotient_polys_cap": _cap_enc(p.quotient_polys_cap),
            "openings": {
                k: _exts_enc(getattr(p.openings, k))
                for k in _PLONK_OPENING_FIELDS
            },
            "opening_proof": fri_proof_enc(p.opening_proof),
        },
        "public_inputs": [int(x) for x in pwp.public_inputs],
    }
    return json.dumps(doc)


def plonk_proof_from_plonky2_json(s) -> PlonkProofWithPublicInputs:
    doc = json.loads(s) if isinstance(s, str) else s
    p = doc["proof"]
    o = p["openings"]
    return PlonkProofWithPublicInputs(
        proof=PlonkProof(
            wires_cap=_cap_dec(p["wires_cap"]),
            plonk_zs_partial_products_cap=_cap_dec(
                p["plonk_zs_partial_products_cap"]),
            quotient_polys_cap=_cap_dec(p["quotient_polys_cap"]),
            openings=PlonkOpeningSet(
                # the seven pre-lookup OpeningSet fields are mandatory in
                # plonky2's serde layout: a missing key must fail here as a
                # parse error, not later as an obscure stacking-shape error;
                # only the lookup columns are absent on lookup-free circuits
                **{k: _exts_dec(o[k] if k not in ("lookup_zs",
                                                  "lookup_zs_next")
                                else o.get(k, []))
                   for k in _PLONK_OPENING_FIELDS}),
            opening_proof=fri_proof_dec(p["opening_proof"]),
        ),
        public_inputs=[int(x) for x in doc["public_inputs"]],
    )
