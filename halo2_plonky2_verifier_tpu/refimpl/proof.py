"""Proof containers mirroring starky::proof::* / plonky2::fri::proof::*, plus
JSON (de)serialization so proofs are portable test fixtures.

Structure mirrors the wire structs the reference loads
(reference: verifier/src/witness/mod.rs:150-295, verifier/src/fri/mod.rs:71-95,
verifier/src/stark/mod.rs:39-95).  Hashes are 4-element Goldilocks lists;
extension elements are (a0, a1) tuples.
"""

import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

Ext = Tuple[int, int]
Hash = List[int]


@dataclass
class MerkleProof:
    siblings: List[Hash]


@dataclass
class FriInitialTreeProof:
    # per oracle: (evals at the queried point, merkle proof)
    evals_proofs: List[Tuple[List[int], MerkleProof]]


@dataclass
class FriQueryStep:
    evals: List[Ext]
    merkle_proof: MerkleProof


@dataclass
class FriQueryRound:
    initial_trees_proof: FriInitialTreeProof
    steps: List[FriQueryStep]


@dataclass
class FriProof:
    commit_phase_merkle_caps: List[List[Hash]]
    query_round_proofs: List[FriQueryRound]
    final_poly: List[Ext]
    pow_witness: int


@dataclass
class StarkOpeningSet:
    local_values: List[Ext]
    next_values: List[Ext]
    permutation_zs: Optional[List[Ext]]
    permutation_zs_next: Optional[List[Ext]]
    quotient_polys: List[Ext]

    def to_fri_openings(self) -> List[List[Ext]]:
        """Two batches: at zeta = local||perm_zs||quotient, at zeta*g =
        next||perm_zs_next (reference: verifier/src/stark/mod.rs:48-70)."""
        zeta_batch = (
            list(self.local_values)
            + list(self.permutation_zs or [])
            + list(self.quotient_polys)
        )
        zeta_next_batch = list(self.next_values) + list(self.permutation_zs_next or [])
        return [zeta_batch, zeta_next_batch]


@dataclass
class StarkProof:
    trace_cap: List[Hash]
    permutation_zs_cap: Optional[List[Hash]]
    quotient_polys_cap: List[Hash]
    openings: StarkOpeningSet
    opening_proof: FriProof

    def recover_degree_bits(self, config) -> int:
        """reference: verifier/src/stark/mod.rs:82-89"""
        initial_merkle_proof = self.opening_proof.query_round_proofs[0].initial_trees_proof.evals_proofs[0][1]
        lde_bits = config.fri_config.cap_height + len(initial_merkle_proof.siblings)
        return lde_bits - config.fri_config.rate_bits


@dataclass
class StarkProofWithPublicInputs:
    proof: StarkProof
    public_inputs: List[int]


# ----------------------------------------------------------------------------
# JSON serialization
# ----------------------------------------------------------------------------

def _ext_to_json(e):
    return [int(e[0]), int(e[1])]


def proof_to_json_dict_fri(op: FriProof) -> dict:
    return {
        "commit_phase_merkle_caps": op.commit_phase_merkle_caps,
        "final_poly": [_ext_to_json(e) for e in op.final_poly],
        "pow_witness": op.pow_witness,
        "query_round_proofs": [
            {
                "initial_trees_proof": [
                    {"evals": evals, "siblings": mp.siblings}
                    for (evals, mp) in qr.initial_trees_proof.evals_proofs
                ],
                "steps": [
                    {
                        "evals": [_ext_to_json(e) for e in st.evals],
                        "siblings": st.merkle_proof.siblings,
                    }
                    for st in qr.steps
                ],
            }
            for qr in op.query_round_proofs
        ],
    }


def fri_proof_from_json_dict(op: dict) -> FriProof:
    return FriProof(
        commit_phase_merkle_caps=op["commit_phase_merkle_caps"],
        query_round_proofs=[
            FriQueryRound(
                initial_trees_proof=FriInitialTreeProof(
                    evals_proofs=[
                        (ep["evals"], MerkleProof(siblings=ep["siblings"]))
                        for ep in qr["initial_trees_proof"]
                    ]
                ),
                steps=[
                    FriQueryStep(
                        evals=[tuple(e) for e in st["evals"]],
                        merkle_proof=MerkleProof(siblings=st["siblings"]),
                    )
                    for st in qr["steps"]
                ],
            )
            for qr in op["query_round_proofs"]
        ],
        final_poly=[tuple(e) for e in op["final_poly"]],
        pow_witness=op["pow_witness"],
    )


def proof_to_json(pwp: StarkProofWithPublicInputs) -> str:
    p = pwp.proof
    op = p.opening_proof
    doc = {
        "trace_cap": p.trace_cap,
        "permutation_zs_cap": p.permutation_zs_cap,
        "quotient_polys_cap": p.quotient_polys_cap,
        "openings": {
            "local_values": [_ext_to_json(e) for e in p.openings.local_values],
            "next_values": [_ext_to_json(e) for e in p.openings.next_values],
            "permutation_zs": None if p.openings.permutation_zs is None
            else [_ext_to_json(e) for e in p.openings.permutation_zs],
            "permutation_zs_next": None if p.openings.permutation_zs_next is None
            else [_ext_to_json(e) for e in p.openings.permutation_zs_next],
            "quotient_polys": [_ext_to_json(e) for e in p.openings.quotient_polys],
        },
        "opening_proof": {
            "commit_phase_merkle_caps": op.commit_phase_merkle_caps,
            "final_poly": [_ext_to_json(e) for e in op.final_poly],
            "pow_witness": op.pow_witness,
            "query_round_proofs": [
                {
                    "initial_trees_proof": [
                        {"evals": evals, "siblings": mp.siblings}
                        for (evals, mp) in qr.initial_trees_proof.evals_proofs
                    ],
                    "steps": [
                        {
                            "evals": [_ext_to_json(e) for e in st.evals],
                            "siblings": st.merkle_proof.siblings,
                        }
                        for st in qr.steps
                    ],
                }
                for qr in op.query_round_proofs
            ],
        },
        "public_inputs": pwp.public_inputs,
    }
    return json.dumps(doc)


def proof_from_json(s: str) -> StarkProofWithPublicInputs:
    doc = json.loads(s)
    o = doc["openings"]

    def exts(v):
        return None if v is None else [tuple(e) for e in v]

    openings = StarkOpeningSet(
        local_values=exts(o["local_values"]),
        next_values=exts(o["next_values"]),
        permutation_zs=exts(o["permutation_zs"]),
        permutation_zs_next=exts(o["permutation_zs_next"]),
        quotient_polys=exts(o["quotient_polys"]),
    )
    op = doc["opening_proof"]
    fri = FriProof(
        commit_phase_merkle_caps=op["commit_phase_merkle_caps"],
        query_round_proofs=[
            FriQueryRound(
                initial_trees_proof=FriInitialTreeProof(
                    evals_proofs=[
                        (ep["evals"], MerkleProof(siblings=ep["siblings"]))
                        for ep in qr["initial_trees_proof"]
                    ]
                ),
                steps=[
                    FriQueryStep(
                        evals=[tuple(e) for e in st["evals"]],
                        merkle_proof=MerkleProof(siblings=st["siblings"]),
                    )
                    for st in qr["steps"]
                ],
            )
            for qr in op["query_round_proofs"]
        ],
        final_poly=[tuple(e) for e in op["final_poly"]],
        pow_witness=op["pow_witness"],
    )
    proof = StarkProof(
        trace_cap=doc["trace_cap"],
        permutation_zs_cap=doc["permutation_zs_cap"],
        quotient_polys_cap=doc["quotient_polys_cap"],
        openings=openings,
        opening_proof=fri,
    )
    return StarkProofWithPublicInputs(proof=proof, public_inputs=doc["public_inputs"])
