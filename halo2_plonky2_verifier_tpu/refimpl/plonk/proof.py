"""plonky2 proof structures (PLONK flavor) + JSON serialization."""

import json
from dataclasses import dataclass
from typing import List, Optional

from ..proof import FriProof, _ext_to_json
from .. import field as gl


@dataclass
class PlonkOpeningSet:
    """plonky2 OpeningSet: evaluations at zeta (and zeta*g for the Zs).
    lookup_zs/lookup_zs_next are the logUp running-sum openings (empty for
    circuits without lookup tables, keeping the legacy layout byte-stable)."""
    constants: List[tuple]        # selectors ++ gate constants ++ lookup sels
    plonk_sigmas: List[tuple]
    wires: List[tuple]
    plonk_zs: List[tuple]
    plonk_zs_next: List[tuple]
    partial_products: List[tuple]
    quotient_polys: List[tuple]
    lookup_zs: List[tuple] = None
    lookup_zs_next: List[tuple] = None

    def __post_init__(self):
        if self.lookup_zs is None:
            self.lookup_zs = []
        if self.lookup_zs_next is None:
            self.lookup_zs_next = []

    def to_fri_openings(self):
        """zeta batch in oracle order, then the zeta*g batch (plonky2
        OpeningSet::to_fri_openings: lookup_zs after quotient_polys in the
        zeta batch; lookup_zs_next after plonk_zs_next)."""
        return [
            (self.constants + self.plonk_sigmas + self.wires + self.plonk_zs
             + self.partial_products + self.quotient_polys + self.lookup_zs),
            self.plonk_zs_next + self.lookup_zs_next,
        ]


@dataclass
class PlonkProof:
    wires_cap: list
    plonk_zs_partial_products_cap: list
    quotient_polys_cap: list
    openings: PlonkOpeningSet
    opening_proof: FriProof


@dataclass
class PlonkProofWithPublicInputs:
    proof: PlonkProof
    public_inputs: List[int]


def plonk_proof_to_json(pwp: PlonkProofWithPublicInputs) -> str:
    from ..proof import proof_to_json_dict_fri

    p = pwp.proof
    o = p.openings
    return json.dumps({
        "wires_cap": [list(map(str, h)) for h in p.wires_cap],
        "zs_pp_cap": [list(map(str, h)) for h in p.plonk_zs_partial_products_cap],
        "quotient_cap": [list(map(str, h)) for h in p.quotient_polys_cap],
        "openings": {
            k: [_ext_to_json(e) for e in getattr(o, k)]
            for k in ("constants", "plonk_sigmas", "wires", "plonk_zs",
                      "plonk_zs_next", "partial_products", "quotient_polys",
                      "lookup_zs", "lookup_zs_next")
        },
        "opening_proof": proof_to_json_dict_fri(p.opening_proof),
        "public_inputs": [str(x) for x in pwp.public_inputs],
    })


def plonk_proof_from_json(s: str) -> PlonkProofWithPublicInputs:
    from ..proof import fri_proof_from_json_dict

    d = json.loads(s)

    def cap(v):
        return [[int(x) for x in h] for h in v]

    def exts(v):
        return [(int(e[0]), int(e[1])) for e in v]

    o = d["openings"]
    return PlonkProofWithPublicInputs(
        proof=PlonkProof(
            wires_cap=cap(d["wires_cap"]),
            plonk_zs_partial_products_cap=cap(d["zs_pp_cap"]),
            quotient_polys_cap=cap(d["quotient_cap"]),
            openings=PlonkOpeningSet(
                **{k: exts(o[k]) for k in o}),
            opening_proof=fri_proof_from_json_dict(d["opening_proof"]),
        ),
        public_inputs=[int(x) for x in d["public_inputs"]],
    )
