"""TPU-native plonky2/starky STARK proof verification framework.

A from-scratch JAX/XLA/Pallas re-design of shuklaayush/halo2-plonky2-verifier:
the same verification semantics (Goldilocks + GF(p^2) arithmetic, Poseidon
hashing, Merkle-cap commitments, duplex-sponge Fiat-Shamir transcript, full
FRI verification, STARK vanishing-polynomial checks) executed directly on TPU
lanes instead of compiled into halo2 constraint circuits.

Public API:
    build_verifier(stark, config, degree_bits) -> verify(batch) -> (B,) bool
    witness.proof_shape / witness.load_proofs
    StarkConfig.standard_fast_config()
    models.fibonacci.FibonacciStark
    refimpl.prover.prove (pure-Python proof factory / executable spec)
    plonk.build_plonk_verifier / load_plonk_proofs / plonk_proof_shape
        (plonky2 PLONK proofs; circuits + prover in refimpl.plonk)
"""

from .plonk import build_plonk_verifier, load_plonk_proofs, plonk_proof_shape
from .stark import build_verifier
from .utils.config import FriConfig, FriParams, StarkConfig
from .witness import ProofBatch, ProofShape, load_proofs, proof_shape

__all__ = [
    "build_verifier",
    "build_plonk_verifier",
    "load_plonk_proofs",
    "plonk_proof_shape",
    "FriConfig",
    "FriParams",
    "StarkConfig",
    "ProofBatch",
    "ProofShape",
    "load_proofs",
    "proof_shape",
]
