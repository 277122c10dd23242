"""plonky2 PLONK protocol (pure-int reference): circuit builder, gates,
prover, verifier.  See circuit.py for the layout and documented conventions;
the TPU-lane verifier lives in halo2_plonky2_verifier_tpu/plonk.py."""

from .circuit import (CircuitBuilder, CircuitConfig, CommonCircuitData,
                      VerifierCircuitData, compute_circuit_digest)
from .gates import (ArithmeticExtensionGate, ArithmeticGate, ConstantGate,
                    MulExtensionGate, NoopGate, PoseidonGate, PublicInputGate,
                    RandomAccessGate)
from .proof import (PlonkProof, PlonkProofWithPublicInputs,
                    plonk_proof_from_json, plonk_proof_to_json)
from .prover import prove
from .verifier import verify
