"""Pure-Python (arbitrary-precision int) reference implementation of the
plonky2/starky semantics this framework verifies.

This layer is the *executable specification*: it mirrors, value-for-value, the
behavior that the reference halo2 chips constrain (see SURVEY.md §2) and the
plonky2/starky prover that produces the proofs.  It serves three roles:

1. Test oracle for the TPU (JAX/Pallas) kernels — differential testing, the
   same idiom the reference repo uses against plonky2 (SURVEY.md §4).
2. Proof factory — a starky-compatible prover for the Fibonacci STARK so
   end-to-end test vectors exist without Rust in the environment.
3. Documentation of the exact bit-level conventions (transcript order, Merkle
   layout, index bit order) that the TPU verifier must reproduce.
"""
