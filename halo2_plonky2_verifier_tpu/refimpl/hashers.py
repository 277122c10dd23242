"""Hasher configurations (the executor analog of the reference's HasherChip
trait, verifier/src/hash/mod.rs:52-127).

Two instances, matching the reference's two end-to-end configurations
(stark/mod.rs:406-518):
  - PoseidonGoldilocksHasher: hash = 4 Goldilocks elements
    (plonky2 PoseidonGoldilocksConfig);
  - PoseidonBN254Hasher: hash = one BN254 Fr element, Goldilocks transcript
    (plonky2x PoseidonBN128GoldilocksConfig).
"""

from . import poseidon as _gl_hash
from . import poseidon_bn254 as _bn_hash


class PoseidonGoldilocksHasher:
    name = "poseidon_goldilocks"
    MAX_GOLDILOCKS = 4

    @staticmethod
    def hash_or_noop(leaf):
        return _gl_hash.hash_or_noop(leaf)

    @staticmethod
    def two_to_one(left, right):
        return _gl_hash.two_to_one(left, right)

    @staticmethod
    def to_goldilocks_vec(h):
        """Transcript observation form (hash/mod.rs:12-18)."""
        return list(h)


class PoseidonBN254Hasher:
    name = "poseidon_bn254"
    MAX_GOLDILOCKS = 3

    @staticmethod
    def hash_or_noop(leaf):
        return _bn_hash.hash_or_noop(leaf)

    @staticmethod
    def two_to_one(left, right):
        return _bn_hash.two_to_one(left, right)

    @staticmethod
    def to_goldilocks_vec(h):
        """5 x 56-bit limbs (hash.rs:30-43)."""
        return _bn_hash.to_goldilocks_vec(h)


GOLDILOCKS = PoseidonGoldilocksHasher
BN254 = PoseidonBN254Hasher
