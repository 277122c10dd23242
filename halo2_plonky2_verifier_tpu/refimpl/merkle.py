"""Merkle tree with cap, plonky2-compatible (pure-int reference).

Layout: leaves are vectors of Goldilocks elements; leaf hash = hash_or_noop;
internal nodes = two_to_one(left, right); the "cap" is the set of 2^cap_height
subtree roots.  prove(i) returns the sibling path from the leaf level up to
(but excluding) the cap level, with the sibling at level l being the hash of
the neighbor subtree of index (i >> l) ^ 1.

Verification convention (reference: verifier/src/merkle/mod.rs:57-78): walk
LSB-first over the leaf index bits; at each level, bit=1 means the current node
is the right child.  cap index = leaf_index >> num_siblings.
"""

from .hashers import GOLDILOCKS


class MerkleTree:
    def __init__(self, leaves, cap_height, hasher=GOLDILOCKS):
        n = len(leaves)
        assert n & (n - 1) == 0, "number of leaves must be a power of 2"
        log_n = n.bit_length() - 1
        assert 0 <= cap_height <= log_n
        self.leaves = leaves
        self.cap_height = cap_height
        self.hasher = hasher
        levels = self._native_levels(leaves, cap_height, hasher)
        if levels is None:
            # levels[0] = leaf hashes; levels[k] = nodes k above the leaves.
            levels = [[hasher.hash_or_noop(leaf) for leaf in leaves]]
            while len(levels[-1]) > (1 << cap_height):
                prev = levels[-1]
                levels.append(
                    [hasher.two_to_one(prev[2 * i], prev[2 * i + 1])
                     for i in range(len(prev) // 2)]
                )
        self.levels = levels
        self.cap = levels[-1]

    @staticmethod
    def _native_levels(leaves, cap_height, hasher):
        """C++ fast path for the Goldilocks hasher with uniform-width leaves."""
        if hasher.name != "poseidon_goldilocks" or not leaves:
            return None
        width = len(leaves[0])
        if any(len(l) != width for l in leaves):
            return None
        from . import native_backend as nb
        if not nb.available():
            return None
        import numpy as np
        arr = np.array(leaves, dtype=np.uint64)
        return [[[int(x) for x in h] for h in lv]
                for lv in nb.merkle_levels(arr, cap_height)]

    def prove(self, index):
        """Sibling hashes from leaf level up to the cap level (exclusive)."""
        siblings = []
        for level in self.levels[:-1]:
            siblings.append(level[index ^ 1])
            index >>= 1
        return siblings


def verify_merkle_proof_to_cap(leaf_data, leaf_index, cap, siblings,
                               hasher=GOLDILOCKS):
    """Reference check used in tests; mirrors the chip's verification order."""
    node = hasher.hash_or_noop(leaf_data)
    index = leaf_index
    for sibling in siblings:
        if index & 1:
            node = hasher.two_to_one(sibling, node)
        else:
            node = hasher.two_to_one(node, sibling)
        index >>= 1
    return cap[index] == node
