"""Generic STARK model interface, mirroring starky::stark::Stark.

A `Stark` declares its AIR: trace width, public-input count, constraint
degree, permutation pairs, and an `eval` method that emits constraints into a
consumer IN A FIXED ORDER (the order defines the alpha-folding of the
vanishing polynomial, so prover and verifier must see the same stream —
starky ConstraintConsumer semantics).

`eval` is written against an abstract field-ops object `F` (add/sub/mul/one)
so the same definition executes over plain ints (refimpl prover), extension
tuples (verification at zeta), and jnp limb arrays (the TPU verifier).
"""

from dataclasses import dataclass
from typing import List, Tuple


@dataclass(frozen=True)
class PermutationPair:
    """starky::permutation::PermutationPair: column index pairs whose multiset
    of row-values must agree."""
    column_pairs: List[Tuple[int, int]]

    @staticmethod
    def singletons(lhs: int, rhs: int) -> "PermutationPair":
        return PermutationPair(column_pairs=[(lhs, rhs)])


class ConstraintConsumer:
    """starky ConstraintConsumer: fold each constraint into per-alpha
    accumulators `acc = acc * alpha + c`, with row-selector weighting:
      - constraint(c):            c applies on every row
      - constraint_transition(c): weighted by z_last = x - g^(n-1)
      - constraint_first_row(c):  weighted by L_0(x)
      - constraint_last_row(c):   weighted by L_last(x)
    """

    def __init__(self, F, alphas, z_last, lagrange_first, lagrange_last):
        self.F = F
        self.alphas = list(alphas)
        self.z_last = z_last
        self.lagrange_first = lagrange_first
        self.lagrange_last = lagrange_last
        self.accumulators = [F.zero() for _ in alphas]

    def constraint(self, c):
        F = self.F
        self.accumulators = [
            F.add(F.mul(acc, alpha), c)
            for acc, alpha in zip(self.accumulators, self.alphas)
        ]

    def constraint_transition(self, c):
        self.constraint(self.F.mul(c, self.z_last))

    def constraint_first_row(self, c):
        self.constraint(self.F.mul(c, self.lagrange_first))

    def constraint_last_row(self, c):
        self.constraint(self.F.mul(c, self.lagrange_last))


class Stark:
    COLUMNS: int
    PUBLIC_INPUTS: int

    def eval(self, F, local_values, next_values, public_inputs, consumer) -> None:
        raise NotImplementedError

    def constraint_degree(self) -> int:
        raise NotImplementedError

    def permutation_pairs(self) -> List[PermutationPair]:
        return []

    # -- derived quantities (starky::stark::Stark defaults) ------------------

    def uses_permutation_args(self) -> bool:
        return bool(self.permutation_pairs())

    def quotient_degree_factor(self) -> int:
        return max(1, self.constraint_degree() - 1)

    def permutation_batch_size(self) -> int:
        # Matches quotient_degree_factor: each permutation batch constraint
        # Z(gx)*prod(rhs) - Z(x)*prod(lhs) has degree batch_size + 1.
        return self.quotient_degree_factor()

    def num_permutation_instances(self, config) -> int:
        return len(self.permutation_pairs()) * config.num_challenges

    def num_permutation_batches(self, config) -> int:
        n = self.num_permutation_instances(config)
        b = self.permutation_batch_size()
        return (n + b - 1) // b
