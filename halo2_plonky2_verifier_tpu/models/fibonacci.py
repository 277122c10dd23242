"""FibonacciStark — the reference's toy STARK (test fixture + flagship bench).

State [x0, x1, i, j] with transition x0' = x1, x1' = x0 + x1, i' = i+1,
j' = j+1; the last row's j is patched to 0 so columns 2 and 3 are permutations
of each other, exercising the permutation argument
(reference: verifier/src/test_util/fibonacci_stark.rs:22-132).
"""

from .base import ConstraintConsumer, PermutationPair, Stark


class FibonacciStark(Stark):
    COLUMNS = 4
    PUBLIC_INPUTS = 3
    PI_INDEX_X0 = 0
    PI_INDEX_X1 = 1
    PI_INDEX_RES = 2

    def __init__(self, num_rows: int):
        self.num_rows = num_rows

    def generate_trace(self, x0: int, x1: int, p: int):
        """Row-major trace (reference: fibonacci_stark.rs:44-57)."""
        rows = []
        acc = [x0 % p, x1 % p, 0, 1]
        for _ in range(self.num_rows):
            rows.append(list(acc))
            acc = [acc[1], (acc[0] + acc[1]) % p, (acc[2] + 1) % p, (acc[3] + 1) % p]
        rows[self.num_rows - 1][3] = 0  # make columns 2, 3 permutations
        # column-major polynomial values
        return [[rows[r][c] for r in range(self.num_rows)] for c in range(self.COLUMNS)]

    def eval(self, F, local_values, next_values, public_inputs, consumer: ConstraintConsumer):
        # (reference: fibonacci_stark.rs:72-93) — constraint order is part of
        # the protocol (alpha folding).
        consumer.constraint_first_row(
            F.sub(local_values[0], public_inputs[self.PI_INDEX_X0]))
        consumer.constraint_first_row(
            F.sub(local_values[1], public_inputs[self.PI_INDEX_X1]))
        consumer.constraint_last_row(
            F.sub(local_values[1], public_inputs[self.PI_INDEX_RES]))
        consumer.constraint_transition(F.sub(next_values[0], local_values[1]))
        consumer.constraint_transition(
            F.sub(F.sub(next_values[1], local_values[0]), local_values[1]))

    def constraint_degree(self) -> int:
        return 2

    def permutation_pairs(self):
        return [PermutationPair.singletons(2, 3)]


def fibonacci(n: int, x0: int, x1: int, p: int) -> int:
    for _ in range(n):
        x0, x1 = x1, (x0 + x1) % p
    return x1
