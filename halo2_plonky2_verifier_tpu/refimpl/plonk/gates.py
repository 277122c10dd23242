"""plonky2 gate set (minimal) + selector machinery — pure-int reference.

The reference's roadmap leaves "PLONK verification" WIP
(/root/reference/README.md:5-12; scaffolding at stark/mod.rs:202-321); this
package implements the plonky2 PLONK protocol itself so the framework covers
that roadmap in the strong sense: gates with selector filters, copy
constraints via sigma polynomials and coset shifts k_i, partial-products
Z-polynomial checks, and the standard 4-oracle FRI instance.

Gate semantics follow plonky2's gates/:
  - each gate row has one gate; selector polynomial s_g(x) holds the gate's
    index within the circuit's gate list (or UNUSED for rows outside group g);
  - the filter for gate i in selector group [a, b) is
        prod_{k in [a,b), k != i} (k - s) [* (UNUSED - s) if many groups]
    and every one of the gate's constraints is multiplied by it;
  - gate `eval` is written against an abstract field-ops F so the same
    definition runs over ints (prover grid), extension tuples (verifier at
    zeta), and jnp lanes (the TPU verifier).
"""

UNUSED_SELECTOR = (1 << 32) - 1


class Gate:
    """One plonky2 gate type.  Subclasses define:
    id(), num_wires, num_constants, degree(), num_constraints(),
    eval(F, constants, wires, public_inputs_hash) -> list of constraints,
    and fill_row(builder_row) witness generation hooks."""

    num_wires = 0
    num_constants = 0

    def id(self):
        return type(self).__name__

    def degree(self):
        raise NotImplementedError

    def num_constraints(self):
        return 0

    def eval(self, F, constants, wires, public_inputs_hash):
        return []


class NoopGate(Gate):
    """No constraints (plonky2 gates/noop.rs); also used for padding rows and
    as the host row for free public-input wires."""

    def degree(self):
        return 0


class ConstantGate(Gate):
    """wires[i] == constants[i] for i < num_consts (plonky2 gates/constant.rs)."""

    def __init__(self, num_consts):
        self.num_consts = num_consts
        self.num_wires = num_consts
        self.num_constants = num_consts

    def id(self):
        return f"ConstantGate(num_consts={self.num_consts})"

    def degree(self):
        return 1

    def num_constraints(self):
        return self.num_consts

    def eval(self, F, constants, wires, public_inputs_hash):
        return [F.sub(wires[i], constants[i]) for i in range(self.num_consts)]


class ArithmeticGate(Gate):
    """num_ops independent ops: out = c0 * m0 * m1 + c1 * addend, sharing the
    row constants c0, c1 (plonky2 gates/arithmetic_base.rs).  Wires per op:
    [multiplicand_0, multiplicand_1, addend, output]."""

    def __init__(self, num_ops):
        self.num_ops = num_ops
        self.num_wires = 4 * num_ops
        self.num_constants = 2

    def id(self):
        return f"ArithmeticGate(num_ops={self.num_ops})"

    def degree(self):
        return 3

    def num_constraints(self):
        return self.num_ops

    @staticmethod
    def wires_ith_op(i):
        return (4 * i, 4 * i + 1, 4 * i + 2, 4 * i + 3)

    def eval(self, F, constants, wires, public_inputs_hash):
        c0, c1 = constants[0], constants[1]
        out = []
        for i in range(self.num_ops):
            m0, m1, add, o = self.wires_ith_op(i)
            computed = F.add(F.mul(c0, F.mul(wires[m0], wires[m1])),
                             F.mul(c1, wires[add]))
            out.append(F.sub(computed, wires[o]))
        return out


class PublicInputGate(Gate):
    """wires[0..4] == public-inputs hash (plonky2 gates/public_input.rs).
    The verifier recomputes the hash from the claimed public inputs, so
    tampering with them breaks these constraints."""

    num_wires = 4

    def degree(self):
        return 1

    def num_constraints(self):
        return 4

    def eval(self, F, constants, wires, public_inputs_hash):
        return [F.sub(wires[i], public_inputs_hash[i]) for i in range(4)]


class BaseSumGate(Gate):
    """Base-B decomposition with limb range checks (plonky2 gates/base_sum.rs):
    wires = [sum, limb_0, ..., limb_{n-1}], constraints:
      sum - sum_i limb_i * B^i                              (degree 1)
      prod_{v=0}^{B-1} (limb_i - v)  for each limb          (degree B)
    B=2 gives boolean decomposition — the framework's range-check gate."""

    def __init__(self, num_limbs, base=2):
        assert base >= 2
        self.num_limbs = num_limbs
        self.base = base
        self.num_wires = 1 + num_limbs
        self.num_constants = 0

    def id(self):
        return f"BaseSumGate(num_limbs={self.num_limbs}, base={self.base})"

    def degree(self):
        return self.base

    def num_constraints(self):
        return 1 + self.num_limbs

    def eval(self, F, constants, wires, public_inputs_hash):
        b = F.from_base(self.base)
        acc = F.zero()
        for i in reversed(range(self.num_limbs)):
            acc = F.add(F.mul(b, acc), wires[1 + i])
        out = [F.sub(wires[0], acc)]
        for i in range(self.num_limbs):
            limb = wires[1 + i]
            prod = limb
            for v in range(1, self.base):
                prod = F.mul(prod, F.sub(limb, F.from_base(v)))
            out.append(prod)
        return out


class ExponentiationGate(Gate):
    """base^exponent by square-and-multiply over the exponent's bits
    (plonky2 gates/exponentiation.rs).  Wires: base (0), power bits LSB-first
    (1..num_power_bits), output (1+num_power_bits), intermediates (rest,
    unrouted).  Constraint i (MSB-first):
        intermediate_i = intermediate_{i-1}^2 * (bit * (base - 1) + 1)
    (degree 4; intermediate_{-1} = 1), plus output = last intermediate.
    Bits are NOT booleanity-constrained here — route them from a
    BaseSumGate(base=2) decomposition (CircuitBuilder.exp does)."""

    def __init__(self, num_power_bits):
        self.num_power_bits = num_power_bits
        self.num_wires = 2 + 2 * num_power_bits
        self.num_constants = 0

    def id(self):
        return f"ExponentiationGate(num_power_bits={self.num_power_bits})"

    def degree(self):
        return 4

    def num_constraints(self):
        return self.num_power_bits + 1

    def wire_bit(self, j):
        return 1 + j                      # LSB-first

    @property
    def wire_output(self):
        return 1 + self.num_power_bits

    def wire_intermediate(self, i):
        return 2 + self.num_power_bits + i

    def eval(self, F, constants, wires, public_inputs_hash):
        nb = self.num_power_bits
        one = F.one()
        base = wires[0]
        out = []
        prev = one
        for i in range(nb):
            bit = wires[self.wire_bit(nb - 1 - i)]   # MSB-first walk
            mult = F.add(F.mul(bit, F.sub(base, one)), one)
            cur = wires[self.wire_intermediate(i)]
            out.append(F.sub(F.mul(F.mul(prev, prev), mult), cur))
            prev = cur
        out.append(F.sub(wires[self.wire_output],
                         wires[self.wire_intermediate(nb - 1)]))
        return out


# ----------------------------------------------------------------------------
# Selectors (plonky2 gates/selectors.rs)
# ----------------------------------------------------------------------------

def compute_selector_groups(gates, max_degree):
    """Group the circuit's gate list (in index order) into contiguous selector
    groups such that gate.degree + |group| - 1 <= max_degree.  Returns a list
    of (start, end) ranges."""
    groups = []
    start = 0
    for i, g in enumerate(gates):
        size = i - start + 1
        worst = max(gates[j].degree() for j in range(start, i + 1))
        if worst + size - 1 > max_degree:
            groups.append((start, i))
            start = i
    groups.append((start, len(gates)))
    return groups


def compute_filter(F, gate_index, group, s, many_groups):
    """prod_{k in group, k != gate_index} (k - s) [* (UNUSED - s)]."""
    acc = F.one()
    for k in range(group[0], group[1]):
        if k == gate_index:
            continue
        acc = F.mul(acc, F.sub(F.from_base(k), s))
    if many_groups:
        acc = F.mul(acc, F.sub(F.from_base(UNUSED_SELECTOR), s))
    return acc


def evaluate_gate_constraints(F, gates, selector_groups, gate_rows_by_index,
                              constants, wires, public_inputs_hash,
                              num_gate_constraints, num_selectors):
    """Sum of filtered per-gate constraints, padded to num_gate_constraints
    (plonky2 plonk_common::evaluate_gate_constraints): term[j] +=
    filter_i * constraint_{i,j} over every gate type i in the circuit."""
    many = num_selectors > 1
    terms = [F.zero() for _ in range(num_gate_constraints)]
    for gi, gate in enumerate(gates):
        group_idx = next(si for si, (a, b) in enumerate(selector_groups)
                         if a <= gi < b)
        s = constants[group_idx]
        filt = compute_filter(F, gi, selector_groups[group_idx], s, many)
        gate_constants = constants[num_selectors:]
        cs = gate.eval(F, gate_constants, wires, public_inputs_hash)
        assert len(cs) <= num_gate_constraints
        for j, c in enumerate(cs):
            terms[j] = F.add(terms[j], F.mul(filt, c))
    return terms
