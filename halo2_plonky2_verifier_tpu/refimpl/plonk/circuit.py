"""plonky2 CircuitBuilder / CircuitData — pure-int reference.

Builds a PLONK circuit over the Goldilocks field with plonky2's layout:

  - one gate per row; rows padded to a power of two with NoopGates;
  - selector polynomials hold the row gate's index in the circuit gate list
    (UNUSED elsewhere), grouped so filtered constraint degree stays within
    the quotient degree factor (gates/selectors.rs semantics);
  - copy constraints over the first `num_routed_wires` columns become sigma
    polynomials: cells of one equivalence class form a cycle, cell (col, row)
    encoded as k_col * g^row with coset shifts k_i = 7^i (plonky2
    get_unique_coset_shifts);
  - the preprocessed oracle (selectors ++ gate constants ++ sigmas) is
    committed once at build time; its cap + a circuit digest form the
    verifier data.

Repo conventions (documented divergences from plonky2, which cannot be
byte-checked without the Rust crate in this environment):
  - circuit_digest = hash_no_pad(flattened constants_sigmas cap ++ [degree_bits])
    (plonky2 hashes a superset of circuit parameters; any fixed binding works
    for Fiat-Shamir domain separation);
  - public-input targets are free wires on a NoopGate row routed by copy
    constraints; the PublicInputGate row constrains its 4 wires to the
    public-input hash exactly as plonky2 does, but the hash is computed by
    the prover out-of-circuit rather than by an in-circuit PoseidonGate
    chain (verifier semantics identical: it recomputes the hash from the
    claimed public inputs, so tampered public inputs are rejected).
"""

from dataclasses import dataclass, field as dc_field
from typing import List, Tuple

from ...utils.config import FriConfig
from .. import field as gl
from ..poseidon import hash_no_pad
from .gates import (
    UNUSED_SELECTOR,
    ArithmeticExtensionGate,
    ArithmeticGate,
    BaseSumGate,
    ConstantGate,
    CosetInterpolationGate,
    ExponentiationGate,
    LookupGate,
    LookupTableGate,
    MulExtensionGate,
    NoopGate,
    PoseidonGate,
    PoseidonMdsGate,
    PublicInputGate,
    RandomAccessGate,
    ReducingExtensionGate,
    ReducingGate,
    compute_selector_groups,
)


@dataclass(frozen=True)
class CircuitConfig:
    num_wires: int = 20
    num_routed_wires: int = 16
    num_challenges: int = 2
    max_quotient_degree_factor: int = 8
    fri_config: FriConfig = dc_field(default_factory=FriConfig)


Target = Tuple[int, int]  # (row, column)


@dataclass(frozen=True)
class LutMeta:
    """Per-lookup-table metadata the vanishing layer needs (plonky2
    CommonCircuitData::luts analog, plus our preprocessed boolean
    lookup-selector column indices)."""
    table: tuple            # ((inp, out), ...) canonical ints
    num_slots: int          # slots per LookupGate/LookupTableGate row
    sel_lk: int             # constants-opening index of the q_lookup column
    sel_tbl: int            # constants-opening index of the q_table column


def compute_circuit_digest(constants_sigmas_cap, degree_bits):
    """Fiat-Shamir binding of the circuit (see module docstring: repo
    convention standing in for plonky2's circuit_digest)."""
    return hash_no_pad(
        [x for h in constants_sigmas_cap for x in h] + [degree_bits])


@dataclass
class CommonCircuitData:
    """Everything both prover and verifier need (plonky2 CommonCircuitData)."""
    config: CircuitConfig
    degree_bits: int
    gates: list                 # gate objects, circuit order (selector order)
    selector_groups: list       # [(start, end)] ranges over `gates`
    gate_instances: list        # per-row (gate_list_index, constants)
    num_gate_constraints: int
    num_constants: int          # selectors + gate constants + lookup selectors
    k_is: list
    luts: list = dc_field(default_factory=list)   # LutMeta per lookup table

    @property
    def num_selectors(self):
        return len(self.selector_groups)

    @property
    def num_lookup_polys(self):
        """Lookup S polynomials committed in the zs_partial_products oracle:
        one per (challenge, lut)."""
        return self.config.num_challenges * len(self.luts)

    @property
    def quotient_degree_factor(self):
        return self.config.max_quotient_degree_factor

    @property
    def num_partial_products(self):
        r = self.config.num_routed_wires
        q = self.quotient_degree_factor
        return (r + q - 1) // q - 1

    @property
    def degree(self):
        return 1 << self.degree_bits

    def fri_params(self):
        return self.config.fri_config.fri_params(self.degree_bits)

    def fri_instance_batches(self, zeta):
        """4-oracle FRI instance (plonky2 CommonCircuitData::get_fri_instance):
        oracle 0 = constants+sigmas, 1 = wires, 2 = zs+partial products,
        3 = quotient; zeta*g batch opens the Zs only."""
        cfg = self.config
        cs = [(0, i) for i in range(self.num_constants + cfg.num_routed_wires)]
        wires = [(1, i) for i in range(cfg.num_wires)]
        zs = [(2, i) for i in range(cfg.num_challenges)]
        npp = cfg.num_challenges * self.num_partial_products
        pps = [(2, cfg.num_challenges + i) for i in range(npp)]
        lus = [(2, cfg.num_challenges + npp + i)
               for i in range(self.num_lookup_polys)]
        quot = [(3, i)
                for i in range(cfg.num_challenges * self.quotient_degree_factor)]
        g_sub = gl.primitive_root_of_unity(self.degree_bits)
        zeta_next = gl.ext_mul(gl.ext_from_base(g_sub), zeta)
        return [(zeta, cs + wires + zs + pps + quot + lus),
                (zeta_next, zs + lus)]


@dataclass
class VerifierCircuitData:
    constants_sigmas_cap: list
    circuit_digest: list        # 4 Goldilocks elements


@dataclass
class ProverCircuitData:
    constants_sigmas_batch: object   # PolynomialBatch
    sigma_values: list               # [col][row] ints (for Z computation)
    representatives: dict            # cell -> representative cell
    input_targets: list


class _UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            p = self.parent[x] = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


class CircuitBuilder:
    def __init__(self, config: CircuitConfig = None):
        self.config = config or CircuitConfig()
        self.rows = []              # (gate object, constants list)
        self.copies = _UnionFind()
        self.public_inputs = []     # targets
        self._input_row = None
        self._input_next = 0
        self._const_rows = []       # (row, used)
        self._const_cache = {}
        self._arith_slots = {}      # (c0, c1) -> (row, next_op)
        self._arith_ext_slots = {}  # (c0, c1) -> (row, next_op)
        self._mul_ext_slot = None   # (row, next_op)
        self.luts = []              # registered lookup tables (tuple of pairs)
        self.lookup_rows = {}       # lut_index -> [rows] (LookupGate rows)
        self._lookup_slot = {}      # lut_index -> [row, next_slot]
        self._ra_slots = {}         # bits -> [row, next_copy]
        self.row_hints = {}         # row -> [(wire, fn, dep_targets)]
        self._hint_row = None
        self._hint_next = 0

    # -- gate allocation ------------------------------------------------------

    def add_gate(self, gate, constants=()):
        self.rows.append((gate, list(constants)))
        return len(self.rows) - 1

    def add_input(self) -> Target:
        """A free routed wire (set from values at prove time)."""
        if self._input_row is None or self._input_next >= self.config.num_routed_wires:
            self._input_row = self.add_gate(NoopGate())
            self._input_next = 0
        t = (self._input_row, self._input_next)
        self._input_next += 1
        return t

    def constant(self, value) -> Target:
        value = value % gl.P
        if value in self._const_cache:
            return self._const_cache[value]
        n = 4
        if not self._const_rows or self._const_rows[-1][1] >= n:
            row = self.add_gate(ConstantGate(n), [0] * n)
            self._const_rows.append([row, 0])
        row, used = self._const_rows[-1]
        self.rows[row][1][used] = value
        self._const_rows[-1][1] += 1
        t = (row, used)
        self._const_cache[value] = t
        return t

    def hint_input(self, fn, deps) -> Target:
        """A free wire whose witness value is computed at fill time as
        fn(*values of deps) — the executor analog of the reference's
        out-of-circuit hints (GoldilocksChip::reduce's quotient/remainder
        witnesses, base.rs:347-368; QuadExt inv hint, extension.rs:321-340).
        The hint alone constrains nothing: the caller must add the binding
        constraint (e.g. x * hint == 1 for an inverse).  The hint lives on a
        NoopGate row placed after every dep's producing row so the
        sequential witness pass sees dep values."""
        deps = list(deps)
        max_dep = max((d[0] for d in deps), default=-1)
        if (self._hint_row is None
                or self._hint_next >= self.config.num_routed_wires
                or self._hint_row < max_dep):
            self._hint_row = self.add_gate(NoopGate())
            self._hint_next = 0
        t = (self._hint_row, self._hint_next)
        self._hint_next += 1
        self.row_hints.setdefault(self._hint_row, []).append(
            (t[1], fn, deps))
        return t

    @staticmethod
    def _max_row(targets):
        return max(t[0] for t in targets)

    def arithmetic(self, c0, c1, m0: Target, m1: Target, addend: Target) -> Target:
        """out = c0 * m0 * m1 + c1 * addend (plonky2 arithmetic op)."""
        key = (c0 % gl.P, c1 % gl.P)
        num_ops = self.config.num_routed_wires // 4
        slot = self._arith_slots.get(key)
        # never reuse a slot row older than any operand's producing row:
        # the witness pass is sequential by row (same rule as add_lookup)
        if (slot is None or slot[1] >= num_ops
                or slot[0] < self._max_row((m0, m1, addend))):
            row = self.add_gate(ArithmeticGate(num_ops), list(key))
            slot = [row, 0]
            self._arith_slots[key] = slot
        row, op = slot
        w = ArithmeticGate.wires_ith_op(op)
        slot[1] += 1
        self.connect(m0, (row, w[0]))
        self.connect(m1, (row, w[1]))
        self.connect(addend, (row, w[2]))
        return (row, w[3])

    def add(self, a, b):
        return self.arithmetic(1, 1, a, self.constant(1), b)

    def sub(self, a, b):
        return self.arithmetic(1, gl.P - 1, a, self.constant(1), b)

    def mul(self, a, b):
        return self.arithmetic(1, 0, a, b, self.constant(0))

    def mul_const(self, c, a):
        """c * a for a host-int constant c."""
        return self.arithmetic(c, 0, a, self.constant(1), self.constant(0))

    def mul_add(self, a, b, c):
        """a * b + c."""
        return self.arithmetic(1, 1, a, b, c)

    def split_le(self, x: Target, num_bits) -> List[Target]:
        """Boolean (base-2) decomposition of x, LSB-first, range-checked by
        a BaseSumGate; x must actually fit num_bits at prove time."""
        assert 1 + num_bits <= self.config.num_routed_wires
        row = self.add_gate(BaseSumGate(num_bits, base=2))
        self.connect(x, (row, 0))
        return [(row, 1 + i) for i in range(num_bits)]

    def exp(self, base: Target, exponent: Target, num_bits) -> Target:
        """base ^ exponent for exponent < 2^num_bits: a boolean split of the
        exponent routed into an ExponentiationGate."""
        gate = ExponentiationGate(num_bits)
        assert gate.num_wires <= self.config.num_wires
        assert gate.wire_output < self.config.num_routed_wires
        bits = self.split_le(exponent, num_bits)
        row = self.add_gate(gate)
        self.connect(base, (row, 0))
        for j, b in enumerate(bits):
            self.connect(b, (row, gate.wire_bit(j)))
        return (row, gate.wire_output)

    def arithmetic_extension(self, c0, c1, m0, m1, addend):
        """Extension-field op out = c0 * m0 * m1 + c1 * addend; operands and
        result are PAIRS of targets (the 2 coordinates of a GF(p^2) element)."""
        key = (c0 % gl.P, c1 % gl.P)
        num_ops = self.config.num_routed_wires // 8
        assert num_ops >= 1
        deps = (*m0, *m1, *addend)
        slot = self._arith_ext_slots.get(key)
        if (slot is None or slot[1] >= num_ops
                or slot[0] < self._max_row(deps)):
            row = self.add_gate(ArithmeticExtensionGate(num_ops), list(key))
            slot = [row, 0]
            self._arith_ext_slots[key] = slot
        row, op = slot
        w = ArithmeticExtensionGate.wires_ith_op(op)
        slot[1] += 1
        for t, wi in zip((m0[0], m0[1], m1[0], m1[1], addend[0], addend[1]),
                         w[:6]):
            self.connect(t, (row, wi))
        return ((row, w[6]), (row, w[7]))

    def zero_extension(self):
        z = self.constant(0)
        return (z, z)

    def add_extension(self, a, b):
        one = self.constant(1)
        return self.arithmetic_extension(1, 1, a, (one, self.constant(0)), b)

    def sub_extension(self, a, b):
        one = self.constant(1)
        return self.arithmetic_extension(
            1, gl.P - 1, a, (one, self.constant(0)), b)

    def mul_extension(self, a, b):
        """Extension multiply through a MulExtensionGate."""
        num_ops = self.config.num_routed_wires // 6
        assert num_ops >= 1
        slot = self._mul_ext_slot
        if (slot is None or slot[1] >= num_ops
                or slot[0] < self._max_row((*a, *b))):
            row = self.add_gate(MulExtensionGate(num_ops), [1])
            slot = self._mul_ext_slot = [row, 0]
        row, op = slot
        w = MulExtensionGate.wires_ith_op(op)
        slot[1] += 1
        for t, wi in zip((a[0], a[1], b[0], b[1]), w[:4]):
            self.connect(t, (row, wi))
        return ((row, w[4]), (row, w[5]))

    def permute_poseidon(self, inputs: List[Target],
                         swap: Target = None) -> List[Target]:
        """One in-circuit Poseidon permutation (PoseidonGate): 12 input
        targets -> 12 output targets.  `swap` (boolean target, default
        constant 0) conditionally exchanges input halves 0..4 and 4..8 —
        the Merkle two_to_one child ordering (plonky2
        CircuitBuilder::permute_swapped)."""
        assert len(inputs) == 12
        gate = PoseidonGate()
        assert gate.num_wires <= self.config.num_wires, \
            "PoseidonGate needs num_wires >= 135"
        assert gate.WIRE_SWAP < self.config.num_routed_wires, \
            "PoseidonGate needs num_routed_wires >= 25 (inputs+outputs+swap)"
        row = self.add_gate(gate)
        if swap is None:
            swap = self.constant(0)
        self.connect(swap, (row, gate.WIRE_SWAP))
        for i, t in enumerate(inputs):
            self.connect(t, (row, gate.wire_input(i)))
        return [(row, gate.wire_output(i)) for i in range(12)]

    def hash_n_to_m_no_pad(self, inputs: List[Target],
                           num_outputs: int = 4) -> List[Target]:
        """In-circuit plonky2 sponge (overwrite-mode rate-8 absorb, one
        PoseidonGate per chunk) — hash_n_to_m_no_pad semantics for
        num_outputs <= 8 (single squeeze)."""
        assert 1 <= num_outputs <= 8
        zero = self.constant(0)
        state = [zero] * 12
        for c0 in range(0, len(inputs), 8):
            chunk = inputs[c0:c0 + 8]
            state = list(chunk) + state[len(chunk):]
            state = self.permute_poseidon(state)
        return state[:num_outputs]

    def random_access(self, index: Target, items: List[Target]) -> Target:
        """claimed = items[index] via a RandomAccessGate copy; items padded
        to a power of two by repeating the last element (index must stay in
        the original range at prove time for meaningful semantics).  Copies
        of the same vector width are packed onto shared rows up to the wire
        budget (plonky2 random_access.rs num_copies); unused copies of a row
        default to the all-zero self-consistent witness."""
        assert items, "random_access needs at least one item"
        bits = max(1, (len(items) - 1).bit_length())
        vec = 1 << bits
        items = list(items) + [items[-1]] * (vec - len(items))
        num_copies = min(self.config.num_routed_wires // (2 + vec),
                         self.config.num_wires // (2 + vec + bits))
        assert num_copies >= 1, "vector too wide for the routed-wire budget"
        slot = self._ra_slots.get(bits)
        if (slot is None or slot[1] >= num_copies
                or slot[0] < self._max_row([index, *items])):
            gate = RandomAccessGate(bits, num_copies)
            assert gate.num_wires <= self.config.num_wires
            row = self.add_gate(gate)
            slot = self._ra_slots[bits] = [row, 0]
        row, c = slot
        slot[1] += 1
        gate = self.rows[row][0]
        self.connect(index, (row, gate.wire_index(c)))
        for i, t in enumerate(items):
            self.connect(t, (row, gate.wire_item(c, i)))
        return (row, gate.wire_claimed(c))

    def _connect_ext(self, pair, row, wires2):
        self.connect(pair[0], (row, wires2[0]))
        self.connect(pair[1], (row, wires2[1]))

    def _reducing_capacity(self, per_coeff_wires):
        """Max coeffs per Reducing(Extension)Gate row under the wire budget:
        routed 6 + per*c, total 4 + (per + 2)*c."""
        cfg = self.config
        c = min((cfg.num_routed_wires - 6) // per_coeff_wires,
                (cfg.num_wires - 4) // (per_coeff_wires + 2))
        assert c >= 1, "config too narrow for a Reducing gate"
        return c

    def _reduce_chunks(self, alpha, coeffs, make_gate, route_coeff, per):
        acc = self.zero_extension()
        cap = self._reducing_capacity(per)
        for lo in range(0, len(coeffs), cap):
            chunk = coeffs[lo:lo + cap]
            gate = make_gate(len(chunk))
            row = self.add_gate(gate)
            self._connect_ext(alpha, row, gate.wires_alpha())
            self._connect_ext(acc, row, gate.wires_old_acc())
            for j, t in enumerate(chunk):
                route_coeff(gate, row, j, t)
            w = gate.wires_output()
            acc = ((row, w[0]), (row, w[1]))
        return acc

    def reduce_with_powers(self, alpha, terms):
        """sum_i alpha^i * terms[i] for BASE-field term targets, alpha an
        extension pair — Horner from the last term through ReducingGate rows
        (plonky2 ReducingFactor::reduce)."""
        return self._reduce_chunks(
            alpha, list(reversed(terms)), ReducingGate,
            lambda g, row, j, t: self.connect(t, (row, g.wire_coeff(j))), 1)

    def reduce_with_powers_ext(self, alpha, terms):
        """sum_i alpha^i * terms[i] for EXTENSION term pairs via
        ReducingExtensionGate rows."""
        return self._reduce_chunks(
            alpha, list(reversed(terms)), ReducingExtensionGate,
            lambda g, row, j, t: self._connect_ext(t, row, g.wires_coeff(j)),
            2)

    def mds_permute_ext(self, state):
        """Poseidon MDS over 12 extension pairs (PoseidonMdsGate)."""
        assert len(state) == 12
        gate = PoseidonMdsGate()
        assert gate.num_wires <= self.config.num_routed_wires, \
            "PoseidonMdsGate needs num_routed_wires >= 48"
        row = self.add_gate(gate)
        for i, pair in enumerate(state):
            self._connect_ext(pair, row, gate.wires_input(i))
        return [tuple((row, w) for w in gate.wires_output(i))
                for i in range(12)]

    def interpolate_coset(self, subgroup_bits, shift, values,
                          evaluation_point, max_degree=6):
        """Interpolate the extension `values` (2^subgroup_bits pairs) on the
        coset shift*H and evaluate at the extension pair `evaluation_point`
        (CosetInterpolationGate — plonky2's recursive-FRI fold step)."""
        gate = CosetInterpolationGate(subgroup_bits, max_degree)
        assert len(values) == gate.num_points
        assert gate.num_routed <= self.config.num_routed_wires, \
            "coset too wide for the routed-wire budget"
        assert gate.num_wires <= self.config.num_wires
        row = self.add_gate(gate)
        self.connect(shift, (row, gate.wire_shift))
        for i, pair in enumerate(values):
            self._connect_ext(pair, row, gate.wires_value(i))
        self._connect_ext(evaluation_point, row,
                          gate.wires_evaluation_point())
        return tuple((row, w) for w in gate.wires_evaluation_value())

    def lookup_slots_per_row(self):
        """Single-chunk logUp: the per-row transition term has degree
        2 + num_slots (q * delta_acc * prod over slots), so the slot count
        is bounded by the quotient degree factor AND the routed-wire budget
        (a LookupGate slot is 2 routed wires)."""
        return max(1, min(self.config.max_quotient_degree_factor - 2,
                          self.config.num_routed_wires // 2))

    def add_lookup_table(self, pairs) -> int:
        """Register a lookup table of (input, output) pairs; returns its
        index (plonky2 CircuitBuilder::add_lookup_table_from_pairs).  Table
        rows (LookupTableGate) are emitted at build()."""
        assert pairs, "empty lookup table"
        self.luts.append(tuple((int(i) % gl.P, int(o) % gl.P)
                               for i, o in pairs))
        return len(self.luts) - 1

    def _pad_lookup_row(self, row, used):
        """Alias a LookupGate row's unused slots to slot 0 (they then
        contribute duplicate lookups, which the multiplicities absorb).
        Must run for EVERY partially-used row — an unconnected slot wire
        defaults to 0 in the witness and LookupGate.fill would then require
        0 to be a table input."""
        L = self.lookup_slots_per_row()
        for s in range(used, L):
            self.connect((row, LookupGate.wire_inp(s)),
                         (row, LookupGate.wire_inp(0)))
            self.connect((row, LookupGate.wire_out(s)),
                         (row, LookupGate.wire_out(0)))

    def add_lookup(self, inp: Target, lut_index: int) -> Target:
        """out = table[inp] via a LookupGate slot (plonky2
        CircuitBuilder::add_lookup_from_index); the logUp argument proves
        (inp, out) is in the table."""
        L = self.lookup_slots_per_row()
        slot = self._lookup_slot.get(lut_index)
        # never reuse a slot row older than the input's producing row: the
        # witness pass is sequential by row, so a lookup row must come after
        # every row its inputs are set on
        if slot is None or slot[1] >= L or inp[0] > slot[0]:
            if slot is not None and slot[1] < L:
                # the abandoned row keeps unconnected slots otherwise
                self._pad_lookup_row(slot[0], slot[1])
            row = self.add_gate(
                LookupGate(L, lut_index, self.luts[lut_index]))
            self.lookup_rows.setdefault(lut_index, []).append(row)
            slot = self._lookup_slot[lut_index] = [row, 0]
        row, s = slot
        slot[1] += 1
        self.connect(inp, (row, LookupGate.wire_inp(s)))
        return (row, LookupGate.wire_out(s))

    def connect(self, a: Target, b: Target):
        assert a[1] < self.config.num_routed_wires
        assert b[1] < self.config.num_routed_wires
        self.copies.union(a, b)

    def register_public_input(self, t: Target):
        self.public_inputs.append(t)

    # -- build ----------------------------------------------------------------

    def build(self):
        cfg = self.config
        # -- lookups: pad open LookupGate rows (unused slots alias slot 0, so
        # they contribute duplicate lookups, which the multiplicities absorb)
        # and emit the LookupTableGate rows (tables live at the end of the
        # circuit, after every looking row — plonky2's layout, and what lets
        # the sequential witness pass count multiplicities) -----------------
        table_rows = {}
        for li in range(len(self.luts)):
            L = self.lookup_slots_per_row()
            slot = self._lookup_slot.get(li)
            if slot is not None and slot[1] < L:
                self._pad_lookup_row(slot[0], slot[1])
            entries = list(self.luts[li])
            pad = -len(entries) % L
            entries.extend([entries[-1]] * pad)
            rows = []
            for lo in range(0, len(entries), L):
                consts = [x for pair in entries[lo:lo + L] for x in pair]
                rows.append(self.add_gate(LookupTableGate(L, li), consts))
            table_rows[li] = rows
        self.add_gate(PublicInputGate())
        # pad rows to a power of two (>= 4 so L_0 / L_last are distinct rows)
        n = max(4, 1 << (len(self.rows) - 1).bit_length())
        while len(self.rows) < n:
            self.add_gate(NoopGate())
        degree_bits = n.bit_length() - 1

        # circuit gate list: unique gate types, sorted by degree descending
        # then id (our deterministic stand-in for plonky2's ordering)
        by_id = {}
        for (g, _) in self.rows:
            by_id.setdefault(g.id(), g)
        gates = sorted(by_id.values(), key=lambda g: (-g.degree(), g.id()))
        gate_index = {g.id(): i for i, g in enumerate(gates)}
        selector_groups = compute_selector_groups(
            gates, cfg.max_quotient_degree_factor)
        num_selectors = len(selector_groups)

        # selector polynomial values
        sel_values = [[UNUSED_SELECTOR] * n for _ in range(num_selectors)]
        for row, (g, _) in enumerate(self.rows):
            gi = gate_index[g.id()]
            grp = next(si for si, (a, b) in enumerate(selector_groups)
                       if a <= gi < b)
            sel_values[grp][row] = gi

        # gate-constant polynomial values
        num_gate_constants = max((g.num_constants for g in gates), default=0)
        const_values = [[0] * n for _ in range(num_gate_constants)]
        for row, (g, consts) in enumerate(self.rows):
            for j, c in enumerate(consts):
                const_values[j][row] = c % gl.P

        # sigma polynomials from the copy-constraint partition
        g_sub = gl.primitive_root_of_unity(degree_bits)
        k_is = [pow(gl.GENERATOR, i, gl.P) for i in range(cfg.num_routed_wires)]
        subgroup = []
        x = 1
        for _ in range(n):
            subgroup.append(x)
            x = x * g_sub % gl.P
        classes = {}
        for row in range(n):
            for col in range(cfg.num_routed_wires):
                rep = self.copies.find((row, col))
                classes.setdefault(rep, []).append((row, col))
        sigma_values = [[0] * n for _ in range(cfg.num_routed_wires)]
        for cells in classes.values():
            for t, (row, col) in enumerate(cells):
                nrow, ncol = cells[(t + 1) % len(cells)]
                sigma_values[col][row] = k_is[ncol] * subgroup[nrow] % gl.P

        # preprocessed boolean lookup-selector columns (q_lookup, q_table per
        # lut), appended after the gate constants so the constants opening
        # carries them (the logUp terms gate on these instead of the generic
        # gate filters, keeping the transition degree at 2 + num_slots)
        lut_sel_values = []
        lut_metas = []
        for li, table in enumerate(self.luts):
            q_lk = [0] * n
            for row in self.lookup_rows.get(li, []):
                q_lk[row] = 1
            q_tbl = [0] * n
            for row in table_rows[li]:
                q_tbl[row] = 1
            base = num_selectors + num_gate_constants + 2 * li
            lut_metas.append(LutMeta(
                table=table, num_slots=self.lookup_slots_per_row(),
                sel_lk=base, sel_tbl=base + 1))
            lut_sel_values.extend([q_lk, q_tbl])

        from ..prover import PolynomialBatch

        cs_values = sel_values + const_values + lut_sel_values + sigma_values
        cs_batch = PolynomialBatch.from_values(
            cs_values, cfg.fri_config.rate_bits, cfg.fri_config.cap_height)

        digest = compute_circuit_digest(cs_batch.merkle_tree.cap, degree_bits)

        common = CommonCircuitData(
            config=cfg,
            degree_bits=degree_bits,
            gates=gates,
            selector_groups=selector_groups,
            gate_instances=[(gate_index[g.id()], consts)
                            for (g, consts) in self.rows],
            num_gate_constraints=max((g.num_constraints() for g in gates),
                                     default=0),
            num_constants=(num_selectors + num_gate_constants
                           + 2 * len(self.luts)),
            k_is=k_is,
            luts=lut_metas,
        )
        verifier_data = VerifierCircuitData(
            constants_sigmas_cap=cs_batch.merkle_tree.cap,
            circuit_digest=digest,
        )
        prover_data = ProverCircuitData(
            constants_sigmas_batch=cs_batch,
            sigma_values=sigma_values,
            representatives={c: self.copies.find(c)
                             for cells in classes.values() for c in cells},
            input_targets=[],
        )
        return common, prover_data, verifier_data, self
