"""plonky2 PLONK prover — pure-int reference (the proof factory for PLONK
verification fixtures; mirrors plonky2 plonk::prover::prove).

Pipeline: fill witness -> commit wires -> betas/gammas -> Z polys + partial
products -> commit -> alphas -> quotient on an oversized coset grid ->
commit -> zeta -> openings -> FRI (reusing refimpl.prover's PolynomialBatch
and fri_prove_openings, which already implement the plonky2 FRI prover)."""

from .. import fft, field as gl
from ..challenger import Challenger
from ..field_ops import BaseOps
from ..poseidon import hash_no_pad
from ..prover import PolynomialBatch, fri_prove_openings
from .gates import (ArithmeticExtensionGate, ArithmeticGate, BaseSumGate,
                    ConstantGate, ExponentiationGate, LookupGate,
                    LookupTableGate, MulExtensionGate, NoopGate, PoseidonGate,
                    PublicInputGate, RandomAccessGate)
from .proof import PlonkOpeningSet, PlonkProof, PlonkProofWithPublicInputs
from .vanishing import eval_vanishing_terms


def fill_witness(builder, common, input_values):
    """Sequential generator pass (builder rows are in dependency order).
    Returns (wire_values[col][row], public_inputs list, pi_hash)."""
    cfg = common.config
    n = common.degree
    uf = builder.copies
    values = {}

    def set_val(t, v):
        rep = uf.find(t)
        assert values.setdefault(rep, v % gl.P) == v % gl.P, \
            f"conflicting witness at {t}"

    def get_val(t):
        return values.get(uf.find(t), 0)

    for t, v in input_values.items():
        set_val(t, v)

    # lookup multiplicity state: per lut, (pair -> remaining count, assigned
    # set).  Counts are computed lazily at the FIRST table row of each lut —
    # by then every LookupGate row of that lut has been filled (tables are
    # emitted at the end of the circuit).
    lut_counts = {}

    def _lookup_counts(li):
        if li not in lut_counts:
            counts = {}
            for lrow in builder.lookup_rows.get(li, []):
                lgate = builder.rows[lrow][0]
                for s in range(lgate.num_slots):
                    pair = (get_val((lrow, lgate.wire_inp(s))),
                            get_val((lrow, lgate.wire_out(s))))
                    counts[pair] = counts.get(pair, 0) + 1
            lut_counts[li] = [counts, set()]
        return lut_counts[li]

    for row, (gate, consts) in enumerate(builder.rows):
        # hint wires on this row (CircuitBuilder.hint_input): computed from
        # earlier rows' values, in registration order
        for (wire, fn, deps) in builder.row_hints.get(row, ()):
            set_val((row, wire), fn(*[get_val(d) for d in deps]))
        if isinstance(gate, ConstantGate):
            for i in range(gate.num_consts):
                set_val((row, i), consts[i])
        elif isinstance(gate, ArithmeticGate):
            c0, c1 = consts[0], consts[1]
            for op in range(gate.num_ops):
                m0, m1, add, out = ArithmeticGate.wires_ith_op(op)
                v = (c0 * get_val((row, m0)) * get_val((row, m1))
                     + c1 * get_val((row, add))) % gl.P
                set_val((row, out), v)
        elif isinstance(gate, BaseSumGate):
            s = get_val((row, 0))
            for i in range(gate.num_limbs):
                set_val((row, 1 + i), s % gate.base)
                s //= gate.base
            assert s == 0, f"value does not fit {gate.id()} at row {row}"
        elif isinstance(gate, ExponentiationGate):
            nb = gate.num_power_bits
            base = get_val((row, 0))
            cur = 1
            for i in range(nb):
                bit = get_val((row, gate.wire_bit(nb - 1 - i)))
                cur = cur * cur * (bit * (base - 1) + 1) % gl.P
                set_val((row, gate.wire_intermediate(i)), cur)
            set_val((row, gate.wire_output), cur)
        elif isinstance(gate, ArithmeticExtensionGate):
            c0, c1 = consts[0], consts[1]
            for op in range(gate.num_ops):
                w = gate.wires_ith_op(op)
                m0 = (get_val((row, w[0])), get_val((row, w[1])))
                m1 = (get_val((row, w[2])), get_val((row, w[3])))
                ad = (get_val((row, w[4])), get_val((row, w[5])))
                v = gl.ext_add(gl.ext_scalar_mul(gl.ext_mul(m0, m1), c0),
                               gl.ext_scalar_mul(ad, c1))
                set_val((row, w[6]), v[0])
                set_val((row, w[7]), v[1])
        elif isinstance(gate, MulExtensionGate):
            c0 = consts[0]
            for op in range(gate.num_ops):
                w = gate.wires_ith_op(op)
                m0 = (get_val((row, w[0])), get_val((row, w[1])))
                m1 = (get_val((row, w[2])), get_val((row, w[3])))
                v = gl.ext_scalar_mul(gl.ext_mul(m0, m1), c0)
                set_val((row, w[4]), v[0])
                set_val((row, w[5]), v[1])
        elif isinstance(gate, RandomAccessGate):
            for c in range(gate.num_copies):
                idx = get_val((row, gate.wire_index(c)))
                assert idx < gate.vec_size, \
                    f"random access index {idx} out of range at row {row}"
                for j in range(gate.bits):
                    set_val((row, gate.wire_bit(c, j)), (idx >> j) & 1)
                set_val((row, gate.wire_claimed(c)),
                        get_val((row, gate.wire_item(c, idx))))
        elif isinstance(gate, LookupTableGate):
            counts, assigned = _lookup_counts(gate.lut_index)
            for s in range(gate.num_slots):
                pair = (consts[2 * s] % gl.P, consts[2 * s + 1] % gl.P)
                if pair in assigned:
                    m = 0                      # duplicate/padding entry
                else:
                    assigned.add(pair)
                    m = counts.get(pair, 0)
                set_val((row, gate.wire_mult(s)), m)
        elif hasattr(gate, "fill"):
            # gates carrying their own witness generator (PoseidonGate,
            # ReducingGate(Extension), PoseidonMdsGate, CosetInterpolationGate,
            # LookupGate)
            gate.fill(row, get_val, set_val)
        elif isinstance(gate, PublicInputGate):
            pis = [get_val(t) for t in builder.public_inputs]
            pi_hash = hash_no_pad(pis)
            for i in range(4):
                set_val((row, i), pi_hash[i])

    pis = [get_val(t) for t in builder.public_inputs]
    pi_hash = hash_no_pad(pis)
    wires = [[0] * n for _ in range(cfg.num_wires)]
    for col in range(cfg.num_wires):
        for row in range(n):
            # unrouted columns carry generator-set values too (e.g. the
            # ExponentiationGate intermediates)
            wires[col][row] = get_val((row, col))
    return wires, pis, pi_hash


def _compute_zs_partial_products(common, prover_data, wires, betas, gammas):
    """plonky2 all_wires_permutation_partial_products: per challenge, the
    Z polynomial (grand product of chunk quotients) and the stored
    intermediate accumulators."""
    cfg = common.config
    n = common.degree
    r = cfg.num_routed_wires
    q = common.quotient_degree_factor
    npp = common.num_partial_products
    g_sub = gl.primitive_root_of_unity(common.degree_bits)
    sigma = prover_data.sigma_values

    zs, pps = [], [[] for _ in range(cfg.num_challenges * npp)]
    for i in range(cfg.num_challenges):
        beta, gamma = betas[i], gammas[i]
        z = [1] * n
        pp_cols = [[0] * n for _ in range(npp)]
        x = 1
        for row in range(n):
            nums, dens = [], []
            for j in range(r):
                w = wires[j][row]
                nums.append((w + beta * common.k_is[j] % gl.P * x + gamma) % gl.P)
                dens.append((w + beta * sigma[j][row] + gamma) % gl.P)
            den_inv = gl.batch_inv(dens)
            acc = z[row]
            t = 0
            for lo in range(0, r, q):
                for j in range(lo, min(lo + q, r)):
                    acc = acc * nums[j] % gl.P * den_inv[j] % gl.P
                if lo + q < r:
                    pp_cols[t][row] = acc
                    t += 1
            if row + 1 < n:
                z[row + 1] = acc
            else:
                assert acc == 1, "grand product does not telescope to 1"
            x = x * g_sub % gl.P
        zs.append(z)
        for t in range(npp):
            pps[i * npp + t] = pp_cols[t]
    return zs, pps


def _compute_lookup_zs(common, wires, deltas):
    """logUp running-sum columns, one per (challenge, lut): S[0] = 0,
    S[row+1] = S[row] + sum_s 1/(b - combo_s) on LookupGate rows
             - sum_s m_s/(b - table_combo_s) on LookupTableGate rows,
    telescoping to 0 over the cycle (multiset inclusion holds)."""
    cfg = common.config
    n = common.degree
    p = gl.P
    out = []
    for i in range(cfg.num_challenges):
        a, b = deltas[2 * i], deltas[2 * i + 1]
        for li, lut in enumerate(common.luts):
            dens, marks = [], []   # marks: (row, +1) looking / (row, -m) table
            for row in range(n):
                gi, consts = common.gate_instances[row]
                gate = common.gates[gi]
                if isinstance(gate, LookupGate) and gate.lut_index == li:
                    for s in range(gate.num_slots):
                        c = (wires[2 * s][row] + a * wires[2 * s + 1][row]) % p
                        dens.append((b - c) % p)
                        marks.append((row, 1))
                elif (isinstance(gate, LookupTableGate)
                      and gate.lut_index == li):
                    for s in range(gate.num_slots):
                        c = (consts[2 * s] + a * consts[2 * s + 1]) % p
                        dens.append((b - c) % p)
                        m = wires[gate.wire_mult(s)][row]
                        marks.append((row, -m))
            inv = gl.batch_inv(dens)
            contrib = [0] * n
            for (row, w), iv in zip(marks, inv):
                contrib[row] = (contrib[row] + w * iv) % p
            S = [0] * n
            for row in range(n - 1):
                S[row + 1] = (S[row] + contrib[row]) % p
            assert (S[n - 1] + contrib[n - 1]) % p == 0, \
                "lookup sums do not telescope: multiplicities are wrong"
            out.append(S)
    return out


def _grid_lde(values_or_coeffs, grid_rate_bits, from_values=True):
    """Base-subgroup values (or coeffs) -> values on the 7 * <g_grid> coset."""
    coeffs = fft.ifft(values_or_coeffs) if from_values else list(values_or_coeffs)
    return fft.coset_fft(fft.lde(coeffs, grid_rate_bits), gl.GENERATOR)


def prove(common, prover_data, builder, input_values):
    """Produce a PlonkProofWithPublicInputs."""
    cfg = common.config
    n = common.degree
    fri_params = common.fri_params()
    rate_bits = cfg.fri_config.rate_bits
    cap_height = cfg.fri_config.cap_height

    wires, pis, pi_hash = fill_witness(builder, common, input_values)

    wires_batch = PolynomialBatch.from_values(wires, rate_bits, cap_height)
    cs_batch = prover_data.constants_sigmas_batch

    from .circuit import compute_circuit_digest

    ch = Challenger()
    ch.observe_hash(compute_circuit_digest(cs_batch.merkle_tree.cap,
                                           common.degree_bits))
    ch.observe_hash(pi_hash)
    ch.observe_cap(wires_batch.merkle_tree.cap)
    betas = ch.get_n_challenges(cfg.num_challenges)
    gammas = ch.get_n_challenges(cfg.num_challenges)

    deltas = (ch.get_n_challenges(2 * cfg.num_challenges)
              if common.luts else [])

    zs, pps = _compute_zs_partial_products(common, prover_data, wires,
                                           betas, gammas)
    lus = _compute_lookup_zs(common, wires, deltas) if common.luts else []
    zs_pp_batch = PolynomialBatch.from_values(zs + pps + lus, rate_bits,
                                              cap_height)
    ch.observe_cap(zs_pp_batch.merkle_tree.cap)
    alphas = ch.get_n_challenges(cfg.num_challenges)

    # ---- quotient on an oversized grid: 2^ceil(log2(qdf))*2 * n points so the
    # trailing coefficients are checkably zero (no silent aliasing) ----------
    q = common.quotient_degree_factor
    grid_rate = max((q - 1).bit_length() + 1, rate_bits)
    grid_n = n << grid_rate
    step = 1 << grid_rate

    num_sel = common.num_selectors
    cs_polys = cs_batch.polynomials
    consts_grid = [_grid_lde(p, grid_rate, from_values=False)
                   for p in cs_polys[:common.num_constants]]
    sigmas_grid = [_grid_lde(p, grid_rate, from_values=False)
                   for p in cs_polys[common.num_constants:]]
    wires_grid = [_grid_lde(p, grid_rate, from_values=False)
                  for p in wires_batch.polynomials]
    zs_grid = [_grid_lde(z, grid_rate) for z in zs]
    pps_grid = [_grid_lde(p, grid_rate) for p in pps]
    lus_grid = [_grid_lde(s, grid_rate) for s in lus]

    p = gl.P
    g_grid = gl.primitive_root_of_unity(common.degree_bits + grid_rate)
    xs = []
    x = gl.GENERATOR
    for _ in range(grid_n):
        xs.append(x)
        x = x * g_grid % p
    z_h = [(pow(x, n, p) - 1) % p for x in xs]
    z_h_inv = gl.batch_inv(z_h)
    l0_den_inv = gl.batch_inv([n * (x - 1) % p for x in xs])

    quotient_values = [[0] * grid_n for _ in alphas]
    for i in range(grid_n):
        i_next = (i + step) % grid_n
        terms = eval_vanishing_terms(
            BaseOps, common, xs[i],
            [c[i] for c in consts_grid], [s[i] for s in sigmas_grid],
            [w[i] for w in wires_grid],
            [z[i] for z in zs_grid], [z[i_next] for z in zs_grid],
            [pp[i] for pp in pps_grid],
            pi_hash, betas, gammas,
            l0=z_h[i] * l0_den_inv[i] % p,
            lookup_zs=[s[i] for s in lus_grid],
            lookup_zs_next=[s[i_next] for s in lus_grid],
            deltas=deltas)
        for a_i, alpha in enumerate(alphas):
            acc = 0
            for t in reversed(terms):
                acc = (acc * alpha + t) % p
            quotient_values[a_i][i] = acc * z_h_inv[i] % p

    quotient_chunks = []
    for vals in quotient_values:
        coeffs = fft.coset_ifft(vals, gl.GENERATOR)
        keep = n * q
        assert all(c == 0 for c in coeffs[keep:]), \
            "quotient is not low-degree: unsatisfied constraints?"
        for start in range(0, keep, n):
            quotient_chunks.append(coeffs[start:start + n])
    quotient_batch = PolynomialBatch(quotient_chunks, rate_bits, cap_height)
    ch.observe_cap(quotient_batch.merkle_tree.cap)

    zeta = ch.get_extension_challenge()
    assert gl.ext_exp_power_of_2(zeta, common.degree_bits) != gl.EXT_ONE

    zs_pp_at_zeta = zs_pp_batch.eval_at_ext(zeta)
    zeta_next = gl.ext_mul(
        gl.ext_from_base(gl.primitive_root_of_unity(common.degree_bits)),
        zeta)
    nc = cfg.num_challenges
    npp_total = nc * common.num_partial_products
    openings = PlonkOpeningSet(
        constants=cs_batch.eval_at_ext(zeta)[:common.num_constants],
        plonk_sigmas=cs_batch.eval_at_ext(zeta)[common.num_constants:],
        wires=wires_batch.eval_at_ext(zeta),
        plonk_zs=zs_pp_at_zeta[:nc],
        plonk_zs_next=[
            fft.eval_poly_ext(poly, zeta_next)
            for poly in zs_pp_batch.polynomials[:nc]],
        partial_products=zs_pp_at_zeta[nc:nc + npp_total],
        quotient_polys=quotient_batch.eval_at_ext(zeta),
        lookup_zs=zs_pp_at_zeta[nc + npp_total:],
        lookup_zs_next=[
            fft.eval_poly_ext(poly, zeta_next)
            for poly in zs_pp_batch.polynomials[nc + npp_total:]],
    )
    for batch in openings.to_fri_openings():
        ch.observe_extension_elements(batch)

    oracles = [cs_batch, wires_batch, zs_pp_batch, quotient_batch]
    instance_batches = common.fri_instance_batches(zeta)
    opening_proof = fri_prove_openings(instance_batches, oracles, ch, fri_params)

    return PlonkProofWithPublicInputs(
        proof=PlonkProof(
            wires_cap=wires_batch.merkle_tree.cap,
            plonk_zs_partial_products_cap=zs_pp_batch.merkle_tree.cap,
            quotient_polys_cap=quotient_batch.merkle_tree.cap,
            openings=openings,
            opening_proof=opening_proof,
        ),
        public_inputs=pis,
    )
