"""starky-compatible STARK prover (pure-int reference) — the proof factory.

Replicates the starky/plonky2 proving pipeline value-for-value so that the TPU
verifier has end-to-end fixtures without Rust in the environment (SURVEY.md §7
step 8):

  trace commit -> permutation challenges -> Z polys commit -> alphas ->
  quotient commit -> zeta -> openings -> FRI (alpha-batched quotients,
  commit-phase folding, PoW grinding, query rounds)

Transcript order mirrors the reference verifier's challenge derivation
(verifier/src/challenger/mod.rs:129-222) exactly — that is what makes the
proofs verifiable.  Commitment layout (LDE on the shift-7 coset, bit-reversed
leaf order, cap height) mirrors plonky2 PolynomialBatch / MerkleTree.
"""

from itertools import product as iter_product

from ..models.base import ConstraintConsumer
from ..utils.config import StarkConfig
from . import fft, field as gl
from .challenger import Challenger
from .field_ops import BaseOps
from .merkle import MerkleTree
from .proof import (
    FriInitialTreeProof,
    FriProof,
    FriQueryRound,
    FriQueryStep,
    MerkleProof,
    StarkOpeningSet,
    StarkProof,
    StarkProofWithPublicInputs,
)


class PolynomialBatch:
    """plonky2 fri::oracle::PolynomialBatch: commit to a batch of polynomials
    via Merkle tree over bit-reversed LDE rows."""

    def __init__(self, polynomials, rate_bits, cap_height, hasher=None):
        from .hashers import GOLDILOCKS
        hasher = hasher or GOLDILOCKS
        # polynomials: list of coefficient lists (all same length, power of 2)
        self.polynomials = polynomials
        self.rate_bits = rate_bits
        degree = len(polynomials[0])
        self.degree_bits = degree.bit_length() - 1
        # LDE values on the coset 7 * <g>, natural order
        self.lde_values = [
            fft.coset_fft(fft.lde(p, rate_bits), gl.GENERATOR) for p in polynomials
        ]
        # leaves[i] = all polys evaluated at domain point rev(i)
        n_lde = len(self.lde_values[0])
        rows = [[col[i] for col in self.lde_values] for i in range(n_lde)]
        leaves = fft.reverse_index_bits(rows)
        self.merkle_tree = MerkleTree(leaves, cap_height, hasher)

    @staticmethod
    def from_values(values, rate_bits, cap_height, hasher=None):
        return PolynomialBatch([fft.ifft(v) for v in values], rate_bits,
                               cap_height, hasher)

    def eval_at_ext(self, point):
        return [fft.eval_poly_ext(p, point) for p in self.polynomials]


# ----------------------------------------------------------------------------
# Permutation argument (starky::permutation)
# ----------------------------------------------------------------------------

def get_permutation_challenge_sets(challenger, num_challenges, num_sets):
    """num_sets sets of num_challenges (beta, gamma) pairs, drawn in order."""
    return [
        [(challenger.get_challenge(), challenger.get_challenge())
         for _ in range(num_challenges)]
        for _ in range(num_sets)
    ]


def get_permutation_batches(permutation_pairs, challenge_sets, num_challenges, batch_size):
    """starky get_permutation_batches: instances = pairs x challenge-indices,
    chunked; instance i within a batch uses challenge_sets[i].challenges[chal]."""
    instances = list(iter_product(permutation_pairs, range(num_challenges)))
    batches = []
    for start in range(0, len(instances), batch_size):
        chunk = instances[start:start + batch_size]
        batches.append([
            (pair, challenge_sets[i][chal]) for i, (pair, chal) in enumerate(chunk)
        ])
    return batches


def compute_permutation_z_polys(stark, config, trace_values, challenge_sets):
    """One Z polynomial (in value form) per batch: partial products of
    prod(reduced_lhs) / prod(reduced_rhs) with Z[0] = 1."""
    degree = len(trace_values[0])
    batches = get_permutation_batches(
        stark.permutation_pairs(), challenge_sets,
        config.num_challenges, stark.permutation_batch_size())
    z_polys = []
    for instances in batches:
        numerator = [1] * degree
        denominator = [1] * degree
        for (pair, (beta, gamma)) in instances:
            red_l = [gamma] * degree
            red_r = [gamma] * degree
            w = 1
            for (lhs, rhs) in pair.column_pairs:
                for r in range(degree):
                    red_l[r] = (red_l[r] + w * trace_values[lhs][r]) % gl.P
                    red_r[r] = (red_r[r] + w * trace_values[rhs][r]) % gl.P
                w = w * beta % gl.P
            for r in range(degree):
                numerator[r] = numerator[r] * red_l[r] % gl.P
                denominator[r] = denominator[r] * red_r[r] % gl.P
        den_inv = gl.batch_inv(denominator)
        quotients = [n * d % gl.P for n, d in zip(numerator, den_inv)]
        z = []
        acc = 1
        for q in quotients:
            z.append(acc)
            acc = acc * q % gl.P
        z_polys.append(z)
    return z_polys


# ----------------------------------------------------------------------------
# Quotient polynomials
# ----------------------------------------------------------------------------

def compute_quotient_polys(stark, config, trace_batch, z_batch, challenge_sets,
                           public_inputs, alphas, degree_bits):
    """Evaluate the alpha-folded vanishing polynomial on the full LDE coset and
    divide by Z_H pointwise; returns num_challenges coefficient lists of the
    (degree * quotient_degree_factor)-length quotients."""
    p = gl.P
    rate_bits = config.fri_config.rate_bits
    n = 1 << degree_bits
    lde_n = n << rate_bits
    step = 1 << rate_bits  # index distance corresponding to multiplication by g

    g_sub = gl.primitive_root_of_unity(degree_bits)
    g_lde = gl.primitive_root_of_unity(degree_bits + rate_bits)
    last = pow(g_sub, n - 1, p)

    # domain points x_i = 7 * g_lde^i
    xs = []
    x = gl.GENERATOR
    for _ in range(lde_n):
        xs.append(x)
        x = x * g_lde % p

    z_h = [(pow(x, n, p) - 1) % p for x in xs]          # Z_H(x) = x^n - 1
    z_h_inv = gl.batch_inv(z_h)
    # L_0(x) = Z_H(x) / (n (x - 1));  L_last(x) = Z_H(x) / (n (g x - 1))
    l0_den = gl.batch_inv([n * (x - 1) % p for x in xs])
    llast_den = gl.batch_inv([n * (g_sub * x % p - 1) % p for x in xs])

    trace_lde = trace_batch.lde_values
    z_lde = z_batch.lde_values if z_batch is not None else None

    batches = None
    if stark.uses_permutation_args():
        batches = get_permutation_batches(
            stark.permutation_pairs(), challenge_sets,
            config.num_challenges, stark.permutation_batch_size())

    quotient_values = [[0] * lde_n for _ in alphas]
    F = BaseOps
    for i in range(lde_n):
        x = xs[i]
        i_next = (i + step) % lde_n
        local = [col[i] for col in trace_lde]
        nxt = [col[i_next] for col in trace_lde]
        consumer = ConstraintConsumer(
            F, alphas,
            z_last=(x - last) % p,
            lagrange_first=z_h[i] * l0_den[i] % p,
            lagrange_last=z_h[i] * llast_den[i] % p,
        )
        stark.eval(F, local, nxt, public_inputs, consumer)
        if batches is not None:
            local_zs = [col[i] for col in z_lde]
            next_zs = [col[i_next] for col in z_lde]
            eval_permutation_checks(
                F, local, local_zs, next_zs, batches, consumer)
        for a_i in range(len(alphas)):
            quotient_values[a_i][i] = consumer.accumulators[a_i] * z_h_inv[i] % p

    factor = stark.quotient_degree_factor()
    out = []
    for vals in quotient_values:
        coeffs = fft.coset_ifft(vals, gl.GENERATOR)
        # trim_to_len: everything above degree*factor must vanish, else the
        # vanishing polynomial was not divisible by Z_H (constraints violated).
        keep = n * factor
        assert all(c == 0 for c in coeffs[keep:]), \
            "quotient is not low-degree: constraints unsatisfied?"
        out.append(coeffs[:keep])
    return out


def eval_permutation_checks(F, local_values, local_zs, next_zs, batches, consumer):
    """starky eval_permutation_checks: Z(first)=1 per Z poly, then per batch
    Z(gx) * prod(reduced_rhs) - Z(x) * prod(reduced_lhs) on all rows."""
    one = F.one()
    for z in local_zs:
        consumer.constraint_first_row(F.sub(z, one))
    for i, instances in enumerate(batches):
        red_l_prod = one
        red_r_prod = one
        for (pair, (beta, gamma)) in instances:
            red_l = F.from_base(gamma) if hasattr(F, "from_base") else gamma
            red_r = red_l
            w = one
            for (lhs, rhs) in pair.column_pairs:
                red_l = F.add(red_l, F.mul(w, local_values[lhs]))
                red_r = F.add(red_r, F.mul(w, local_values[rhs]))
                w = F.mul(w, F.from_base(beta))
            red_l_prod = F.mul(red_l_prod, red_l)
            red_r_prod = F.mul(red_r_prod, red_r)
        consumer.constraint(
            F.sub(F.mul(next_zs[i], red_r_prod), F.mul(local_zs[i], red_l_prod)))


# ----------------------------------------------------------------------------
# FRI prover (plonky2 fri::prover)
# ----------------------------------------------------------------------------

def _divide_by_linear_ext(coeffs, z):
    """Synthetic division of an extension-coefficient poly by (X - z);
    returns the quotient (remainder = value at z, dropped)."""
    q = [gl.EXT_ZERO] * (len(coeffs) - 1)
    acc = gl.EXT_ZERO
    for i in range(len(coeffs) - 1, 0, -1):
        acc = gl.ext_add(coeffs[i], gl.ext_mul(acc, z))
        q[i - 1] = acc
    return q


def _coset_fft_ext(coeffs, shift):
    a = fft.coset_fft([c[0] for c in coeffs], shift)
    b = fft.coset_fft([c[1] for c in coeffs], shift)
    return list(zip(a, b))


def fri_prove_openings(instance_batches, oracles, challenger, fri_params,
                       hasher=None):
    from .hashers import GOLDILOCKS
    hasher = hasher or GOLDILOCKS
    """plonky2 PolynomialBatch::prove_openings + fri_proof.

    instance_batches: list of (point_ext, [(oracle_index, polynomial_index)]).
    oracles: list of PolynomialBatch in oracle-index order.
    """
    alpha = challenger.get_extension_challenge()

    final_poly = []  # extension coefficients
    count = 0
    for (point, polys) in instance_batches:
        # composition = sum_i alpha^i * poly_i   (ReducingFactor::reduce_polys_base)
        max_len = max(len(oracles[oi].polynomials[pi]) for (oi, pi) in polys)
        comp = [gl.EXT_ZERO] * max_len
        a_pow = gl.EXT_ONE
        for (oi, pi) in polys:
            poly = oracles[oi].polynomials[pi]
            for j, c in enumerate(poly):
                comp[j] = gl.ext_add(comp[j], gl.ext_scalar_mul(a_pow, c))
            a_pow = gl.ext_mul(a_pow, alpha)
            count += 1
        quotient = _divide_by_linear_ext(comp, point)
        quotient.append(gl.EXT_ZERO)  # pad back to power of 2
        # alpha.shift_poly(&mut final_poly); final_poly += quotient
        shift = gl.ext_exp(alpha, count)
        count = 0
        if len(final_poly) < len(quotient):
            final_poly += [gl.EXT_ZERO] * (len(quotient) - len(final_poly))
        final_poly = [
            gl.ext_add(gl.ext_mul(f, shift), q)
            for f, q in zip(final_poly, quotient + [gl.EXT_ZERO] * (len(final_poly) - len(quotient)))
        ]

    rate_bits = fri_params.config.rate_bits
    lde_final_coeffs = final_poly + [gl.EXT_ZERO] * (len(final_poly) * ((1 << rate_bits) - 1))
    lde_final_values = _coset_fft_ext(lde_final_coeffs, gl.GENERATOR)

    return _fri_proof(
        [o.merkle_tree for o in oracles],
        lde_final_coeffs, lde_final_values, challenger, fri_params, hasher)


def _fri_proof(initial_trees, coeffs, values, challenger, fri_params, hasher):
    cap_height = fri_params.config.cap_height
    n = len(values)

    # --- commit phase (plonky2 fri_committed_trees) -------------------------
    trees = []
    shift = gl.GENERATOR
    for arity_bits in fri_params.reduction_arity_bits:
        arity = 1 << arity_bits
        values_brv = fft.reverse_index_bits(values)
        leaves = [
            [x for e in values_brv[i:i + arity] for x in e]  # flatten ext pairs
            for i in range(0, len(values_brv), arity)
        ]
        tree = MerkleTree(leaves, cap_height, hasher)
        challenger.observe_cap(tree.cap, hasher)
        trees.append(tree)
        beta = challenger.get_extension_challenge()
        # P(x) = sum_i x^i P_i(x^arity)  ->  sum_i beta^i P_i(x)
        coeffs = [
            gl.reduce_with_powers_ext(coeffs[i:i + arity], beta)
            for i in range(0, len(coeffs), arity)
        ]
        shift = pow(shift, arity, gl.P)
        values = _coset_fft_ext(coeffs, shift)

    # coefficients above the final degree must be zero
    keep = len(coeffs) >> fri_params.config.rate_bits
    assert all(c == gl.EXT_ZERO for c in coeffs[keep:])
    final_coeffs = coeffs[:keep]
    challenger.observe_extension_elements(final_coeffs)

    # --- PoW phase (plonky2 fri_proof_of_work; deterministic search) --------
    pow_witness = _grind_proof_of_work(
        challenger, fri_params.config.proof_of_work_bits)
    challenger.observe_element(pow_witness)
    challenger.get_challenge()  # pow_response drawn on the main transcript

    # --- query phase --------------------------------------------------------
    query_rounds = []
    for _ in range(fri_params.config.num_query_rounds):
        x = challenger.get_challenge()
        x_index = x % n
        initial = FriInitialTreeProof(evals_proofs=[
            (list(t.leaves[x_index]), MerkleProof(siblings=t.prove(x_index)))
            for t in initial_trees
        ])
        steps = []
        xi = x_index
        for i, arity_bits in enumerate(fri_params.reduction_arity_bits):
            tree = trees[i]
            leaf = tree.leaves[xi >> arity_bits]
            evals = [(leaf[2 * j], leaf[2 * j + 1]) for j in range(len(leaf) // 2)]
            steps.append(FriQueryStep(
                evals=evals,
                merkle_proof=MerkleProof(siblings=tree.prove(xi >> arity_bits)),
            ))
            xi >>= arity_bits
        query_rounds.append(FriQueryRound(initial_trees_proof=initial, steps=steps))

    return FriProof(
        commit_phase_merkle_caps=[t.cap for t in trees],
        query_round_proofs=query_rounds,
        final_poly=final_coeffs,
        pow_witness=pow_witness,
    )


def _clone_challenger(ch):
    c = type(ch)()
    c.sponge_state = list(ch.sponge_state)
    c.input_buffer = list(ch.input_buffer)
    c.output_buffer = list(ch.output_buffer)
    return c


def _grind_proof_of_work(challenger, pow_bits, batch=8192):
    """Find the smallest witness w such that observing w and squeezing yields a
    challenge < 2^(64 - pow_bits).  Semantics match plonky2's fork-per-candidate
    search; executed in numpy batches: absorb the pending full rate-chunks
    once, then each candidate costs a single batched permutation with the
    pending tail and w overwriting the rate prefix."""
    import numpy as np

    if not isinstance(challenger, Challenger):
        # non-GL sponge (e.g. BN254Challenger): fork-per-candidate search
        # through the exact challenger semantics — fine for the small
        # pow_bits the BN254-sponge fixtures use
        threshold = 1 << (64 - pow_bits)
        w = 0
        while True:
            fork = _clone_challenger(challenger)
            fork.observe_element(w)
            if fork.get_challenge() < threshold:
                return w
            w += 1

    from .goldilocks_numpy import permute_batch
    from .poseidon import SPONGE_RATE, SPONGE_WIDTH

    threshold = 1 << (64 - pow_bits)
    fork = _clone_challenger(challenger)
    pending = list(fork.input_buffer)
    state = list(fork.sponge_state)
    # absorb all full rate-chunks (shared across candidates)
    n_full = (len(pending) // SPONGE_RATE) * SPONGE_RATE
    from .poseidon import permute as _permute
    for i in range(0, n_full, SPONGE_RATE):
        state[:SPONGE_RATE] = pending[i:i + SPONGE_RATE]
        state = _permute(state)
    tail = pending[n_full:]
    r = len(tail)

    from . import native_backend as nb
    if nb.available():
        w = nb.pow_grind(np.array(state, dtype=np.uint64),
                         np.array(tail, dtype=np.uint64), pow_bits)
        check = _clone_challenger(challenger)
        check.observe_element(w)
        assert check.get_challenge() < threshold
        return w

    base = np.zeros((batch, SPONGE_WIDTH), dtype=np.uint64)
    base[:] = np.array(state, dtype=np.uint64)
    base[:, :r] = np.array(tail, dtype=np.uint64)
    start = 0
    while True:
        cand = np.arange(start, start + batch, dtype=np.uint64)
        states = base.copy()
        states[:, r] = cand
        out = permute_batch(states)
        hits = np.nonzero(out[:, SPONGE_RATE - 1] < np.uint64(threshold))[0]
        if hits.size:
            w = int(cand[hits[0]])
            # sanity: replay through the exact challenger semantics
            check = _clone_challenger(challenger)
            check.observe_element(w)
            assert check.get_challenge() < threshold
            return w
        start += batch


# ----------------------------------------------------------------------------
# Top-level prover (starky::prover::prove)
# ----------------------------------------------------------------------------

def fri_instance_batches(stark, config, zeta, g_sub):
    """Oracle/batch layout (reference: verifier/src/stark/mod.rs:145-200):
    oracle 0 = trace, oracle 1 = permutation Zs (if any), last oracle =
    quotient; zeta batch = trace+zs+quotient, zeta*g batch = trace+zs."""
    oracles = []
    trace_info = [(0, i) for i in range(stark.COLUMNS)]
    oracles.append(stark.COLUMNS)
    zs_info = []
    if stark.uses_permutation_args():
        num_z = stark.num_permutation_batches(config)
        zs_info = [(len(oracles), i) for i in range(num_z)]
        oracles.append(num_z)
    num_quot = stark.quotient_degree_factor() * config.num_challenges
    quotient_info = [(len(oracles), i) for i in range(num_quot)]
    oracles.append(num_quot)

    zeta_next = gl.ext_mul(gl.ext_from_base(g_sub), zeta)
    return [
        (zeta, trace_info + zs_info + quotient_info),
        (zeta_next, trace_info + zs_info),
    ]


def make_challenger(transcript="poseidon_goldilocks"):
    """Transcript sponge factory (the reference ChallengerChip is generic
    over PermutationChip, challenger/mod.rs:19: GL or BN254 sponge)."""
    if transcript == "poseidon_goldilocks":
        return Challenger()
    if transcript == "poseidon_bn254":
        from .challenger import BN254Challenger
        return BN254Challenger()
    raise ValueError(f"unknown transcript backend {transcript!r}")


def prove(stark, config: StarkConfig, trace_values, public_inputs, hasher=None,
          transcript="poseidon_goldilocks"):
    """Produce a StarkProofWithPublicInputs for `stark` on `trace_values`
    (column-major list of value lists).

    `hasher` selects the Merkle/commitment hash (hashers.GOLDILOCKS default,
    hashers.BN254 for the PoseidonBN128GoldilocksConfig analog); `transcript`
    selects the Fiat-Shamir sponge — the reference's test configs keep the
    Goldilocks sponge (stark/mod.rs:493-499), but the ChallengerChip trait is
    generic over the permutation (challenger/mod.rs:19), and
    transcript="poseidon_bn254" instantiates the all-BN254 configuration."""
    from .hashers import GOLDILOCKS
    hasher = hasher or GOLDILOCKS
    degree = len(trace_values[0])
    degree_bits = degree.bit_length() - 1
    assert 1 << degree_bits == degree
    fri_params = config.fri_params(degree_bits)
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    assert fri_params.total_arities <= degree_bits + rate_bits - cap_height, \
        "FRI total reduction arity is too large"

    trace_batch = PolynomialBatch.from_values(trace_values, rate_bits,
                                              cap_height, hasher)
    challenger = make_challenger(transcript)
    challenger.observe_cap(trace_batch.merkle_tree.cap, hasher)

    # Permutation argument
    z_batch = None
    challenge_sets = None
    if stark.uses_permutation_args():
        challenge_sets = get_permutation_challenge_sets(
            challenger, config.num_challenges, stark.permutation_batch_size())
        z_polys = compute_permutation_z_polys(stark, config, trace_values, challenge_sets)
        z_batch = PolynomialBatch.from_values(z_polys, rate_bits, cap_height,
                                              hasher)
        challenger.observe_cap(z_batch.merkle_tree.cap, hasher)

    alphas = challenger.get_n_challenges(config.num_challenges)

    quotient_polys = compute_quotient_polys(
        stark, config, trace_batch, z_batch, challenge_sets,
        public_inputs, alphas, degree_bits)
    # split each quotient into degree-n chunks
    chunks = []
    for q in quotient_polys:
        for start in range(0, len(q), degree):
            chunks.append(q[start:start + degree])
    quotient_batch = PolynomialBatch(chunks, rate_bits, cap_height, hasher)
    challenger.observe_cap(quotient_batch.merkle_tree.cap, hasher)

    zeta = challenger.get_extension_challenge()
    g_sub = gl.primitive_root_of_unity(degree_bits)
    assert gl.ext_exp_power_of_2(zeta, degree_bits) != gl.EXT_ONE, \
        "opening point is in the subgroup"
    zeta_next = gl.ext_mul(gl.ext_from_base(g_sub), zeta)

    openings = StarkOpeningSet(
        local_values=trace_batch.eval_at_ext(zeta),
        next_values=trace_batch.eval_at_ext(zeta_next),
        permutation_zs=z_batch.eval_at_ext(zeta) if z_batch else None,
        permutation_zs_next=z_batch.eval_at_ext(zeta_next) if z_batch else None,
        quotient_polys=quotient_batch.eval_at_ext(zeta),
    )
    for batch in openings.to_fri_openings():
        challenger.observe_extension_elements(batch)

    oracles = [trace_batch] + ([z_batch] if z_batch else []) + [quotient_batch]
    batches = fri_instance_batches(stark, config, zeta, g_sub)
    opening_proof = fri_prove_openings(batches, oracles, challenger,
                                       fri_params, hasher)

    proof = StarkProof(
        trace_cap=trace_batch.merkle_tree.cap,
        permutation_zs_cap=z_batch.merkle_tree.cap if z_batch else None,
        quotient_polys_cap=quotient_batch.merkle_tree.cap,
        openings=openings,
        opening_proof=opening_proof,
    )
    return StarkProofWithPublicInputs(proof=proof, public_inputs=list(public_inputs))
