"""Top-level batched STARK verification on TPU (JAX).

Executor form of the reference StarkChip (verifier/src/stark/mod.rs:104-374)
plus ChallengerChip's challenge derivation (challenger/mod.rs:129-222) —
with the vanishing-polynomial / quotient consistency check the reference
leaves WIP (stark/mod.rs:202-321) implemented and ON by default.

`build_verifier(stark, config, degree_bits, check_vanishing=True)` returns a
function `verify(batch: ProofBatch) -> (B,) bool` suitable for jax.jit /
vmap / shard_map.  One compilation serves every batch of the same geometry.
"""

import numpy as np

import jax.numpy as jnp

import jax

from .fri import verify_fri
from .ops import goldilocks as gl
from .ops import goldilocks_ext as gle
from .refimpl import field as gl_int
from .refimpl.prover import eval_permutation_checks, get_permutation_batches
from .transcript import (BN254TranscriptSchedule, TranscriptSchedule, extract,
                         extract_ext, run_schedule, run_schedule_bn254)
from .witness import ProofBatch, canonicality_verdict, proof_shape


class CollectingConsumer:
    """ConstraintConsumer-compatible collector: records (selector, value)
    pairs instead of folding immediately, so the alpha fold can run as one
    lax.scan (deep unrolled chains compile super-linearly)."""

    def __init__(self, F, z_last, lagrange_first, lagrange_last):
        self.F = F
        self.z_last = z_last
        self.lagrange_first = lagrange_first
        self.lagrange_last = lagrange_last
        self.entries = []  # weighted constraint values, in emission order

    def constraint(self, c):
        self.entries.append(c)

    def constraint_transition(self, c):
        self.entries.append(self.F.mul(c, self.z_last))

    def constraint_first_row(self, c):
        self.entries.append(self.F.mul(c, self.lagrange_first))

    def constraint_last_row(self, c):
        self.entries.append(self.F.mul(c, self.lagrange_last))

    def fold(self, alphas_ext):
        """acc_j = fold(acc*alpha_j + c) over entries, one scan, all alphas
        in parallel (alpha axis prepended)."""
        import jax.numpy as jnp

        n_a = len(alphas_ext)
        # alphas stacked on a leading axis
        al = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *alphas_ext)
        ent = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *self.entries)

        def body(acc, c):
            # acc: (n_a, B...) ext; c: (B...) ext broadcast over alpha axis
            cb = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (n_a,) + x.shape), c)
            return gle.add(gle.mul(acc, al), cb), None

        zero = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x), al)
        acc, _ = jax.lax.scan(body, zero, ent)
        # unstack per alpha
        return [jax.tree_util.tree_map(lambda x: x[j], acc) for j in range(n_a)]


class ExtOpsJax:
    """Field-ops adapter over extension lane pairs, for Stark.eval /
    ConstraintConsumer (same interface as refimpl.field_ops.ExtOps)."""

    def __init__(self, batch_shape):
        self.batch_shape = batch_shape

    def zero(self):
        return (gl.zeros(self.batch_shape), gl.zeros(self.batch_shape))

    def one(self):
        return (gl.full(self.batch_shape, 1), gl.zeros(self.batch_shape))

    def add(self, a, b):
        return gle.add(a, b)

    def sub(self, a, b):
        return gle.sub(a, b)

    def mul(self, a, b):
        return gle.mul(a, b)

    def from_base(self, x):
        # host int or gl lane pair
        if isinstance(x, tuple) and isinstance(x[0], int):
            return (gl.full(self.batch_shape, x[0]), gl.full(self.batch_shape, x[1]))
        if isinstance(x, int):
            return (gl.full(self.batch_shape, x), gl.zeros(self.batch_shape))
        return gle.from_base(x)

    def mul_const_small(self, c, a):
        """a * c for a small host int (< 2^16) — 2 gl.mul_const_small instead
        of a full extension multiply (keeps e.g. the PoseidonGate's 4320
        MDS constant-multiplies out of the unrolled-modmul graph budget)."""
        return (gl.mul_const_small(a[0], c), gl.mul_const_small(a[1], c))

    def mul_elems(self, xs, ys):
        """Elementwise [x * y for x, y in zip(xs, ys)] as ONE stacked ext
        multiply (e.g. the PoseidonGate's 12 per-round s-box squarings)."""
        if not xs:
            return []
        import jax
        import jax.numpy as jnp

        from .utils import profiling

        sx = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *xs)
        sy = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *ys)
        with profiling.multiplier(len(xs)):
            out = gle.mul(sx, sy)
        return [jax.tree_util.tree_map(lambda t, i=i: t[i], out)
                for i in range(len(xs))]

    def mul_many(self, a, xs):
        """[a * x for x in xs] as ONE vectorized extension multiply over a
        stacked leading axis (graph-size discipline: an unrolled ext mul is
        ~900 jaxpr eqns, and evaluate_gate_constraints multiplies EVERY
        gate constraint by its filter — ~600 muls for the recursion-mix
        circuit)."""
        if not xs:
            return []
        import jax
        import jax.numpy as jnp

        from .utils import profiling

        stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *xs)
        ab = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (len(xs),) + x.shape), a)
        with profiling.multiplier(len(xs)):
            out = gle.mul(ab, stacked)
        return [jax.tree_util.tree_map(lambda t, i=i: t[i], out)
                for i in range(len(xs))]

    def fold(self, body, carry, xs):
        """Graph-size discipline for F-generic gate evals: run the repeated
        per-step structure as ONE lax.scan trace instead of unrolling (the
        CosetInterpolationGate fold alone is ~275k jaxpr eqns unrolled).
        body(carry, x) -> (carry, y); xs is a list of per-step pytrees of
        F-values; returns (carry, [y_0, ..., y_{n-1}]) like
        refimpl.field_ops.generic_fold."""
        import jax
        import jax.numpy as jnp

        from .utils import profiling

        if not xs:
            return carry, []
        stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *xs)
        with profiling.multiplier(len(xs)):
            carry, ys = jax.lax.scan(body, carry, stacked)
        ys_list = [jax.tree_util.tree_map(lambda a, i=i: a[i], ys)
                   for i in range(len(xs))]
        return carry, ys_list


def _ext_rows(pair):
    """(B, n, 2) gl pair -> list of n ext (B,) values."""
    n = pair[0].shape[1]
    return [
        ((pair[0][:, i, 0], pair[1][:, i, 0]), (pair[0][:, i, 1], pair[1][:, i, 1]))
        for i in range(n)
    ]


def fri_instance_polys(shape):
    """Oracle/polynomial layout (reference: stark/mod.rs:145-200).
    Returns (zeta_polys, zeta_next_polys) as (oracle_index, poly_index) lists."""
    trace = [(0, i) for i in range(shape.num_columns)]
    zs, quot_oracle = [], 1
    if shape.uses_permutation:
        zs = [(1, i) for i in range(shape.num_zs)]
        quot_oracle = 2
    quot = [(quot_oracle, i) for i in range(shape.num_quotient)]
    return trace + zs + quot, trace + zs


def build_merkle_only_verifier(stark, config, degree_bits,
                               hasher="poseidon_goldilocks"):
    """The verifier STRIPPED to its Merkle-path work: same ProofBatch, same
    layouts, the SAME merged-path kernels (fri.merged_merkle_checks) — but
    no transcript, no vanishing check, no FRI arithmetic.  Query indices are
    synthesized with the same shapes/dtypes (path-kernel cost on TPU is
    data-independent: every select/compress is branchless).

    Its throughput is an IN-CONTEXT ceiling for the full verifier:
    bench.py reports integration_efficiency = full_perm_rate /
    stripped_perm_rate, which is falsifiable — it DROPS when integration
    overhead (transcript, folds, layout moves) grows (VERDICT r4 item 2a,
    replacing the clamped max() form)."""
    from .fri import merged_merkle_checks
    from .hashing import get_hash_ops

    shape = proof_shape(stark, config, degree_bits, hasher)
    H = get_hash_ops(hasher)

    def verify(batch: ProofBatch):
        S = batch.shape
        B = batch.batch_size
        Q = batch.initial_evals[0][0].shape[1]
        n_log = S.lde_bits
        # synthetic per-(proof, query) indices, data-dependent on the batch
        # so nothing folds away, uniform over the index range
        base = batch.pow_witness[1][:, None]                   # (B, 1) u32
        q_iota = jnp.arange(Q, dtype=jnp.uint32)[None, :] * np.uint32(2654435761)
        x_index = (base + q_iota) & np.uint32((1 << n_log) - 1)
        cap_index = x_index >> np.uint32(S.initial_depth)
        mk_ok = merged_merkle_checks(S, H, batch, x_index, cap_index)
        # reduce to (B,) like the real verifier so timing includes the same
        # final reduction/fetch shape
        return mk_ok.any(axis=(1, 2))

    return verify


def build_verifier(stark, config, degree_bits, check_vanishing=True,
                   hasher="poseidon_goldilocks", query_shard_axis=None,
                   transcript="poseidon_goldilocks"):
    """Returns verify(batch) -> (B,) bool.  `hasher` selects the Merkle /
    commitment hash backend ("poseidon_goldilocks" or "poseidon_bn254", the
    reference's two configurations).  `transcript` selects the Fiat-Shamir
    sponge: the reference's test configs keep Poseidon-Goldilocks
    (stark/mod.rs:493-499), but ChallengerChip is generic over the
    permutation (challenger/mod.rs:19) — "poseidon_bn254" gives the
    all-BN254 configuration (BN254 Merkle + BN254 sponge).

    `query_shard_axis`: name of a shard_map mesh axis sharding the FRI query
    rounds.  The per-proof work (transcript, vanishing check) replicates per
    shard; each shard verifies its local query slice (Pallas kernels run
    locally — no GSPMD fallback) and the verdict AND-reduces over the axis."""
    from .hashing import get_hash_ops
    from .utils.logging import get_logger

    shape = proof_shape(stark, config, degree_bits, hasher)
    H = get_hash_ops(hasher)
    bn254_sponge = transcript == "poseidon_bn254"
    assert transcript in ("poseidon_goldilocks", "poseidon_bn254")
    get_logger(__name__).info(
        "build_verifier: %s n=2^%d queries=%d arities=%s hasher=%s "
        "transcript=%s vanishing=%s qshard=%s", type(stark).__name__,
        degree_bits, shape.num_queries, list(shape.reduction_arity_bits),
        hasher, transcript, check_vanishing, query_shard_axis)

    from .utils.profiling import scope

    def verify(batch: ProofBatch):
        S = batch.shape
        B = batch.batch_size
        with scope("load_witness"):
            verdict = canonicality_verdict(batch)

        # ------------------------------------------------------------------
        # 1. Transcript: build the static schedule while concatenating the
        #    observed element stream (order = challenger/mod.rs:168-222).
        # ------------------------------------------------------------------
        _tr_scope = scope("get_stark_challenges")
        _tr_scope.__enter__()
        sched = (BN254TranscriptSchedule() if bn254_sponge
                 else TranscriptSchedule())
        parts = []

        def observe(pair):
            flat = (pair[0].reshape(B, -1), pair[1].reshape(B, -1))
            sched.observe(flat[0].shape[1])
            parts.append(flat)

        def observe_cap(cap):
            """Hash-typed cap -> Goldilocks element stream (observe_cap,
            challenger/mod.rs:65-74: per hash, its to_goldilocks_vec)."""
            els = H.to_gl_elements(cap)            # k pairs of (B, cap_size)
            hi = jnp.stack([e[0] for e in els], axis=-1)
            lo = jnp.stack([e[1] for e in els], axis=-1)
            observe((hi, lo))

        observe_cap(batch.trace_cap)

        perm_refs = None
        if S.uses_permutation:
            perm_refs = [
                [(sched.get_challenge(), sched.get_challenge())
                 for _ in range(S.num_challenges)]
                for _ in range(S.num_challenge_sets)
            ]
            observe_cap(batch.zs_cap)

        alpha_refs = sched.get_n_challenges(S.num_challenges)

        observe_cap(batch.quotient_cap)
        zeta_ref = sched.get_extension_challenge()

        # openings in to_fri_openings order (stark/mod.rs:48-70)
        observe(batch.local_values)
        if S.uses_permutation:
            observe(batch.permutation_zs)
        observe(batch.quotient_polys)
        observe(batch.next_values)
        if S.uses_permutation:
            observe(batch.permutation_zs_next)

        fri_alpha_ref = sched.get_extension_challenge()
        beta_refs = []
        for cap in batch.commit_caps:
            observe_cap(cap)
            beta_refs.append(sched.get_extension_challenge())
        observe(batch.final_poly)
        observe((batch.pow_witness[0][:, None], batch.pow_witness[1][:, None]))
        pow_ref = sched.get_challenge()
        query_refs = sched.get_n_challenges(S.num_queries)

        elements = (jnp.concatenate([p[0] for p in parts], axis=1),
                    jnp.concatenate([p[1] for p in parts], axis=1))
        assert elements[0].shape[1] == sched.n_elements
        ys = (run_schedule_bn254(sched, elements) if bn254_sponge
              else run_schedule(sched, elements))

        # ------------------------------------------------------------------
        # 2. Extract challenge values
        # ------------------------------------------------------------------
        zeta = extract_ext(ys, zeta_ref)
        alphas = [extract(ys, r) for r in alpha_refs]
        fri_alpha = extract_ext(ys, fri_alpha_ref)
        fri_betas = [extract_ext(ys, r) for r in beta_refs]
        pow_response = extract(ys, pow_ref)
        # query indices: only low 32 bits needed (lde_bits < 32)
        import numpy as np
        q_steps = np.array([r.step for r in query_refs])
        q_lanes = np.array([r.lane for r in query_refs])
        q_raw = ys[1][q_steps, q_lanes]      # (Q, B) or (Q,)
        query_lo = q_raw.T if q_raw.ndim == 2 else q_raw
        # (B, Q)
        if query_shard_axis is not None:
            q_local = batch.initial_evals[0][0].shape[1]
            start = jax.lax.axis_index(query_shard_axis) * q_local
            query_lo = jax.lax.dynamic_slice_in_dim(
                query_lo, start, q_local, axis=1)

        perm_challenges = None
        if S.uses_permutation:
            perm_challenges = [
                [(extract(ys, b), extract(ys, g)) for (b, g) in cset]
                for cset in perm_refs
            ]
        _tr_scope.__exit__(None, None, None)

        # ------------------------------------------------------------------
        # 3. Vanishing polynomial / quotient consistency at zeta
        #    (the reference's WIP check, reconstructed; stark/mod.rs:253-321)
        # ------------------------------------------------------------------
        g_sub = gl_int.primitive_root_of_unity(S.degree_bits)
        n = 1 << S.degree_bits
        if check_vanishing:
          with scope("vanishing_poly_check"):
            F = ExtOpsJax((B,))
            one = F.one()
            zeta_pow_n = gle.exp_power_of_2(zeta, S.degree_bits)
            z_h_zeta = gle.sub(zeta_pow_n, one)
            l0_den = gle.scalar_mul(gle.sub(zeta, one), gl.full((B,), n))
            llast_den = gle.scalar_mul(
                gle.sub(gle.scalar_mul(zeta, gl.full((B,), g_sub)), one),
                gl.full((B,), n))
            l0_den_inv, llast_den_inv = gle.inv_pair(l0_den, llast_den)
            l0 = gle.mul(z_h_zeta, l0_den_inv)
            llast = gle.mul(z_h_zeta, llast_den_inv)
            z_last = gle.sub(zeta, F.from_base(pow(g_sub, n - 1, gl_int.P)))

            alphas_ext = [gle.from_base(a) for a in alphas]
            consumer = CollectingConsumer(F, z_last, l0, llast)
            local = _ext_rows(batch.local_values)
            nxt = _ext_rows(batch.next_values)
            pis = [gle.from_base((batch.public_inputs[0][:, i],
                                  batch.public_inputs[1][:, i]))
                   for i in range(S.num_public_inputs)]
            stark.eval(F, local, nxt, pis, consumer)
            if S.uses_permutation:
                batches = get_permutation_batches(
                    stark.permutation_pairs(), perm_challenges,
                    S.num_challenges, stark.permutation_batch_size())
                eval_permutation_checks(
                    F, local, _ext_rows(batch.permutation_zs),
                    _ext_rows(batch.permutation_zs_next), batches, consumer)

            accumulators = consumer.fold(alphas_ext)
            quot_rows = _ext_rows(batch.quotient_polys)
            factor = len(quot_rows) // S.num_challenges
            for i, acc in enumerate(accumulators):
                chunk = quot_rows[i * factor:(i + 1) * factor]
                recombined = gle.reduce_with_powers(chunk, zeta_pow_n)
                ok = gle.eq(gle.mul(z_h_zeta, recombined), acc)
                verdict = verdict & ok

        # ------------------------------------------------------------------
        # 4. FRI
        # ------------------------------------------------------------------
        zeta_next = gle.scalar_mul(zeta, gl.full((B,), g_sub))
        zeta_polys, zeta_next_polys = fri_instance_polys(S)
        openings_zeta = (_ext_rows(batch.local_values)
                         + (_ext_rows(batch.permutation_zs) if S.uses_permutation else [])
                         + _ext_rows(batch.quotient_polys))
        openings_zeta_next = (_ext_rows(batch.next_values)
                              + (_ext_rows(batch.permutation_zs_next)
                                 if S.uses_permutation else []))
        challenges = {
            "fri_alpha": fri_alpha,
            "fri_betas": fri_betas,
            "fri_pow_response": pow_response,
            "query_lo": query_lo,
            "instance_batches": [(zeta, zeta_polys), (zeta_next, zeta_next_polys)],
            "openings_batches": [openings_zeta, openings_zeta_next],
        }
        verdict = verify_fri(shape, batch, challenges, verdict)
        if query_shard_axis is not None:
            # AND across query shards (the psum-style collective the survey
            # calls for; SURVEY.md §2c)
            verdict = jax.lax.pmin(
                verdict.astype(jnp.int32), query_shard_axis) == 1
        return verdict

    return verify
