"""Batched plonky2 PLONK verification on TPU (JAX) — the lane-parallel
counterpart of refimpl/plonk/verifier.py.

Covers the reference's WIP roadmap item "PLONK verification"
(/root/reference/README.md:5-12) end-to-end on TPU: the whole transcript as
one fused scan/kernel, gate-constraint evaluation with selector filters at
zeta over extension lanes, partial-products Z checks, quotient consistency,
and the 4-oracle FRI instance through the same fused Merkle/FRI path as the
STARK verifier (fri.py).

`build_plonk_verifier(common, verifier_data)` returns verify(batch) -> (B,)
bool; one compilation serves every batch against the same circuit.
"""

from dataclasses import dataclass
from typing import List

import numpy as np

import jax.numpy as jnp

from .fri import verify_fri
from .ops import goldilocks as gl
from .ops import goldilocks_ext as gle
from .ops import poseidon
from .refimpl import field as gl_int
from .refimpl.plonk.vanishing import eval_vanishing_terms
from .stark import ExtOpsJax, _ext_rows
from .transcript import TranscriptSchedule, extract, extract_ext, run_schedule
from .utils.profiling import scope
from .witness import _u64


@dataclass(frozen=True)
class PlonkProofShape:
    """Static PLONK proof geometry (fixed by the circuit's CommonCircuitData)."""
    num_wires: int
    num_routed_wires: int
    num_challenges: int
    num_constants: int          # selectors + gate constants
    num_partial_products: int
    quotient_degree_factor: int
    num_public_inputs: int
    cap_size: int
    lde_bits: int
    initial_depth: int
    reduction_arity_bits: tuple
    final_poly_len: int
    num_queries: int
    proof_of_work_bits: int
    degree_bits: int
    hasher: str = "poseidon_goldilocks"
    num_lookup_polys: int = 0   # logUp S polys (num_challenges * num_luts)

    @property
    def step_depths(self):
        depths = []
        bits = self.initial_depth
        for ab in self.reduction_arity_bits:
            bits -= ab
            depths.append(bits)
        return tuple(depths)

    @property
    def oracle_widths(self):
        return (self.num_constants + self.num_routed_wires,
                self.num_wires,
                self.num_challenges * (1 + self.num_partial_products)
                + self.num_lookup_polys,
                self.num_challenges * self.quotient_degree_factor)


def plonk_proof_shape(common, num_public_inputs) -> PlonkProofShape:
    cfg = common.config
    fri_params = common.fri_params()
    return PlonkProofShape(
        num_wires=cfg.num_wires,
        num_routed_wires=cfg.num_routed_wires,
        num_challenges=cfg.num_challenges,
        num_constants=common.num_constants,
        num_partial_products=common.num_partial_products,
        quotient_degree_factor=common.quotient_degree_factor,
        num_public_inputs=num_public_inputs,
        cap_size=1 << cfg.fri_config.cap_height,
        lde_bits=fri_params.lde_bits,
        initial_depth=fri_params.lde_bits - cfg.fri_config.cap_height,
        reduction_arity_bits=tuple(fri_params.reduction_arity_bits),
        final_poly_len=fri_params.final_poly_len,
        num_queries=cfg.fri_config.num_query_rounds,
        proof_of_work_bits=cfg.fri_config.proof_of_work_bits,
        degree_bits=common.degree_bits,
        num_lookup_polys=common.num_lookup_polys,
    )


@dataclass
class PlonkProofBatch:
    """Batched PLONK proofs as (hi, lo) uint32 device pairs (the PLONK analog
    of witness.ProofBatch; same FRI field layout so fri.verify_fri is shared)."""
    shape: PlonkProofShape
    constants_sigmas_cap: tuple   # (B, cap, 4) — broadcast circuit data
    wires_cap: tuple
    zs_pp_cap: tuple
    quotient_cap: tuple
    constants: tuple              # (B, n, 2) ext openings
    plonk_sigmas: tuple
    wires: tuple
    plonk_zs: tuple
    plonk_zs_next: tuple
    partial_products: tuple
    quotient_polys: tuple
    lookup_zs: tuple              # None when the circuit has no lookup tables
    lookup_zs_next: tuple
    commit_caps: list
    final_poly: tuple
    pow_witness: tuple
    initial_evals: list
    initial_siblings: list
    step_evals: list
    step_siblings: list
    public_inputs: tuple

    @property
    def batch_size(self):
        return self.pow_witness[0].shape[0]

    def oracle_caps(self):
        return [self.constants_sigmas_cap, self.wires_cap, self.zs_pp_cap,
                self.quotient_cap]


import jax.tree_util as _jtu

_PLONK_FIELDS = (
    "constants_sigmas_cap", "wires_cap", "zs_pp_cap", "quotient_cap",
    "constants", "plonk_sigmas", "wires", "plonk_zs", "plonk_zs_next",
    "partial_products", "quotient_polys", "lookup_zs", "lookup_zs_next",
    "commit_caps", "final_poly", "pow_witness", "initial_evals",
    "initial_siblings", "step_evals", "step_siblings", "public_inputs")

_jtu.register_pytree_node(
    PlonkProofBatch,
    lambda pb: (tuple(getattr(pb, f) for f in _PLONK_FIELDS), pb.shape),
    lambda shape, children: PlonkProofBatch(
        shape, **dict(zip(_PLONK_FIELDS, children))))


def load_plonk_proofs(proofs, shape: PlonkProofShape,
                      verifier_data) -> PlonkProofBatch:
    """proofs: list of refimpl.plonk PlonkProofWithPublicInputs (one circuit)."""
    B = len(proofs)
    S = shape

    def cap(get):
        return gl.from_u64(_u64([get(p) for p in proofs]))

    def exts(get):
        return gl.from_u64(_u64([get(p) for p in proofs]))

    cs_cap = gl.from_u64(np.broadcast_to(
        _u64(verifier_data.constants_sigmas_cap), (B, S.cap_size, 4)))

    commit_caps = [
        cap(lambda p, i=i: p.proof.opening_proof.commit_phase_merkle_caps[i])
        for i in range(len(S.reduction_arity_bits))
    ]
    initial_evals, initial_siblings = [], []
    for oi in range(4):
        initial_evals.append(exts(lambda p, oi=oi: [
            qr.initial_trees_proof.evals_proofs[oi][0]
            for qr in p.proof.opening_proof.query_round_proofs]))
        initial_siblings.append(gl.from_u64(_u64([
            [qr.initial_trees_proof.evals_proofs[oi][1].siblings
             for qr in p.proof.opening_proof.query_round_proofs]
            for p in proofs]).reshape(B, S.num_queries, S.initial_depth, 4)))
    step_evals, step_siblings = [], []
    for si in range(len(S.reduction_arity_bits)):
        step_evals.append(exts(lambda p, si=si: [
            qr.steps[si].evals for qr in p.proof.opening_proof.query_round_proofs]))
        step_siblings.append(gl.from_u64(_u64([
            [qr.steps[si].merkle_proof.siblings
             for qr in p.proof.opening_proof.query_round_proofs]
            for p in proofs]).reshape(B, S.num_queries, S.step_depths[si], 4)))

    o = lambda get: exts(lambda p: get(p.proof.openings))
    return PlonkProofBatch(
        shape=S,
        constants_sigmas_cap=cs_cap,
        wires_cap=cap(lambda p: p.proof.wires_cap),
        zs_pp_cap=cap(lambda p: p.proof.plonk_zs_partial_products_cap),
        quotient_cap=cap(lambda p: p.proof.quotient_polys_cap),
        constants=o(lambda x: x.constants),
        plonk_sigmas=o(lambda x: x.plonk_sigmas),
        wires=o(lambda x: x.wires),
        plonk_zs=o(lambda x: x.plonk_zs),
        plonk_zs_next=o(lambda x: x.plonk_zs_next),
        partial_products=o(lambda x: x.partial_products),
        quotient_polys=o(lambda x: x.quotient_polys),
        lookup_zs=(o(lambda x: x.lookup_zs)
                   if S.num_lookup_polys else None),
        lookup_zs_next=(o(lambda x: x.lookup_zs_next)
                        if S.num_lookup_polys else None),
        commit_caps=commit_caps,
        final_poly=exts(lambda p: p.proof.opening_proof.final_poly),
        pow_witness=gl.from_u64(_u64(
            [p.proof.opening_proof.pow_witness for p in proofs])),
        initial_evals=initial_evals,
        initial_siblings=initial_siblings,
        step_evals=step_evals,
        step_siblings=step_siblings,
        public_inputs=gl.from_u64(_u64([p.public_inputs for p in proofs])),
    )


def _canonicality(batch):
    B = batch.batch_size
    verdict = jnp.ones((B,), dtype=bool)
    for f in _PLONK_FIELDS:
        v = getattr(batch, f)
        if v is None:
            continue
        groups = v if isinstance(v, list) else [v]
        for pair in groups:
            ok = gl.is_canonical(pair)
            verdict = verdict & ok.reshape(B, -1).all(axis=-1)
    return verdict


def fri_instance_polys(S: PlonkProofShape):
    """4-oracle layout (plonky2 CommonCircuitData::get_fri_instance)."""
    cs = [(0, i) for i in range(S.num_constants + S.num_routed_wires)]
    wires = [(1, i) for i in range(S.num_wires)]
    zs = [(2, i) for i in range(S.num_challenges)]
    npp = S.num_challenges * S.num_partial_products
    pps = [(2, S.num_challenges + i) for i in range(npp)]
    lus = [(2, S.num_challenges + npp + i)
           for i in range(S.num_lookup_polys)]
    quot = [(3, i)
            for i in range(S.num_challenges * S.quotient_degree_factor)]
    return cs + wires + zs + pps + quot + lus, zs + lus


def build_plonk_verifier(common, verifier_data, num_public_inputs=None):
    """Returns verify(batch: PlonkProofBatch) -> (B,) bool."""
    digest = [int(x) for x in verifier_data.circuit_digest]

    def verify(batch: PlonkProofBatch):
        S = batch.shape
        B = batch.batch_size
        with scope("load_witness"):
            verdict = _canonicality(batch)

        # ------------------------------------------------------------------
        # public-input hash (the verifier recomputes it; tampered public
        # inputs break the PublicInputGate constraints downstream)
        # ------------------------------------------------------------------
        with scope("public_inputs_hash"):
            # plonky2 get_public_inputs_hash is hash_no_pad (not hash_or_noop)
            pi_hash = poseidon.hash_no_pad(batch.public_inputs)

        # ------------------------------------------------------------------
        # transcript (plonky2 get_challenges order)
        # ------------------------------------------------------------------
        _tr = scope("get_plonk_challenges")
        _tr.__enter__()
        sched = TranscriptSchedule()
        parts = []

        def observe(pair):
            flat = (pair[0].reshape(B, -1), pair[1].reshape(B, -1))
            sched.observe(flat[0].shape[1])
            parts.append(flat)

        observe(gl.from_u64(np.broadcast_to(
            np.array(digest, dtype=np.uint64), (B, 4))))
        observe(pi_hash)
        observe(batch.wires_cap)
        beta_refs = sched.get_n_challenges(S.num_challenges)
        gamma_refs = sched.get_n_challenges(S.num_challenges)
        delta_refs = (sched.get_n_challenges(2 * S.num_challenges)
                      if S.num_lookup_polys else [])
        observe(batch.zs_pp_cap)
        alpha_refs = sched.get_n_challenges(S.num_challenges)
        observe(batch.quotient_cap)
        zeta_ref = sched.get_extension_challenge()

        # openings, fri-openings order (zeta batch then zeta*g batch)
        observe(batch.constants)
        observe(batch.plonk_sigmas)
        observe(batch.wires)
        observe(batch.plonk_zs)
        observe(batch.partial_products)
        observe(batch.quotient_polys)
        if batch.lookup_zs is not None:
            observe(batch.lookup_zs)
        observe(batch.plonk_zs_next)
        if batch.lookup_zs_next is not None:
            observe(batch.lookup_zs_next)

        fri_alpha_ref = sched.get_extension_challenge()
        fri_beta_refs = []
        for c in batch.commit_caps:
            observe(c)
            fri_beta_refs.append(sched.get_extension_challenge())
        observe(batch.final_poly)
        observe((batch.pow_witness[0][:, None], batch.pow_witness[1][:, None]))
        pow_ref = sched.get_challenge()
        query_refs = sched.get_n_challenges(S.num_queries)

        elements = (jnp.concatenate([p[0] for p in parts], axis=1),
                    jnp.concatenate([p[1] for p in parts], axis=1))
        ys = run_schedule(sched, elements)

        betas = [extract(ys, r) for r in beta_refs]
        gammas = [extract(ys, r) for r in gamma_refs]
        deltas = [extract(ys, r) for r in delta_refs]
        alphas = [extract(ys, r) for r in alpha_refs]
        zeta = extract_ext(ys, zeta_ref)
        fri_alpha = extract_ext(ys, fri_alpha_ref)
        fri_betas = [extract_ext(ys, r) for r in fri_beta_refs]
        pow_response = extract(ys, pow_ref)
        q_steps = np.array([r.step for r in query_refs])
        q_lanes = np.array([r.lane for r in query_refs])
        q_raw = ys[1][q_steps, q_lanes]
        query_lo = q_raw.T if q_raw.ndim == 2 else q_raw
        _tr.__exit__(None, None, None)

        # ------------------------------------------------------------------
        # vanishing / quotient consistency at zeta (plonky2 verifier step 2)
        # ------------------------------------------------------------------
        with scope("vanishing_poly_check"):
            F = ExtOpsJax((B,))
            one = F.one()
            n = 1 << S.degree_bits
            zeta_pow_n = gle.exp_power_of_2(zeta, S.degree_bits)
            z_h_zeta = gle.sub(zeta_pow_n, one)
            l0_den = gle.scalar_mul(gle.sub(zeta, one), gl.full((B,), n))
            l0 = gle.mul(z_h_zeta, gle.inv(l0_den))

            pi_hash_ext = [gle.from_base((pi_hash[0][:, i], pi_hash[1][:, i]))
                           for i in range(4)]
            terms = eval_vanishing_terms(
                F, common, zeta,
                _ext_rows(batch.constants), _ext_rows(batch.plonk_sigmas),
                _ext_rows(batch.wires),
                _ext_rows(batch.plonk_zs), _ext_rows(batch.plonk_zs_next),
                _ext_rows(batch.partial_products),
                pi_hash_ext, betas, gammas, l0,
                lookup_zs=(_ext_rows(batch.lookup_zs)
                           if batch.lookup_zs is not None else []),
                lookup_zs_next=(_ext_rows(batch.lookup_zs_next)
                                if batch.lookup_zs_next is not None else []),
                deltas=deltas)
            quot_rows = _ext_rows(batch.quotient_polys)
            q = S.quotient_degree_factor
            for i in range(S.num_challenges):
                alpha = gle.from_base(alphas[i])
                vanishing = gle.reduce_with_powers(terms, alpha)
                chunk = quot_rows[i * q:(i + 1) * q]
                recombined = gle.reduce_with_powers(chunk, zeta_pow_n)
                verdict = verdict & gle.eq(gle.mul(z_h_zeta, recombined),
                                           vanishing)

        # ------------------------------------------------------------------
        # FRI (4-oracle instance) through the shared fused path
        # ------------------------------------------------------------------
        zeta_polys, zeta_next_polys = fri_instance_polys(S)
        g_sub = gl_int.primitive_root_of_unity(S.degree_bits)
        zeta_next = gle.scalar_mul(zeta, gl.full((B,), g_sub))
        openings_zeta = (_ext_rows(batch.constants)
                         + _ext_rows(batch.plonk_sigmas)
                         + _ext_rows(batch.wires)
                         + _ext_rows(batch.plonk_zs)
                         + _ext_rows(batch.partial_products)
                         + _ext_rows(batch.quotient_polys)
                         + (_ext_rows(batch.lookup_zs)
                            if batch.lookup_zs is not None else []))
        openings_zeta_next = (_ext_rows(batch.plonk_zs_next)
                              + (_ext_rows(batch.lookup_zs_next)
                                 if batch.lookup_zs_next is not None else []))
        challenges = {
            "fri_alpha": fri_alpha,
            "fri_betas": fri_betas,
            "fri_pow_response": pow_response,
            "query_lo": query_lo,
            "instance_batches": [(zeta, zeta_polys), (zeta_next, zeta_next_polys)],
            "openings_batches": [openings_zeta, openings_zeta_next],
        }
        verdict = verify_fri(S, batch, challenges, verdict)
        return verdict

    return verify
