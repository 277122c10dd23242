"""Witness loading: proof objects -> batched, static-shape device arrays.

The executor analog of the reference's WitnessChip
(verifier/src/witness/mod.rs:31-295): where the chip loads each Goldilocks
value as a range-checked advice cell, we pack all proofs of a batch into
uint64 numpy arrays (leading batch axis), move them to device as (hi, lo)
uint32 lane pairs, and fold the canonicality check (every value < p,
base.rs:108-119) into the batch verdict.

All shapes are functions of (StarkConfig, degree_bits, stark layout) only, so
a batch of proofs shares one compiled verifier.
"""

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .ops import goldilocks as gl


@dataclass(frozen=True)
class ProofShape:
    """Static proof geometry (derived from config + stark + degree_bits)."""
    num_columns: int
    num_public_inputs: int
    num_zs: int                 # permutation Z polys (0 if unused)
    num_quotient: int
    cap_size: int
    lde_bits: int
    initial_depth: int          # lde_bits - cap_height
    reduction_arity_bits: tuple
    final_poly_len: int
    num_queries: int
    num_challenges: int
    num_challenge_sets: int     # permutation challenge sets drawn (batch size)
    proof_of_work_bits: int
    degree_bits: int
    hasher: str = "poseidon_goldilocks"

    @property
    def uses_permutation(self):
        return self.num_zs > 0

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
        w = [self.num_columns]
        if self.uses_permutation:
            w.append(self.num_zs)
        w.append(self.num_quotient)
        return tuple(w)


def proof_shape(stark, config, degree_bits,
                hasher="poseidon_goldilocks") -> ProofShape:
    fri_params = config.fri_params(degree_bits)
    return ProofShape(
        num_columns=stark.COLUMNS,
        num_public_inputs=stark.PUBLIC_INPUTS,
        num_zs=stark.num_permutation_batches(config) if stark.uses_permutation_args() else 0,
        num_quotient=stark.quotient_degree_factor() * config.num_challenges,
        cap_size=1 << config.fri_config.cap_height,
        lde_bits=fri_params.lde_bits,
        initial_depth=fri_params.lde_bits - config.fri_config.cap_height,
        reduction_arity_bits=tuple(fri_params.reduction_arity_bits),
        final_poly_len=fri_params.final_poly_len,
        num_queries=config.fri_config.num_query_rounds,
        num_challenges=config.num_challenges,
        num_challenge_sets=stark.permutation_batch_size() if stark.uses_permutation_args() else 0,
        proof_of_work_bits=config.fri_config.proof_of_work_bits,
        degree_bits=degree_bits,
        hasher=hasher,
    )


@dataclass
class ProofBatch:
    """Batched proof data as (hi, lo) uint32 device-array pairs.

    Field shapes (B = batch):
      trace_cap / zs_cap / quotient_cap: (B, cap, 4)
      local_values: (B, C, 2) ... quotient_polys: (B, num_quotient, 2)
      final_poly: (B, L, 2);  pow_witness: (B,)
      initial_evals[o]: (B, Q, w_o); initial_siblings[o]: (B, Q, depth, 4)
      step_evals[i]: (B, Q, arity, 2); step_siblings[i]: (B, Q, depth_i, 4)
      public_inputs: (B, n_pi)
      commit_caps[i]: (B, cap, 4)
    """
    shape: ProofShape
    trace_cap: tuple
    zs_cap: Optional[tuple]
    quotient_cap: tuple
    local_values: tuple
    next_values: tuple
    permutation_zs: Optional[tuple]
    permutation_zs_next: Optional[tuple]
    quotient_polys: tuple
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
        """Per-oracle expected caps, in oracle-index order (what verify_fri's
        initial Merkle checks compare against)."""
        caps = [self.trace_cap]
        if self.shape.uses_permutation:
            caps.append(self.zs_cap)
        caps.append(self.quotient_cap)
        return caps


def _u64(x):
    return np.array(x, dtype=np.uint64)


def load_proofs(proofs, shape: ProofShape) -> ProofBatch:
    """proofs: list of refimpl.proof.StarkProofWithPublicInputs (same shape)."""
    import time as _time

    from .utils.logging import get_logger
    _log = get_logger(__name__)
    _t0 = _time.monotonic()
    B = len(proofs)
    S = shape
    bn254 = S.hasher == "poseidon_bn254"

    def hashes(nested):
        """Hash-typed data -> device arrays: GL (..., 4) u64, BN254 (..., 16)."""
        if bn254:
            from .ops import bn254 as fr
            return fr.from_ints(nested)
        return gl.from_u64(_u64(nested))

    def cap(get):
        return hashes([get(p) for p in proofs])        # (B, cap[, 4])

    def exts(get):
        return _u64([get(p) for p in proofs])          # (B, n, 2)

    trace_cap = cap(lambda p: p.proof.trace_cap)
    zs_cap = cap(lambda p: p.proof.permutation_zs_cap) if S.uses_permutation else None
    quotient_cap = cap(lambda p: p.proof.quotient_polys_cap)
    o = proofs[0].proof.openings
    local_values = exts(lambda p: p.proof.openings.local_values)
    next_values = exts(lambda p: p.proof.openings.next_values)
    permutation_zs = exts(lambda p: p.proof.openings.permutation_zs) \
        if o.permutation_zs is not None else None
    permutation_zs_next = exts(lambda p: p.proof.openings.permutation_zs_next) \
        if o.permutation_zs_next is not None else None
    quotient_polys = exts(lambda p: p.proof.openings.quotient_polys)
    commit_caps = [
        hashes([p.proof.opening_proof.commit_phase_merkle_caps[i] for p in proofs])
        for i in range(len(S.reduction_arity_bits))
    ]
    final_poly = _u64([p.proof.opening_proof.final_poly for p in proofs])
    pow_witness = _u64([p.proof.opening_proof.pow_witness for p in proofs])

    n_oracles = len(S.oracle_widths)
    initial_evals, initial_siblings = [], []
    for oi in range(n_oracles):
        initial_evals.append(_u64([
            [qr.initial_trees_proof.evals_proofs[oi][0]
             for qr in p.proof.opening_proof.query_round_proofs]
            for p in proofs]))                          # (B, Q, w)
        sib_nested = [
            [qr.initial_trees_proof.evals_proofs[oi][1].siblings
             for qr in p.proof.opening_proof.query_round_proofs]
            for p in proofs]
        if bn254:
            initial_siblings.append(hashes(sib_nested))
        else:
            initial_siblings.append(gl.from_u64(_u64(sib_nested).reshape(
                B, S.num_queries, S.initial_depth, 4)))
    step_evals, step_siblings = [], []
    for si, ab in enumerate(S.reduction_arity_bits):
        step_evals.append(_u64([
            [qr.steps[si].evals for qr in p.proof.opening_proof.query_round_proofs]
            for p in proofs]))                          # (B, Q, arity, 2)
        ssib_nested = [
            [qr.steps[si].merkle_proof.siblings
             for qr in p.proof.opening_proof.query_round_proofs]
            for p in proofs]
        if bn254:
            step_siblings.append(hashes(ssib_nested))
        else:
            step_siblings.append(gl.from_u64(_u64(ssib_nested).reshape(
                B, S.num_queries, S.step_depths[si], 4)))
    public_inputs = _u64([p.public_inputs for p in proofs])

    def dev(x):
        return None if x is None else gl.from_u64(x)

    _log.debug("load_proofs: B=%d n=2^%d hasher=%s in %.2fs",
               B, S.degree_bits, S.hasher, _time.monotonic() - _t0)
    return ProofBatch(
        shape=S,
        trace_cap=trace_cap, zs_cap=zs_cap, quotient_cap=quotient_cap,
        local_values=dev(local_values), next_values=dev(next_values),
        permutation_zs=dev(permutation_zs), permutation_zs_next=dev(permutation_zs_next),
        quotient_polys=dev(quotient_polys),
        commit_caps=commit_caps,
        final_poly=dev(final_poly), pow_witness=dev(pow_witness),
        initial_evals=[dev(e) for e in initial_evals],
        initial_siblings=initial_siblings,
        step_evals=[dev(e) for e in step_evals],
        step_siblings=step_siblings,
        public_inputs=dev(public_inputs),
    )


def save_batch_npz(path, batch: ProofBatch):
    """Columnar on-disk cache of a loaded batch: one compressed npz holding
    every device array.  Loading thousands of DISTINCT proofs through the
    per-proof JSON path is a one-time cost; after this cache exists, batch
    load time is independent of how the proofs were produced."""
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_leaves(batch)
    np.savez_compressed(path, **{f"a{i}": np.asarray(x)
                                 for i, x in enumerate(leaves)})


def load_batch_npz(path, template: ProofBatch) -> ProofBatch:
    """Rebuild a ProofBatch from save_batch_npz output.  `template` is any
    batch of the same proof GEOMETRY (e.g. one loaded proof) — it provides
    the pytree structure; batch sizes may differ."""
    import jax
    import numpy as np

    data = np.load(path)
    _, treedef = jax.tree_util.tree_flatten(template)
    leaves = [data[f"a{i}"] for i in range(treedef.num_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def scalar_arrays(batch: ProofBatch):
    """Every Goldilocks-scalar pair in the batch."""
    for f in (batch.local_values, batch.next_values, batch.permutation_zs,
              batch.permutation_zs_next, batch.quotient_polys,
              batch.final_poly, batch.pow_witness, batch.public_inputs):
        if f is not None:
            yield f
    for group in (batch.initial_evals, batch.step_evals):
        for f in group:
            yield f


def hash_arrays(batch: ProofBatch):
    """Every hash-typed array (caps, siblings)."""
    for f in (batch.trace_cap, batch.zs_cap, batch.quotient_cap):
        if f is not None:
            yield f
    for group in (batch.commit_caps, batch.initial_siblings, batch.step_siblings):
        for f in group:
            yield f


def canonicality_verdict(batch: ProofBatch):
    """AND over all loaded values being canonical (< field modulus), reduced
    to (B,) bool (the executor form of WitnessChip's per-value range checks)."""
    import jax.numpy as jnp

    from .hashing import get_hash_ops

    H = get_hash_ops(batch.shape.hasher)
    B = batch.batch_size
    verdict = jnp.ones((B,), dtype=bool)
    for pair in scalar_arrays(batch):
        ok = gl.is_canonical(pair)
        verdict = verdict & ok.reshape(B, -1).all(axis=-1)
    for h in hash_arrays(batch):
        ok = H.canonical_ok(h)
        verdict = verdict & ok.reshape(B, -1).all(axis=-1)
    return verdict


# ----------------------------------------------------------------------------
# Pytree registration: ProofBatch flows through jit/vmap/shard_map with its
# static shape as aux data (so one compilation serves every batch of the same
# geometry).
# ----------------------------------------------------------------------------

import jax.tree_util as _jtu

_FIELDS = ("trace_cap", "zs_cap", "quotient_cap", "local_values", "next_values",
           "permutation_zs", "permutation_zs_next", "quotient_polys",
           "commit_caps", "final_poly", "pow_witness", "initial_evals",
           "initial_siblings", "step_evals", "step_siblings", "public_inputs")


def _pb_flatten(pb):
    return tuple(getattr(pb, f) for f in _FIELDS), pb.shape


def _pb_unflatten(shape, children):
    return ProofBatch(shape, **dict(zip(_FIELDS, children)))


_jtu.register_pytree_node(ProofBatch, _pb_flatten, _pb_unflatten)
