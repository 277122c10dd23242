"""Device mesh + sharding layout for batched verification.

The reference is single-threaded (SURVEY.md §2 parallelism accounting); the
TPU-native scaling axes are:
  dp — data parallelism over proofs (the batch axis of every proof array)
  qp — sharding of the independent FRI query rounds (axis 1 of the
       query-indexed arrays; the reference's hot loop, fri/mod.rs:488-501)

Layout rule: proof-level arrays are sharded over dp and replicated over qp;
query-indexed arrays (initial/step evals and siblings) are sharded over both.
XLA/GSPMD inserts the (ICI) collectives: the per-query verdicts reduce with an
all-reduce at the final `.all(axis=...)`, exactly the psum the survey calls
for.  Multi-host: the same mesh spans hosts via jax.distributed (see
parallel/distributed.py).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp=None, qp=None):
    """Build a (dp, qp) mesh.  Defaults: qp = 2 when possible, else 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None or qp is None:
        qp = 2 if n % 2 == 0 and n > 1 else 1
        dp = n // qp
    assert dp * qp == n, (dp, qp, n)
    arr = np.array(devices).reshape(dp, qp)
    from ..utils.logging import get_logger
    get_logger(__name__).info("make_mesh: dp=%d qp=%d over %d %s device(s)",
                              dp, qp, n, devices[0].platform)
    return Mesh(arr, ("dp", "qp"))


def _leaf_spec(path_leaf_shape, batch_axis0, query_axis1):
    spec = [None] * len(path_leaf_shape)
    if batch_axis0:
        spec[0] = "dp"
    if query_axis1:
        spec[1] = "qp"
    return P(*spec)


def batch_pspecs(batch):
    """PartitionSpec pytree for a ProofBatch: dp on axis 0 everywhere, qp on
    axis 1 of query-indexed arrays (the shard_map in_specs)."""
    from ..witness import ProofBatch

    def pair_spec(pair, query):
        if pair is None:
            return None
        return tuple(_leaf_spec(x.shape, True, query) for x in pair)

    S = batch.shape
    return ProofBatch(
        shape=S,
        trace_cap=pair_spec(batch.trace_cap, False),
        zs_cap=pair_spec(batch.zs_cap, False),
        quotient_cap=pair_spec(batch.quotient_cap, False),
        local_values=pair_spec(batch.local_values, False),
        next_values=pair_spec(batch.next_values, False),
        permutation_zs=pair_spec(batch.permutation_zs, False),
        permutation_zs_next=pair_spec(batch.permutation_zs_next, False),
        quotient_polys=pair_spec(batch.quotient_polys, False),
        commit_caps=[pair_spec(c, False) for c in batch.commit_caps],
        final_poly=pair_spec(batch.final_poly, False),
        pow_witness=pair_spec(batch.pow_witness, False),
        initial_evals=[pair_spec(e, True) for e in batch.initial_evals],
        initial_siblings=[pair_spec(s, True) for s in batch.initial_siblings],
        step_evals=[pair_spec(e, True) for e in batch.step_evals],
        step_siblings=[pair_spec(s, True) for s in batch.step_siblings],
        public_inputs=pair_spec(batch.public_inputs, False),
    )


def batch_shardings(batch, mesh):
    """NamedSharding pytree for a ProofBatch: dp on axis 0 everywhere, qp on
    axis 1 of query-indexed arrays."""
    from ..witness import ProofBatch

    assert isinstance(batch, ProofBatch)

    def pair_spec(pair, query):
        if pair is None:
            return None
        return tuple(
            NamedSharding(mesh, _leaf_spec(x.shape, True, query)) for x in pair)

    S = batch.shape
    return ProofBatch(
        shape=S,
        trace_cap=pair_spec(batch.trace_cap, False),
        zs_cap=pair_spec(batch.zs_cap, False),
        quotient_cap=pair_spec(batch.quotient_cap, False),
        local_values=pair_spec(batch.local_values, False),
        next_values=pair_spec(batch.next_values, False),
        permutation_zs=pair_spec(batch.permutation_zs, False),
        permutation_zs_next=pair_spec(batch.permutation_zs_next, False),
        quotient_polys=pair_spec(batch.quotient_polys, False),
        commit_caps=[pair_spec(c, False) for c in batch.commit_caps],
        final_poly=pair_spec(batch.final_poly, False),
        pow_witness=pair_spec(batch.pow_witness, False),
        initial_evals=[pair_spec(e, True) for e in batch.initial_evals],
        initial_siblings=[pair_spec(s, True) for s in batch.initial_siblings],
        step_evals=[pair_spec(e, True) for e in batch.step_evals],
        step_siblings=[pair_spec(s, True) for s in batch.step_siblings],
        public_inputs=pair_spec(batch.public_inputs, False),
    )


def shard_batch(batch, mesh):
    """Place a ProofBatch onto the mesh with the layout above."""
    shardings = batch_shardings(batch, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), batch, shardings)


def sharded_verifier(stark, config, degree_bits, mesh, check_vanishing=True):
    """Explicitly partitioned verifier: shard_map over the (dp, qp) mesh.

    Every shard runs the full local verification — including the fused
    Pallas kernels, which execute per-device inside shard_map (the GSPMD
    auto-partitioner cannot split a pallas_call, so round 1 forced the slow
    jnp path here; shard_map removes that fallback).  Per-proof work
    (transcript, vanishing check) replicates over qp; the verdict AND-reduces
    over qp inside the mapped function (jax.lax.pmin — the psum-style
    collective of SURVEY.md §2c) and comes out dp-sharded."""
    from jax import shard_map

    from ..stark import build_verifier
    from ..utils.compile import smart_jit

    vf = build_verifier(stark, config, degree_bits, check_vanishing,
                        query_shard_axis="qp")

    def make(batch):
        in_specs = batch_pspecs(batch)
        mapped = shard_map(vf, mesh=mesh, in_specs=(in_specs,),
                           out_specs=P("dp"), check_vma=False)
        return smart_jit(mapped)

    # one-shot wrapper: specs depend only on the batch SHAPE, so cache per
    # geometry
    cache = {}

    def verify(batch):
        key = tuple(x.shape for x in jax.tree_util.tree_leaves(batch))
        if key not in cache:
            cache[key] = make(batch)
        return cache[key](batch)

    return verify
