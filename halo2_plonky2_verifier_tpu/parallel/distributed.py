"""Multi-host runtime: 1 chip -> 1 host -> N hosts.

The reference is a single-process library (SURVEY.md §2 has no distributed
runtime); this module is the TPU-native slot-filler.  Three pieces:

 1. `initialize(...)` — jax.distributed bring-up (coordinator discovery on
    pods, explicit triple for CPU/GPU multi-process testing).
 2. `global_batch(local_batch, mesh)` — THE multi-host input path: each host
    loads only its own proofs (refimpl JSON, columnar npz, or a network
    feed), and the per-host arrays are assembled into global jax.Arrays via
    `jax.make_array_from_process_local_data` without any cross-host copy of
    proof bytes: dp spans hosts over DCN, every byte stays on the host that
    loaded it.
 3. `distributed_verifier(...)` — the shard_map verifier over the global
    mesh, returning per-host verdict slices (`local_verdict`).

Layout rule (same as parallel/mesh.py): dp outer so the proof batch axis
spans hosts over DCN; qp inner so FRI query-round reductions ride intra-host
ICI.  jax places consecutive devices on the same host, which makes the
(dp, qp) reshape in make_mesh respect that automatically.

Exercised end-to-end by tools/run_multihost_demo.py (2 CPU processes) —
real pods only need `initialize()` with no arguments.
"""

import jax

from .mesh import batch_shardings, make_mesh, sharded_verifier


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_count=None):
    """Initialize the multi-host runtime (no-op if already initialized).

    On TPU pods all arguments are discovered from the environment; pass them
    explicitly for CPU/GPU multi-process testing (the demo does)."""
    # NOTE: must not touch jax.devices()/process_count() before
    # jax.distributed.initialize — that would initialize the XLA backend
    # single-process.  Probe the distributed client state instead.
    from jax._src import distributed as _dist_state

    if getattr(_dist_state.global_state, "client", None) is not None:
        return  # already initialized by the launcher
    if coordinator_address is not None or num_processes is not None:
        kwargs = {}
        if local_device_count is not None:
            kwargs["num_local_devices"] = local_device_count
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
        from ..utils.logging import get_logger
        get_logger(__name__).info(
            "distributed: process %d/%d, %d local / %d global device(s)",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count())


def global_mesh(dp=None, qp=None):
    """A mesh over all global devices: dp outer (DCN-friendly), qp inner
    (ICI).  jax places consecutive devices on the same host, so keeping qp as
    the fastest-varying axis pins query-sharding to intra-host links."""
    return make_mesh(jax.devices(), dp=dp, qp=qp)


def local_batch_slice(global_batch_size):
    """(start, size) of this host's slice of the proof batch axis."""
    per = global_batch_size // jax.process_count()
    assert per * jax.process_count() == global_batch_size
    return jax.process_index() * per, per


def global_batch(local_batch, mesh):
    """Assemble a global sharded ProofBatch from per-host local batches.

    `local_batch` holds THIS host's proofs only (batch axis = the host's dp
    slice, identical static shape on every host).  Every leaf becomes a
    global jax.Array whose addressable shards are exactly the local data —
    no proof bytes cross DCN.  Leaves that are replicated over dp (none
    today — axis 0 is dp-sharded everywhere) would require identical values
    on all hosts."""
    shardings = batch_shardings(local_batch, mesh)
    nproc = jax.process_count()

    def leaf(x, s):
        global_shape = (x.shape[0] * nproc,) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(s, x, global_shape)

    if nproc == 1:  # single-process: plain device_put path
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), local_batch, shardings)
    return jax.tree_util.tree_map(leaf, local_batch, shardings)


def distributed_verifier(stark, config, degree_bits, mesh,
                         check_vanishing=True):
    """shard_map verifier over the global mesh (see mesh.sharded_verifier);
    works unchanged whether the mesh spans one host or many."""
    return sharded_verifier(stark, config, degree_bits, mesh, check_vanishing)


def local_verdict(global_verdict):
    """This host's slice of the (B,) global verdict, as host numpy.

    The verdict is dp-sharded and qp-replicated, so each dp slice appears
    once per local qp device — deduplicate by slice start."""
    import numpy as np

    shards = {}
    for s in global_verdict.addressable_shards:
        shards.setdefault(s.index[0].start or 0, np.asarray(s.data))
    return np.concatenate([shards[k] for k in sorted(shards)])
