"""Multi-host runtime glue: 1 chip -> 1 host -> N hosts.

The reference has no distributed runtime (SURVEY.md §2); this is the
TPU-native slot-filler: jax.distributed initialization plus helpers for
host-local proof feeding with a global mesh (dp spans hosts over DCN, qp
stays intra-host over ICI so query-round reductions never cross hosts).
"""

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the multi-host runtime (no-op on a single process).

    On TPU pods the three arguments are discovered from the environment; pass
    them explicitly for CPU/GPU multi-process testing.
    """
    if num_processes is None and jax.process_count() > 1:
        return  # already initialized by the launcher
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def global_mesh(dp=None, qp=None):
    """A mesh over all global devices: dp outer (DCN-friendly), qp inner
    (ICI).  jax places consecutive devices on the same host, so keeping qp as
    the fastest-varying axis pins query-sharding to intra-host links."""
    from .mesh import make_mesh

    return make_mesh(jax.devices(), dp=dp, qp=qp)


def local_batch_slice(global_batch_size):
    """(start, size) of this host's slice of the proof batch axis."""
    per = global_batch_size // jax.process_count()
    assert per * jax.process_count() == global_batch_size
    return jax.process_index() * per, per
