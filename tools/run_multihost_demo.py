"""Multi-host (multi-process) verification demo: N processes, each with K
virtual CPU devices, form one global (dp, qp) mesh via jax.distributed — the
no-cluster analog of a multi-host TPU pod slice (1 chip -> 1 host -> N hosts,
SURVEY.md §2 accounting).

Exercises the REAL multi-host path (parallel/distributed.py): each process
loads only its own slice of the proof batch, `global_batch` assembles global
arrays from the per-host data without any cross-host copy of proof bytes,
the shard_map verifier runs over the global mesh (dp spans processes = the
DCN axis; qp stays inside a process = the ICI axis), and each host reads
back only its local verdict slice.

Run:   python tools/run_multihost_demo.py            # launches 2 workers
Inner: python tools/run_multihost_demo.py worker <i> <n> <port>
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEVICES_PER_PROC = 4


def worker(proc_id, num_procs, port):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROC} "
        "--xla_disable_hlo_passes=fusion")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from halo2_plonky2_verifier_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address=f"localhost:{port}",
                    num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs
    n_global = num_procs * DEVICES_PER_PROC

    import copy

    import numpy as np

    from halo2_plonky2_verifier_tpu import load_proofs, proof_shape
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof

    # dp spans processes (DCN-analog), qp stays within a process (ICI-analog)
    mesh = dist.global_mesh(dp=n_global // 2, qp=2)
    stark, config, pwp = get_fibonacci_proof(8)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits)

    # each process loads ONLY its slice of the global batch
    global_b = n_global
    global_bad = 3
    start, size = dist.local_batch_slice(global_b)
    proofs = [copy.deepcopy(pwp) for _ in range(size)]
    if start <= global_bad < start + size:
        proofs[global_bad - start].proof.opening_proof.pow_witness ^= 1
    local = load_proofs(proofs, shape)

    gbatch = dist.global_batch(local, mesh)        # no proof bytes cross DCN
    verify = dist.distributed_verifier(stark, config, degree_bits, mesh)
    verdict = verify(gbatch)                       # (B,) dp-sharded global
    mine = dist.local_verdict(verdict)             # this host's slice

    expect = [True] * size
    if start <= global_bad < start + size:
        expect[global_bad - start] = False
    print(f"[proc {proc_id}] local verdict [{start}:{start+size}]:",
          list(mine), flush=True)
    assert list(mine) == expect, (list(mine), expect)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    num_procs = 2
    port = int(os.environ.get("MULTIHOST_PORT", "12765"))
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(i), str(num_procs), str(port)],
            env={**os.environ})
        for i in range(num_procs)
    ]
    codes = [p.wait() for p in procs]
    assert all(c == 0 for c in codes), codes
    print("multihost demo OK")


if __name__ == "__main__":
    main()
