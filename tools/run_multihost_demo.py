"""Multi-host (multi-process) verification demo: N processes, each with K
virtual CPU devices, form one global (dp, qp) mesh via jax.distributed — the
no-cluster analog of a multi-host TPU pod slice (1 chip -> 1 host -> N hosts,
SURVEY.md §2 accounting).

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
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs
    n_global = num_procs * DEVICES_PER_PROC

    import numpy as np

    from halo2_plonky2_verifier_tpu import load_proofs, proof_shape
    from halo2_plonky2_verifier_tpu.parallel.distributed import local_batch_slice
    from halo2_plonky2_verifier_tpu.parallel.mesh import (
        batch_shardings, make_mesh, sharded_verifier)
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof

    # dp spans processes (DCN-analog), qp stays within a process (ICI-analog)
    mesh = make_mesh(jax.devices(), dp=n_global // 2, qp=2)
    stark, config, pwp = get_fibonacci_proof(8)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits)

    import copy

    global_b = n_global  # one proof per dp shard x2... keep = n_global
    proofs = [copy.deepcopy(pwp) for _ in range(global_b)]
    proofs[3].proof.opening_proof.pow_witness ^= 1  # one bad lane, globally

    batch = load_proofs(proofs, shape)  # host-local copy of the global batch
    shardings = batch_shardings(batch, mesh)
    # form global arrays from per-host data
    import jax.numpy as jnp

    def make_global(x, s):
        return jax.make_array_from_callback(
            x.shape, s, lambda idx: np.asarray(x[idx]))

    gbatch = jax.tree_util.tree_map(make_global, batch, shardings)

    # replicated output so every process can read the full verdict
    from jax.sharding import NamedSharding, PartitionSpec as P

    from halo2_plonky2_verifier_tpu.ops.poseidon import force_impl
    from halo2_plonky2_verifier_tpu.stark import build_verifier
    from halo2_plonky2_verifier_tpu.utils.compile import smart_jit

    vf = build_verifier(stark, config, degree_bits)

    def vf_jnp(b):
        with force_impl("jnp"):
            return vf(b)

    verify = smart_jit(vf_jnp, out_shardings=NamedSharding(mesh, P()))
    verdict = np.asarray(verify(gbatch))
    expect = [True] * global_b
    expect[3] = False
    print(f"[proc {proc_id}] verdict:", list(verdict), flush=True)
    assert list(verdict) == expect


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    num_procs = 2
    port = 12765
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
