"""On-TPU sanity for the fused Pallas kernels: run each against the jnp
plane-scan path on the real chip and compare bit-exactly.

Usage:
    python tools/tpu_sanity.py               # kernel-level differentials
    python tools/tpu_sanity.py --preflight   # kernels + compile-and-run ALL
                                             # FOUR bench configs end-to-end

--preflight is the round-end gate (VERDICT r3 weak #2: a BENCH_r02-class
Mosaic regression must never reach the driver again): it runs bench.py for
gl / bn254 / plonk / the n=2^11 fold shape at a small batch on the attached
chip and fails loudly if any config fails to compile, run, or verify.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)

    from halo2_plonky2_verifier_tpu.fri import merkle_scan_planes
    from halo2_plonky2_verifier_tpu.ops import goldilocks as gl
    from halo2_plonky2_verifier_tpu.ops import merkle_pallas, poseidon
    from halo2_plonky2_verifier_tpu.ops import transcript_pallas

    rng = np.random.default_rng(3)

    def planes(x):  # (N, w) u64 -> (w, N) u32 pair
        return (jnp.asarray((x >> np.uint64(32)).astype(np.uint32).T),
                jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32).T))

    def unplanes(p):
        hi = np.asarray(p[0], dtype=np.uint64).T
        lo = np.asarray(p[1], dtype=np.uint64).T
        return (hi << np.uint64(32)) | lo

    P = (1 << 64) - (1 << 32) + 1
    n, d_max = 4096, 3
    node = rng.integers(0, P, size=(n, 4), dtype=np.uint64)
    sib = rng.integers(0, P, size=(d_max, n, 4), dtype=np.uint64)
    idx = rng.integers(0, 1 << d_max, size=(n,), dtype=np.uint32)
    act = (rng.integers(0, 2, size=(d_max, n)) | np.array([[1]] * d_max)
           ).astype(np.uint32)
    act = np.sort(act, axis=0)[::-1]  # depth-prefix masks

    node_p = planes(node)
    sib_p = (jnp.asarray((sib >> np.uint64(32)).astype(np.uint32)).transpose(0, 2, 1),
             jnp.asarray((sib & np.uint64(0xFFFFFFFF)).astype(np.uint32)).transpose(0, 2, 1))

    t0 = time.time()
    got = unplanes(jax.jit(merkle_pallas.verify_paths_planes)(
        node_p, sib_p, jnp.asarray(idx), jnp.asarray(act)))
    print(f"path kernel compiled+ran in {time.time()-t0:.1f}s", flush=True)
    with poseidon.force_impl("jnp"):
        want = unplanes(jax.jit(merkle_scan_planes)(
            node_p, jnp.asarray(idx), sib_p, jnp.asarray(act)))
    assert (got == want).all(), "PATH KERNEL MISMATCH"
    print("path kernel OK", flush=True)

    data = rng.integers(0, P, size=(n, 32), dtype=np.uint64)
    t0 = time.time()
    got = unplanes(jax.jit(merkle_pallas.hash_no_pad_planes)(planes(data)))
    print(f"sponge kernel compiled+ran in {time.time()-t0:.1f}s", flush=True)
    with poseidon.force_impl("jnp"):
        want = unplanes(jax.jit(poseidon.hash_no_pad_planes)(planes(data)))
    assert (got == want).all(), "SPONGE KERNEL MISMATCH"
    print("sponge kernel OK", flush=True)

    n_steps, b = 30, 512
    ch = rng.integers(0, P, size=(n_steps, 8, b), dtype=np.uint64)
    mask = (rng.integers(0, 2, size=(n_steps, 8, 1))).astype(np.uint32)
    ch_p = (jnp.asarray((ch >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((ch & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
    t0 = time.time()
    got = jax.jit(transcript_pallas.run_steps_planes)(ch_p, jnp.asarray(mask))
    got = (np.asarray(got[0]), np.asarray(got[1]))
    print(f"transcript kernel compiled+ran in {time.time()-t0:.1f}s", flush=True)

    # jnp reference of the same step semantics
    import jax.numpy as jnp2
    st = (jnp2.zeros((12, b), jnp2.uint32), jnp2.zeros((12, b), jnp2.uint32))
    ys_hi, ys_lo = [], []
    with poseidon.force_impl("jnp"):
        for s in range(n_steps):
            m = jnp2.asarray(mask[s] == 1)
            pre_h = jnp2.where(m, ch_p[0][s], st[0][:8])
            pre_l = jnp2.where(m, ch_p[1][s], st[1][:8])
            st = (jnp2.concatenate([pre_h, st[0][8:]], axis=0),
                  jnp2.concatenate([pre_l, st[1][8:]], axis=0))
            st = poseidon.permute_planes(st)
            ys_hi.append(np.asarray(st[0][:8]))
            ys_lo.append(np.asarray(st[1][:8]))
    assert (got[0] == np.stack(ys_hi)).all(), "TRANSCRIPT KERNEL MISMATCH hi"
    assert (got[1] == np.stack(ys_lo)).all(), "TRANSCRIPT KERNEL MISMATCH lo"
    print("transcript kernel OK", flush=True)
    print("ALL TPU KERNEL SANITY CHECKS PASSED", flush=True)


def sharded_kernel_preflight():
    """shard_map x Mosaic on the REAL chip (VERDICT r4 item 4): compile and
    run the qp-sharded verifier (parallel.mesh.sharded_verifier — the exact
    deployment path of a multi-chip mesh) on a 1-device mesh, with the fused
    Pallas kernels active inside the shard_map body.  A Mosaic-inside-
    shard_map incompatibility surfaces HERE, not on a production slice."""
    import jax

    from halo2_plonky2_verifier_tpu import load_proofs, proof_shape
    from halo2_plonky2_verifier_tpu.parallel.mesh import (make_mesh,
                                                          shard_batch,
                                                          sharded_verifier)
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof

    stark, config, pwp = get_fibonacci_proof(32)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits)
    batch = load_proofs([pwp] * 8, shape)
    mesh = make_mesh(jax.devices()[:1], dp=1, qp=1)
    vf = sharded_verifier(stark, config, degree_bits, mesh)
    t0 = time.time()
    verdict = np.asarray(vf(shard_batch(batch, mesh)))
    assert verdict.all(), "sharded verifier rejected valid proofs"
    print(f"shard_map x Pallas verifier OK ({time.time()-t0:.0f}s)",
          flush=True)


# Per-config throughput floors at the PREFLIGHT geometry (batch=256, 2
# iters, 1 epoch) — a perf-regression gate on top of the compile gate
# (VERDICT r4 item 6).  IMPORTANT calibration note: at B=256 over the
# tunneled backend the fixed per-call host latency (~250 ms) dominates,
# capping EVERY config near ~1000 proofs/s regardless of kernel speed
# (measured r5: gl 1011, gl-n2048 1119 under suite contention) — so these
# floors catch compile failures and order-of-magnitude regressions, not
# percent-level drift.  The full-batch numbers in README/BENCH_r05 are the
# real perf record (gl 73.6k / fold 10.5k / bn254 3.6k / plonk 20.3k at
# B=1024-4096).  Override per config with BENCH_FLOOR_<NAME>.
_PREFLIGHT_FLOORS = {
    "gl": 500.0,
    "gl-n2048": 500.0,
    "bn254": 300.0,
    "plonk": 200.0,
}


def bench_configs_preflight():
    """Compile-and-run every bench configuration end-to-end on the attached
    chip (small batch, 1 epoch, roofline off): the flagship GL n=2^5, BN254,
    PLONK (standard_recursion gate mix), and the GL n=2^11 fold shape —
    each gated on a throughput floor."""
    import json
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    configs = [
        ("gl", {}),
        ("gl-n2048", {"BENCH_CONFIG": "gl", "BENCH_NUM_ROWS": "2048",
                      "BENCH_DISTINCT": "8"}),
        ("bn254", {"BENCH_CONFIG": "bn254"}),
        ("plonk", {"BENCH_CONFIG": "plonk", "BENCH_DISTINCT": "4"}),
    ]
    failures = []
    for name, extra in configs:
        env = {**os.environ, "BENCH_CONFIG": "gl", "BENCH_BATCH": "256",
               "BENCH_ITERS": "2", "BENCH_EPOCHS": "1", "BENCH_ROOFLINE": "0",
               "BENCH_ALLDISTINCT": "0", "BENCH_DISTINCT": "16", **extra}
        t0 = time.time()
        p = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                           env=env, capture_output=True, text=True,
                           timeout=3600)
        took = time.time() - t0
        line = next((l for l in p.stdout.splitlines()
                     if l.startswith("{")), "")
        ok = p.returncode == 0 and line
        if ok:
            val = json.loads(line)
            floor = float(os.environ.get(
                f"BENCH_FLOOR_{name.upper().replace('-', '_')}",
                _PREFLIGHT_FLOORS.get(name, 0.0)))
            if val["value"] < floor:
                failures.append(f"{name} (perf: {val['value']} < {floor})")
                print(f"preflight {name}: PERF REGRESSION  {val['value']} "
                      f"{val['unit']} < floor {floor} ({took:.0f}s)",
                      flush=True)
            else:
                print(f"preflight {name}: OK  {val['value']} {val['unit']} "
                      f">= floor {floor} ({took:.0f}s)", flush=True)
        else:
            failures.append(name)
            print(f"preflight {name}: FAILED rc={p.returncode} ({took:.0f}s)\n"
                  f"{p.stderr[-2000:]}", flush=True)
    if failures:
        raise SystemExit(f"PREFLIGHT FAILED: {failures}")
    print("ALL BENCH CONFIGS PREFLIGHT OK", flush=True)


if __name__ == "__main__":
    main()
    if "--preflight" in sys.argv:
        sharded_kernel_preflight()
        bench_configs_preflight()
