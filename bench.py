"""Benchmark: Fibonacci-STARK FRI verifications/sec on one chip.

Flagship workload = the reference's profiled configuration
(test_fibonacci_stark_gl with n=2^5 rows, StarkConfig::standard_fast_config —
see BASELINE.md): full verification including transcript, 84 FRI query
rounds, merged Merkle checks, and the vanishing-polynomial consistency check
the reference leaves WIP.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json north-star target of
10,000 verifications/sec/chip (the reference publishes no wall-clock numbers).
"""

import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import numpy as np

    from halo2_plonky2_verifier_tpu import build_verifier, load_proofs, proof_shape
    from halo2_plonky2_verifier_tpu.utils.compile import (
        enable_persistent_cache, smart_jit)

    # persistent compilation cache: repeat bench runs skip the big compile
    enable_persistent_cache()

    num_rows = int(os.environ.get("BENCH_NUM_ROWS", "32"))
    bench_config = os.environ.get("BENCH_CONFIG", "gl")  # gl | bn254 | plonk
    # measured batch curve on v5e (round 3, G=8 kernels): 56.0k / 67.5k /
    # 71.5k / 73.5k proofs/s at B=512/1024/2048/4096 — wider batches amortize
    # per-dispatch latency; 4096 is near the plateau and fits HBM comfortably
    batch_size = int(os.environ.get("BENCH_BATCH", "4096"))
    # sub-batches scanned inside one jit call: amortizes dispatch overhead
    # while keeping the per-step working set cache-friendly
    sub_batches = int(os.environ.get("BENCH_SUBBATCHES", "1"))
    iters = int(os.environ.get("BENCH_ITERS", "15"))

    distinct = min(int(os.environ.get("BENCH_DISTINCT", "32")), batch_size)
    from halo2_plonky2_verifier_tpu.refimpl import hashers
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import (
        get_fibonacci_batch_columnar, get_plonk_proof_batch)
    t_load = time.time()
    if bench_config == "plonk":
        # plonky2-PLONK proofs of the bench circuit at the
        # standard_recursion_config FRI shape (rate 1/8, 28 queries, arity 16)
        from halo2_plonky2_verifier_tpu.plonk import (
            build_plonk_verifier, load_plonk_proofs, plonk_proof_shape)
        common, verifier_data, proofs = get_plonk_proof_batch(distinct)
        pshape = plonk_proof_shape(common, len(proofs[0].public_inputs))
        batch = load_plonk_proofs(proofs, pshape, verifier_data)
        degree_bits = common.degree_bits
    else:
        hasher_ref = hashers.BN254 if bench_config == "bn254" else None
        hasher = ("poseidon_bn254" if bench_config == "bn254"
                  else "poseidon_goldilocks")
        stark, config, batch = get_fibonacci_batch_columnar(
            num_rows, distinct, hasher=hasher_ref)
        degree_bits = batch.shape.degree_bits
        shape = batch.shape
    if batch_size > distinct:
        # tile the columnar batch up to batch_size (array-level, no per-proof
        # work)
        import jax.numpy as jnp
        reps = (batch_size + distinct - 1) // distinct
        batch = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x] * reps, axis=0)[:batch_size], batch)
    load_s = time.time() - t_load

    if bench_config == "plonk":
        verify_one = build_plonk_verifier(common, verifier_data)
    else:
        verify_one = build_verifier(stark, config, degree_bits, hasher=hasher)
    batch_small, small_size = batch, batch_size  # for the op census
    if sub_batches > 1:
        batch = jax.tree_util.tree_map(
            lambda x: jax.numpy.stack([x] * sub_batches), batch)
        batch_size = batch_size * sub_batches

        def verify_fn(b):
            return jax.lax.map(verify_one, b).reshape(-1)
    else:
        verify_fn = verify_one
    verify = smart_jit(verify_fn)
    t0 = time.time()
    verdict = np.asarray(verify(batch))
    compile_s = time.time() - t0
    assert verdict.all(), "benchmark proofs must verify"

    # timed region: verdicts are AND-chained so every execution's result is
    # data-dependent on the previous one and the final host fetch is a true
    # barrier for all of them (async dispatch still overlaps dispatch with
    # device work, but nothing can be skipped or left in flight).  Best of 3
    # epochs: the tunneled backend adds high-variance host latency that a
    # single epoch cannot average away.
    epochs = int(os.environ.get("BENCH_EPOCHS", "3"))
    dt = float("inf")
    for _ in range(epochs):
        t0 = time.time()
        vacc = verify(batch)
        for _ in range(iters - 1):
            vacc = vacc & verify(batch)
        final = np.asarray(vacc)
        dt = min(dt, (time.time() - t0) / iters)
        assert final.all()
    proofs_per_sec = batch_size / dt

    # all-distinct re-proof (VERDICT r3 weak #5): the SAME compiled verifier,
    # same batch size, but every proof genuinely different — reported next to
    # the tiled number every round so "tiling doesn't flatter" stays measured
    # on the current kernels, not cited from round 2.  Only runs when the
    # fixture cache exists (gitignored at 47 MB — regenerate in ~5 min with
    # refimpl.fixtures.get_fibonacci_batch_columnar(32, 4096); never burns
    # driver time regenerating implicitly).
    # when BENCH_SUBBATCHES>1 the stacked copies would repeat the SAME small
    # all-distinct batch, so the line would be distinct-per-sub-batch only —
    # exactly the tiling flattery the metric exists to rule out; skip it.
    value_all_distinct = None
    if (bench_config == "gl" and num_rows == 32 and sub_batches == 1
            and os.environ.get("BENCH_ALLDISTINCT", "1") == "1"):
        from halo2_plonky2_verifier_tpu.refimpl.fixtures import FIXTURE_DIR
        npz_path = os.path.join(FIXTURE_DIR,
                                f"fib_stark_n{num_rows}_x{small_size}.npz")
        if os.path.exists(npz_path):
            _, _, batch_d = get_fibonacci_batch_columnar(num_rows, small_size)
            # npz loading leaves host numpy arrays: device_put ONCE, or every
            # timed call re-ships ~47 MB over the tunnel (measured 65x slower)
            batch_d = jax.device_put(batch_d)
            jax.block_until_ready(jax.tree_util.tree_leaves(batch_d))
            dt_d = float("inf")
            for _ in range(epochs):
                t0 = time.time()
                vacc = verify(batch_d)
                for _ in range(iters - 1):
                    vacc = vacc & verify(batch_d)
                final = np.asarray(vacc)
                dt_d = min(dt_d, (time.time() - t0) / iters)
                assert final.all()
            value_all_distinct = round(batch_size / dt_d, 1)
        else:
            print(f"# all-distinct fixture missing ({npz_path}); skipped — "
                  "regenerate: python -c \"from halo2_plonky2_verifier_tpu."
                  "refimpl.fixtures import get_fibonacci_batch_columnar as g;"
                  " g(32, 4096)\"", file=sys.stderr)

    target = 10_000.0  # BASELINE.json north-star (v5p); reference has no numbers
    metric = "fib_stark_fri_verifications_per_sec_per_chip"
    if bench_config == "bn254":
        metric = "fib_stark_fri_verifications_per_sec_per_chip_bn254"
    elif bench_config == "plonk":
        metric = "plonky2_plonk_verifications_per_sec_per_chip"
    result = {
        "metric": metric,
        "value": round(proofs_per_sec, 1),
        "unit": "proofs/s",
        "vs_baseline": round(proofs_per_sec / target, 4),
    }
    if value_all_distinct is not None:
        result["value_all_distinct"] = value_all_distinct
        result["distinct_tiled"] = distinct

    # Roofline / MFU accounting (BASELINE.json's stated metric: Goldilocks
    # muls/sec vs speed-of-light).  Two-level roofline:
    #   - op census (exact trace-time counts, the MockProver-cell analog)
    #     gives gl_mul/proof and poseidon permutations/proof;
    #   - the binding resource is the VPU running the fused Poseidon kernel;
    #     `kernel_sol_perm_per_sec` is the best standalone-probe rate
    #     (tools/sol_bench.py: chained / streamed / mid / the verifier's own
    #     fused whole-path Merkle kernel).
    #   - `integration_efficiency_pct` = verifier perm rate vs the best KNOWN
    #     rate of this kernel *including the verifier itself* — <= 100 by
    #     construction.  100 means the full verifier (transcript, FRI glue,
    #     canonicality, verdict lanes all included) runs its hash kernel at
    #     least as fast as any standalone configuration we can write — i.e.
    #     measured integration overhead is zero.  (Round 3 reported this as
    #     pct_speed_of_light = 117%, which read as super-SOL: the standalone
    #     probes UNDER-measure the fused in-scan regime and are tunnel-noisy,
    #     so the probe is not a true ceiling; see VERDICT r3 weak #3.)
    #   - gl_mul_per_sec (census x proofs/s) is reported for the BASELINE
    #     metric; note the census counts jnp-equivalent muls, which the
    #     fused kernels undercut (limb-plane MDS), so this can legitimately
    #     exceed a naive gl.mul-stream rate.
    if os.environ.get("BENCH_ROOFLINE", "1") == "1" and bench_config == "gl":
        from halo2_plonky2_verifier_tpu.stark import build_merkle_only_verifier
        from halo2_plonky2_verifier_tpu.utils import profiling

        tree = profiling.profile_verifier(verify_one, batch_small)
        muls_per_proof = tree.root.total("gl_mul") / small_size
        perms_per_proof = tree.root.total("poseidon_permute") / small_size
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from sol_bench import measure_poseidon_sol

        perm_sol, _ = measure_poseidon_sol()
        perm_rate = perms_per_proof * proofs_per_sec
        result["gl_mul_per_proof"] = int(muls_per_proof)
        result["gl_mul_per_sec"] = round(muls_per_proof * proofs_per_sec, 0)
        result["poseidon_perm_per_proof"] = int(perms_per_proof)
        result["poseidon_perm_per_sec"] = round(perm_rate, 0)
        result["kernel_sol_perm_per_sec"] = round(perm_sol, 0)

        # ---- stripped-verifier probe (VERDICT r4 item 2a) -----------------
        # Same batch, same layouts, ONLY the merged Merkle kernels: its perm
        # rate is an in-context ceiling, so the ratio below is a falsifiable
        # integration efficiency (drops when non-Merkle overhead grows; can
        # also exceed 100 if the extra work overlaps better than it costs —
        # report the raw ratio, no clamp).
        stripped_one = build_merkle_only_verifier(
            stark, config, degree_bits, hasher=hasher)
        s_tree = profiling.profile_verifier(stripped_one, batch_small)
        s_perms_per_proof = s_tree.root.total("poseidon_permute") / small_size
        if sub_batches > 1:
            def stripped_fn(b):
                return jax.lax.map(stripped_one, b).reshape(-1)
        else:
            stripped_fn = stripped_one
        stripped = smart_jit(stripped_fn)
        np.asarray(stripped(batch))         # compile
        dt_s = float("inf")
        for _ in range(epochs):
            t0 = time.time()
            acc = stripped(batch)
            for _ in range(iters - 1):
                acc = acc & stripped(batch)
            np.asarray(acc)
            dt_s = min(dt_s, (time.time() - t0) / iters)
        stripped_rate = s_perms_per_proof * (batch_size / dt_s)
        result["merkle_only_perm_per_proof"] = int(s_perms_per_proof)
        result["merkle_only_perm_per_sec"] = round(stripped_rate, 0)
        result["integration_efficiency_pct"] = round(
            100.0 * perm_rate / stripped_rate, 2)

        # ---- static op-count MFU (VERDICT r4 item 2b) ----------------------
        try:
            from op_roofline import gl_kernel_mfu

            mfu = gl_kernel_mfu(perm_rate)
            result.update(mfu)
        except Exception as e:  # pragma: no cover - probe must never kill bench
            print(f"# op_roofline failed: {e}", file=sys.stderr)

    if os.environ.get("BENCH_ROOFLINE", "1") == "1" and bench_config == "bn254":
        # BN254 kernel MFU: static op count vs measured in-verifier perm rate
        from halo2_plonky2_verifier_tpu.utils import profiling

        tree = profiling.profile_verifier(verify_one, batch_small)
        perms_per_proof = tree.root.total("poseidon_bn254_permute") / small_size
        perm_rate = perms_per_proof * proofs_per_sec
        result["poseidon_bn254_perm_per_proof"] = int(perms_per_proof)
        result["poseidon_bn254_perm_per_sec"] = round(perm_rate, 0)
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        try:
            from op_roofline import bn254_kernel_mfu

            result.update(bn254_kernel_mfu(perm_rate))
        except Exception as e:  # pragma: no cover
            print(f"# op_roofline failed: {e}", file=sys.stderr)

    print(json.dumps(result))
    print(f"# n=2^{degree_bits} rows, batch={batch_size} ({distinct} distinct), "
          f"{dt*1e3:.1f} ms/batch, load {load_s:.1f}s, compile {compile_s:.0f}s, "
          f"device={jax.devices()[0].device_kind}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
