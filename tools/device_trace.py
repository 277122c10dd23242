"""Capture an on-device jax.profiler trace of the flagship verifier.

Writes a TensorBoard-compatible trace (profile_trace/<ts>/) whose XLA op
names carry the jax.named_scope annotations threaded by utils.profiling
(get_stark_challenges / verify_merkle_proofs / two_to_one / ...), so device
time can be attributed to the same frames as the static op census.

Falls back to a phase-ablation wall-clock breakdown when the profiler cannot
attach (the tunneled axon backend does not always support trace capture):
each phase's cost is measured by differencing chained-barrier timings of the
full verifier vs the verifier with that phase's verdict contribution
short-circuited.

Usage: python tools/device_trace.py [out_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from halo2_plonky2_verifier_tpu import build_verifier
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import (
        get_fibonacci_batch_columnar)
    from halo2_plonky2_verifier_tpu.utils.compile import (
        enable_persistent_cache, smart_jit)

    enable_persistent_cache()
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "profile_trace"
    bench_config = os.environ.get("BENCH_CONFIG", "gl")  # gl | bn254
    from halo2_plonky2_verifier_tpu.refimpl import hashers
    hasher_ref = hashers.BN254 if bench_config == "bn254" else None
    hasher = ("poseidon_bn254" if bench_config == "bn254"
              else "poseidon_goldilocks")
    stark, config, batch = get_fibonacci_batch_columnar(
        32, 32, hasher=hasher_ref)
    import jax.numpy as jnp

    B = 1024 if bench_config == "gl" else 256
    reps = (B + batch.batch_size - 1) // batch.batch_size
    batch = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * reps, axis=0)[:B], batch)
    verify = smart_jit(build_verifier(stark, config, batch.shape.degree_bits,
                                      hasher=hasher))
    np.asarray(verify(batch))  # compile + warm

    try:
        with jax.profiler.trace(out_dir):
            v = verify(batch)
            for _ in range(3):
                v = v & verify(batch)
            np.asarray(v)
        print(f"device trace written to {out_dir}/ "
              f"(inspect with tensorboard or xprof)")
        return
    except Exception as e:  # tunneled backends may refuse to trace
        print(f"profiler trace unavailable ({type(e).__name__}: {e}); "
              f"falling back to wall-clock phase ablation", file=sys.stderr)

    def timed(fn, iters=10):
        v = fn(batch)
        np.asarray(v)
        t0 = time.time()
        v = fn(batch)
        for _ in range(iters - 1):
            v = v & fn(batch)
        np.asarray(v)
        return (time.time() - t0) / iters

    full = timed(verify)
    no_vanish = smart_jit(build_verifier(stark, config,
                                         batch.shape.degree_bits,
                                         check_vanishing=False))
    t_nv = timed(no_vanish)
    print(f"full verify:            {full*1e3:8.2f} ms/batch (B={B})")
    print(f"without vanishing check:{t_nv*1e3:8.2f} ms/batch "
          f"(vanishing ~ {(full-t_nv)*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
