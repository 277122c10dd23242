"""Speed-of-light microbenchmarks for the roofline accounting.

Measures the achievable Goldilocks-multiply rate on this chip: a fully
data-dependent chain of `gl.mul` over wide (8, N) planes — every lane does
`iters` serial modmuls, lanes run in parallel, nothing can be skipped or
overlapped away (the chain ends in a host fetch).  This is the denominator
of BASELINE.json's stated metric ("Goldilocks muls/sec vs speed-of-light"):

    pct_speed_of_light = verifier_gl_mul_per_sec / sol_gl_mul_per_sec

where the numerator = (op-census gl_muls per proof) x (proofs/sec).

Run directly for a one-off report: python tools/sol_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_gl_mul_sol(n_lanes=1 << 21, chain=256, reps=3):
    """Returns (gl_mul_per_sec, seconds_per_rep)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from halo2_plonky2_verifier_tpu.ops import goldilocks as gl
    from halo2_plonky2_verifier_tpu.utils.compile import smart_jit

    rng = np.random.default_rng(0)
    x = rng.integers(0, gl.P, size=(8, n_lanes), dtype=np.uint64)
    y = rng.integers(1, gl.P, size=(8, n_lanes), dtype=np.uint64)
    xp = gl.from_u64(x)
    yp = gl.from_u64(y)

    def chained(xp, yp):
        def body(carry, _):
            return gl.mul(carry, yp), None

        out, _ = jax.lax.scan(body, xp, None, length=chain)
        return out

    f = smart_jit(chained)
    out = f(xp, yp)
    np.asarray(out[0])  # compile + warm

    # serially-dependent reps, one trailing host fetch (per-rep fetches would
    # bill the tunnel round-trip to the mul stream)
    t0 = time.time()
    for _ in range(reps):
        xp = f(xp, yp)
    np.asarray(xp[0])
    dt = (time.time() - t0) / reps
    total_muls = 8 * n_lanes * chain
    return total_muls / dt, dt


def measure_poseidon_sol(reps=3):
    """Peak permutations/sec of the standalone fused Pallas kernel — the
    ceiling the verifier's fused Merkle/transcript kernels run against.

    Probes two regimes and returns the max (the true ceiling is whichever
    the scheduler pipelines better on this chip):
      - chained: serial permutations INSIDE one kernel, state VMEM-resident
        (one HBM read + one write total; pure compute, but the in-kernel
        fori_loop can pipeline worse across grid steps);
      - streamed: one permutation per kernel pass over a very wide plane
        (HBM traffic per perm, but grid-step double-buffering hides it —
        the regime the verifier's big level scans actually run in).
    Returns (perm_per_sec, sec_of_best_probe)."""
    import jax
    import numpy as np

    from halo2_plonky2_verifier_tpu.ops import goldilocks as gl
    from halo2_plonky2_verifier_tpu.ops import poseidon_pallas

    if jax.default_backend() == "cpu":  # pallas-TPU kernel; CPU has no SOL
        return float("nan"), float("nan")

    rng = np.random.default_rng(1)

    def probe_fn(fn, planes, perms_per_call, reps):
        out = fn(*planes)
        np.asarray(out[0])  # compile + warm
        # serially-dependent reps with ONE host fetch at the end: per-rep
        # fetches would bill the tunnel round-trip to the kernel
        t0 = time.time()
        for _ in range(reps):
            out = fn(out[0], out[1])
        np.asarray(out[0])
        dt = (time.time() - t0) / reps
        return perms_per_call / dt, dt

    def probe(n_states, fn, perms_per_call):
        s = rng.integers(0, gl.P, size=(12, n_states), dtype=np.uint64)
        return probe_fn(fn, gl.from_u64(s), perms_per_call, reps)

    chain = 64
    n_chained = 1 << 18
    chained = jax.jit(lambda h, l: poseidon_pallas.permute_planes_chained(
        h, l, chain=chain))
    r1, t1 = probe(n_chained, chained, n_chained * chain)

    n_stream = 1 << 21
    streamed = jax.jit(poseidon_pallas.permute_planes)
    r2, t2 = probe(n_stream, streamed, n_stream)

    # middle regime: short in-kernel chains over a wide streamed plane —
    # HBM traffic amortized over a few perms AND grid-step double-buffering
    # intact (closest to how the fused Merkle level loop actually runs)
    n_mid = 1 << 20
    mid = jax.jit(lambda h, l: poseidon_pallas.permute_planes_chained(
        h, l, chain=4))
    r3, t3 = probe(n_mid, mid, n_mid * 4)

    # the verifier's own hottest kernel, standalone: the fused whole-path
    # Merkle kernel at a bench-like depth, all levels active.  The verifier
    # cannot run its Merkle work faster than this kernel runs with zero glue,
    # so including it makes the SOL an actual ceiling (round-3's probe set
    # measured BELOW the fused scans and the roofline read 117%).
    from halo2_plonky2_verifier_tpu.ops import merkle_pallas

    d_max, n_mk = 8, 1 << 19
    sib = rng.integers(0, gl.P, size=(d_max, 4, n_mk), dtype=np.uint64)
    node = rng.integers(0, gl.P, size=(4, n_mk), dtype=np.uint64)
    idx = np.zeros((n_mk,), dtype=np.uint32)
    act = np.ones((d_max, n_mk), dtype=np.uint32)
    sib_p = gl.from_u64(sib)
    mk = jax.jit(lambda h, l: merkle_pallas.verify_paths_planes(
        (h, l), sib_p, idx, act))
    r4, t4 = probe_fn(mk, gl.from_u64(node), n_mk * d_max, reps)

    if os.environ.get("SOL_VERBOSE"):
        for name, r, t in (("chained", r1, t1), ("streamed", r2, t2),
                           ("mid", r3, t3), ("merkle-path", r4, t4)):
            print(f"  sol probe {name:12s}: {r/1e6:8.2f} M perm/s "
                  f"({t*1e3:.1f} ms/rep)")
    return max((r1, t1), (r2, t2), (r3, t3), (r4, t4))


if __name__ == "__main__":
    import jax

    sol, t = measure_gl_mul_sol()
    print(f"gl_mul speed-of-light: {sol/1e9:.2f} G muls/s  ({t*1e3:.1f} ms/rep)"
          f"  device={jax.devices()[0].device_kind}")
    pps, t2 = measure_poseidon_sol()
    print(f"poseidon permute (fused planes): {pps/1e6:.2f} M perm/s "
          f"({t2*1e3:.1f} ms/rep)")
    # a permutation is ~118 gl_mul-equivalents by the op census
    print(f"  = {pps*118/1e9:.2f} G gl_mul-equiv/s")
