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

    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = f(xp, yp)
        # chain across reps too: feed output back in
        xp = out
        np.asarray(out[0])
        best = min(best, time.time() - t0)
    total_muls = 8 * n_lanes * chain
    return total_muls / best, best


def measure_poseidon_sol(n_states=1 << 19, chain=8, reps=3):
    """Permutations/sec through the fused Pallas kernel on (12, N) planes,
    chained so nothing overlaps away.  Returns (perm_per_sec, sec)."""
    import jax
    import numpy as np

    from halo2_plonky2_verifier_tpu.ops import goldilocks as gl
    from halo2_plonky2_verifier_tpu.ops import poseidon
    from halo2_plonky2_verifier_tpu.utils.compile import smart_jit

    rng = np.random.default_rng(1)
    s = rng.integers(0, gl.P, size=(12, n_states), dtype=np.uint64)
    sp = gl.from_u64(s)

    def chained(sp):
        for _ in range(chain):
            sp = poseidon.permute_planes(sp)
        return sp

    f = smart_jit(chained)
    out = f(sp)
    np.asarray(out[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = f(out)
        np.asarray(out[0])
        best = min(best, time.time() - t0)
    return n_states * chain / best, best


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
