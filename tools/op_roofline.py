"""Static op-count roofline (VERDICT r4 item 2b).

The denominators are STATIC: u32 VPU element-ops and MXU flops per Poseidon
permutation, counted by tracing the kernels' own round structure with
jax.make_jaxpr (the pure plane functions the Pallas kernels are built from)
and walking the jaxpr — the machine-independent analog of the reference's
advice-cell counts (BASELINE.md).  Only the numerators are measured: a raw
u32 multiply-add probe (trivially VPU-bound) and a bf16 matmul probe
(trivially MXU-bound) give the chip's achievable elementwise / matmul rates.

    theoretical_perm_per_sec = min(vpu_rate / vpu_ops_per_perm,
                                   mxu_rate / mxu_flops_per_perm)
    kernel_mfu_pct = 100 * measured_perm_per_sec / theoretical_perm_per_sec

Unlike the standalone-kernel probes in sol_bench.py (which measure a
specific launch configuration and historically UNDER-measured the fused
in-scan regime, VERDICT r3/r4), this ceiling can only be approached, never
beaten by scheduling luck — an MFU above 100% would indicate a counting
bug, not a fast kernel.

Usage: python tools/op_roofline.py [gl|bn254|counts]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


# ----------------------------------------------------------------------------
# jaxpr walking
# ----------------------------------------------------------------------------

# elementwise primitives executed on the VPU, 1 op per output element
_VPU_PRIMS = {
    "add", "sub", "mul", "and", "or", "xor", "not", "neg",
    "shift_left", "shift_right_logical", "shift_right_arithmetic",
    "select_n", "max", "min", "rem", "div",
    "lt", "le", "gt", "ge", "eq", "ne",
    "convert_element_type", "roll",
}
# pure layout/bookkeeping primitives, counted as zero compute
_FREE_PRIMS = {
    "broadcast_in_dim", "reshape", "squeeze", "transpose", "slice",
    "concatenate", "pad", "gather", "dynamic_slice", "rev",
    "copy", "stop_gradient", "constant",
}


def _nelems(aval):
    n = 1
    for d in aval.shape:
        n *= d
    return n


def _count_jaxpr(jaxpr, mult=1, acc=None):
    """Walk a jaxpr, accumulating {vpu, vpu_mul, mxu_flops}; recurses into
    pjit/scan/cond bodies (scan bodies weighted by trip count)."""
    if acc is None:
        acc = {"vpu": 0, "vpu_mul": 0, "mxu_flops": 0, "other": {}}
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            dim_numbers = eqn.params["dimension_numbers"]
            (lhs_c, _rhs_c), _ = dim_numbers
            lhs = eqn.invars[0].aval
            k = 1
            for d in lhs_c:
                k *= lhs.shape[d]
            out = _nelems(eqn.outvars[0].aval)
            acc["mxu_flops"] += 2 * out * k * mult
        elif name in ("pjit", "jit", "closed_call", "custom_jvp_call",
                      "custom_vjp_call", "remat"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                _count_jaxpr(getattr(inner, "jaxpr", inner), mult, acc)
        elif name == "scan":
            inner = eqn.params["jaxpr"]
            _count_jaxpr(inner.jaxpr, mult * eqn.params["length"], acc)
        elif name == "while":
            raise ValueError("while_loop is not statically countable")
        elif name == "cond":
            # count the worst branch
            best = None
            for br in eqn.params["branches"]:
                sub = _count_jaxpr(br.jaxpr, mult)
                if best is None or sub["vpu"] > best["vpu"]:
                    best = sub
            for key in ("vpu", "vpu_mul", "mxu_flops"):
                acc[key] += best[key]
        elif name in _VPU_PRIMS:
            if name == "convert_element_type":
                # same-width int<->int converts are bitcasts (free); only
                # int<->float and width-changing casts execute on the VPU
                src = eqn.invars[0].aval.dtype
                dst = eqn.outvars[0].aval.dtype
                if (np.issubdtype(src, np.integer)
                        and np.issubdtype(dst, np.integer)
                        and src.itemsize == dst.itemsize):
                    continue
            n = _nelems(eqn.outvars[0].aval) * mult
            acc["vpu"] += n
            if name == "mul":
                acc["vpu_mul"] += n
        elif name in _FREE_PRIMS or name == "iota":
            pass
        else:
            acc["other"][name] = acc["other"].get(name, 0) + 1
    return acc


# ----------------------------------------------------------------------------
# Static per-permutation counts
# ----------------------------------------------------------------------------

def count_gl_perm_ops(groups=None, T=128):
    """(vpu_ops, mxu_flops) per Poseidon-GL permutation, from the fused
    kernel's own round structure (ops/poseidon_pallas._permute_planes)."""
    import jax
    import jax.numpy as jnp

    from halo2_plonky2_verifier_tpu.ops import poseidon_pallas as pp

    g = groups or pp.default_groups()
    rc_hi, rc_lo = pp.rc_planes(g)
    mds = pp.mds_operand(g)
    hi = jnp.zeros((12 * g, T), jnp.uint32)
    lo = jnp.zeros((12 * g, T), jnp.uint32)
    jaxpr = jax.make_jaxpr(
        lambda h, l: pp._permute_planes(h, l, rc_hi, rc_lo, mds, g))(hi, lo)
    acc = _count_jaxpr(jaxpr.jaxpr)
    states = g * T          # element-major: each lane column carries g states
    return acc["vpu"] / states, acc["mxu_flops"] / states


def count_bn254_perm_ops(T=256):
    """(vpu_ops, mxu_flops) per Poseidon-BN254 permutation.  Mirrors
    ops/poseidon_bn254_pallas._run_rounds with the round constants as traced
    VALUES (the kernel takes a Ref); the body calls the kernel module's own
    building blocks, so op counts track the shipped kernel."""
    import jax
    import jax.numpy as jnp

    from halo2_plonky2_verifier_tpu.ops import bn254_planes as frp
    from halo2_plonky2_verifier_tpu.ops import poseidon_bn254_pallas as pbp

    pbp._get_tables()
    rc = jnp.asarray(pbp._RC_NP)
    a_mat = jnp.asarray(pbp._get_mds_a(), dtype=jnp.bfloat16)
    a_redc = jnp.asarray(pbp._get_redc_a(), dtype=jnp.bfloat16)
    a_redc1 = jnp.asarray(pbp._get_redc_a(1), dtype=jnp.bfloat16)
    R, H = pbp._ROUNDS, pbp._HALF

    def f(state):                                   # (64, T) Montgomery
        st = pbp._split(state, T)
        for r in range(R):
            full = r < H or r >= R - H
            rcr = rc[r]
            st = tuple(frp.add_lazy(st[i], rcr[16 * i:16 * (i + 1)])
                       for i in range(4))
            if pbp._REDC_MXU:
                if full:
                    x2 = pbp._redc_mxu([frp.school_sq(s) for s in st], a_redc)
                    x4 = pbp._redc_mxu([frp.school_sq(s) for s in x2], a_redc)
                    st = tuple(pbp._redc_mxu(
                        [frp.school(a, b) for a, b in zip(x4, st)], a_redc))
                else:
                    x = st[0]
                    x2 = pbp._redc_mxu([frp.school_sq(x)], a_redc1)[0]
                    x4 = pbp._redc_mxu([frp.school_sq(x2)], a_redc1)[0]
                    x5 = pbp._redc_mxu([frp.school(x4, x)], a_redc1)[0]
                    st = (x5,) + st[1:]
            elif full:
                st = tuple(pbp._sbox5(s) for s in st)
            else:
                st = (pbp._sbox5(st[0]),) + st[1:]
            st = pbp._mix_mxu(st, a_mat, a_redc if pbp._REDC_MXU else None)
        st = tuple(frp.cond_sub_p(s) for s in st)
        return jnp.concatenate(st, axis=0)

    jaxpr = jax.make_jaxpr(f)(jnp.zeros((64, T), jnp.uint32))
    acc = _count_jaxpr(jaxpr.jaxpr)
    return acc["vpu"] / T, acc["mxu_flops"] / T


# ----------------------------------------------------------------------------
# Measured unit rates
# ----------------------------------------------------------------------------

def _timed_best(run, epochs):
    best = float("inf")
    for _ in range(epochs):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return best


def measure_vpu_u32_rate(rows=256, cols=16384, chain=1024, epochs=3):
    """Achievable raw u32 elementwise rate: a dependent square-add chain on
    a vreg-aligned array (2 VPU ops per element per step, no memory traffic
    after the first load).  Squaring makes every step non-affine, so XLA
    cannot algebraically collapse the chain (an x*a+b chain composes into
    one affine map and measured 14e12 'ops'/s — a folding artifact).

    Measurement protocol for the tunneled axon backend: np.asarray of a
    scalar reduction is the only true barrier (block_until_ready returns
    early), and the rate is taken as the DIFFERENCE between a chain and a
    2x chain so constant dispatch/tunnel latency cancels.  ops/sec."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    b = np.uint32(0x9E3779B9)

    # op mix matched to the GL kernel's static census (~5% of VPU ops are
    # u32 multiplies; the rest are adds/shifts/masks/compares): one mul per
    # 19 cheap ops, all dependent so nothing collapses.
    def step(i, v):
        v = v * v + b                       # mul, add
        for _ in range(6):
            v = (v + b) ^ (v >> np.uint32(7))   # add, xor, shift  x6
        return v
    _OPS_PER_STEP = 20

    @partial(jax.jit, static_argnums=1)
    def f(x, n):
        x = jax.lax.fori_loop(0, n, step, x)
        return jnp.sum(x)    # scalar fetch; depends on every element

    x = jnp.arange(rows * cols, dtype=jnp.uint32).reshape(rows, cols)
    np.asarray(f(x, chain)), np.asarray(f(x, 2 * chain))   # compile both
    t1 = _timed_best(lambda: np.asarray(f(x, chain)), epochs)
    t2 = _timed_best(lambda: np.asarray(f(x, 2 * chain)), epochs)
    assert t2 > t1, "probe not compute-bound; raise chain"
    return rows * cols * chain * _OPS_PER_STEP / (t2 - t1)


def measure_mxu_bf16_rate(n=1024, chain=512, epochs=3):
    """Achievable bf16 matmul rate (flops/sec) with f32 accumulation — the
    MDS/REDC conv-matmuls' regime.  Same chain-difference protocol as
    measure_vpu_u32_rate (cancels tunnel latency)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def f(x, y, m):
        def body(i, v):
            return jax.lax.dot(v, y,
                               precision=None,
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)
        x = jax.lax.fori_loop(0, m, body, x)
        return jnp.sum(x.astype(jnp.float32))   # scalar fetch barrier

    key = jax.random.PRNGKey(0)
    # zero-mean random operands: nothing is compile-time constant or
    # algebraically collapsible
    x = (jax.random.normal(key, (n, n)) * 0.03).astype(jnp.bfloat16)
    y = (jax.random.normal(jax.random.PRNGKey(1), (n, n)) * 0.03
         ).astype(jnp.bfloat16)
    np.asarray(f(x, y, chain)), np.asarray(f(x, y, 2 * chain))
    t1 = _timed_best(lambda: np.asarray(f(x, y, chain)), epochs)
    t2 = _timed_best(lambda: np.asarray(f(x, y, 2 * chain)), epochs)
    assert t2 > t1, "probe not compute-bound; raise chain"
    return 2.0 * n * n * n * chain / (t2 - t1)


# ----------------------------------------------------------------------------
# MFU
# ----------------------------------------------------------------------------

def _mfu(prefix, vpu_per_perm, mxu_per_perm, measured_perm_rate,
         vpu_rate=None, mxu_rate=None):
    vpu_rate = vpu_rate or measure_vpu_u32_rate()
    mxu_rate = mxu_rate or measure_mxu_bf16_rate()
    t_vpu = vpu_per_perm / vpu_rate
    t_mxu = mxu_per_perm / mxu_rate
    theoretical = 1.0 / max(t_vpu, t_mxu)
    out = {
        f"{prefix}_vpu_ops_per_perm": int(vpu_per_perm),
        f"{prefix}_mxu_flops_per_perm": int(mxu_per_perm),
        f"{prefix}_theoretical_perm_per_sec": round(theoretical, 0),
        f"{prefix}_bound_by": "vpu" if t_vpu >= t_mxu else "mxu",
        "vpu_u32_ops_per_sec": round(vpu_rate, 0),
        "mxu_bf16_flops_per_sec": round(mxu_rate, 0),
    }
    if measured_perm_rate:
        out[f"{prefix}_kernel_mfu_pct"] = round(
            100.0 * measured_perm_rate / theoretical, 2)
    return out


def gl_kernel_mfu(measured_perm_rate=None, vpu_rate=None, mxu_rate=None):
    v, m = count_gl_perm_ops()
    return _mfu("gl", v, m, measured_perm_rate, vpu_rate, mxu_rate)


def bn254_kernel_mfu(measured_perm_rate=None, vpu_rate=None, mxu_rate=None):
    v, m = count_bn254_perm_ops()
    return _mfu("bn254", v, m, measured_perm_rate, vpu_rate, mxu_rate)


def main():
    import json

    mode = sys.argv[1] if len(sys.argv) > 1 else "counts"
    if mode == "counts":
        gv, gm = count_gl_perm_ops()
        bv, bm = count_bn254_perm_ops()
        print(json.dumps({
            "gl_vpu_ops_per_perm": int(gv),
            "gl_mxu_flops_per_perm": int(gm),
            "bn254_vpu_ops_per_perm": int(bv),
            "bn254_mxu_flops_per_perm": int(bm),
        }))
        return
    vpu = measure_vpu_u32_rate()
    mxu = measure_mxu_bf16_rate()
    if mode == "gl":
        print(json.dumps(gl_kernel_mfu(vpu_rate=vpu, mxu_rate=mxu)))
    elif mode == "bn254":
        print(json.dumps(bn254_kernel_mfu(vpu_rate=vpu, mxu_rate=mxu)))
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
