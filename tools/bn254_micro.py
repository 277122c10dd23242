"""Microbenchmarks for the BN254 Poseidon kernel's component costs on the
real chip: where does the VPU-bound round chain actually spend its time,
and does interleaving two independent chains overlap MXU/VPU work?

Each probe is a Pallas kernel running CHAIN dependent iterations of one
component over a (16, T) plane; reported as ns per iteration per T lanes.

Usage: python tools/bn254_micro.py   (axon TPU backend)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halo2_plonky2_verifier_tpu.ops import bn254 as fr
from halo2_plonky2_verifier_tpu.ops import bn254_planes as frp
from halo2_plonky2_verifier_tpu.ops import poseidon_bn254_pallas as pk

CHAIN = 64
T = int(os.environ.get("T", "1024"))
N = int(os.environ.get("N", str(1 << 16)))

_MASK16 = np.uint32(0xFFFF)


def _clamp(cols):
    """Any raw plane -> u16-limb (16, T) plane (keeps chains dependent)."""
    return cols[:16] & _MASK16


def probe(name, body, n_in=1, reps=5, chain=CHAIN, tile=None):
    """body: (list of k (16,T) planes, a_redc1, a_mat, a_redc) -> list."""
    T = tile or globals()["T"]

    def kernel(mds_ref, redc_ref, redc1_ref, in_ref, out_ref):
        a_mat = mds_ref[:]
        a_redc = redc_ref[:]
        a_redc1 = redc1_ref[:]
        sts = [in_ref[16 * i:16 * (i + 1), :] for i in range(n_in)]

        def it(r, sts):
            outs = body(sts, a_redc1, a_mat, a_redc)
            return [_clamp(o) if o.shape[0] != 16 else o & _MASK16
                    for o in outs]

        sts = jax.lax.fori_loop(0, chain, it, sts)
        out_ref[:] = jnp.concatenate(sts, axis=0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 16, size=(16 * n_in, N),
                                 dtype=np.uint32))
    spec = pl.BlockSpec((16 * n_in, T), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    mds_spec = pl.BlockSpec((256, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    redc_spec = pl.BlockSpec((384, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    redc1_spec = pl.BlockSpec((96, 64), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    f = jax.jit(lambda m, r, r1, v: pl.pallas_call(
        kernel,
        grid=(N // T,),
        in_specs=[mds_spec, redc_spec, redc1_spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((16 * n_in, N), jnp.uint32),
    )(m, r, r1, v))
    m = jnp.asarray(pk._get_mds_a(), dtype=jnp.bfloat16)
    r = jnp.asarray(pk._get_redc_a(), dtype=jnp.bfloat16)
    r1 = jnp.asarray(pk._get_redc_a(1), dtype=jnp.bfloat16)
    out = f(m, r, r1, x)
    np.asarray(out)  # compile+warm
    t0 = time.time()
    for _ in range(reps):
        out = f(m, r, r1, out & _MASK16)
    np.asarray(out)
    dt = (time.time() - t0) / reps
    iters = chain * (N // T)
    print(f"{name:28s} {dt*1e3:8.2f} ms  "
          f"{dt/iters*1e9:9.0f} ns/iter/tile  (x{n_in} states)", flush=True)
    return dt / iters


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind,
          "T =", T, flush=True)

    # component probes (single state)
    probe("school_sq (VPU)", lambda s, a1, am, ar: [frp.school_sq(s[0])])
    probe("school var*var (VPU)",
          lambda s, a1, am, ar: [frp.school(s[0], s[0] ^ np.uint32(1))])
    probe("redc_mxu k=1", lambda s, a1, am, ar: pk._redc_mxu(
        [jnp.pad(s[0], ((0, 16), (0, 0)))], a1))
    probe("sq+redc (sbox stage)", lambda s, a1, am, ar: pk._redc_mxu(
        [frp.school_sq(s[0])], a1))
    probe("redc_lazy (VPU ripple)",
          lambda s, a1, am, ar: [frp.redc_lazy(
              jnp.pad(s[0], ((0, 16), (0, 0))))])
    def mix_body(s, a1, am, ar):
        outs = pk._mix_mxu((s[0], s[0] & np.uint32(0x7FFF),
                            s[0] ^ np.uint32(2), s[0] >> 1), am, ar)
        # fold the 4 outputs into the single carry (keeps all live, no DCE)
        return [outs[0] ^ outs[1] ^ outs[2] ^ outs[3]]

    probe("mix_mxu (4 el)", mix_body)

    # one full partial round, 1 state vs 2 interleaved states
    def partial_round(sts, a1, am, ar):
        outs = []
        for st4 in [sts[i:i + 1] for i in range(len(sts))]:
            x = st4[0]
            x2 = pk._redc_mxu([frp.school_sq(x)], a1)[0]
            x4 = pk._redc_mxu([frp.school_sq(x2)], a1)[0]
            x5 = pk._redc_mxu([frp.school(x4, x)], a1)[0]
            st = pk._mix_mxu((x5, x & np.uint32(0x7FFF), x ^ np.uint32(2),
                              x >> 1), am, ar)
            outs.append(st[0])
        return outs

    t1 = probe("partial round x1", partial_round, n_in=1)
    t2 = probe("partial round x2", partial_round, n_in=2)
    print(f"interleave-2 speedup on partial rounds: {2*t1/t2:.2f}x",
          flush=True)

    # same partial round with school(x, x) replacing school_sq (the isolated
    # probes rank them 4x apart — check which wins in round context)
    def partial_round_school(sts, a1, am, ar):
        x = sts[0]
        x2 = pk._redc_mxu([frp.school(x, x)], a1)[0]
        x4 = pk._redc_mxu([frp.school(x2, x2)], a1)[0]
        x5 = pk._redc_mxu([frp.school(x4, x)], a1)[0]
        st = pk._mix_mxu((x5, x & np.uint32(0x7FFF), x ^ np.uint32(2),
                          x >> 1), am, ar)
        return [st[0] ^ st[1] ^ st[2] ^ st[3]]

    probe("partial round school(x,x)", partial_round_school)

    # the full 64-round permutation kernel, tile sweep (is the e2e tile
    # optimal?)
    import time as _t
    for tile in (512, 1024, 2048):
        os.environ["POSEIDON_BN254_TILE"] = str(tile)
        pk_tile = pk._TILE
        pk._TILE = tile
        rng = np.random.default_rng(3)
        st = jnp.asarray(rng.integers(0, 1 << 16, size=(64, N),
                                      dtype=np.uint32))
        f = jax.jit(lambda v: pk.permute_mont_planes(v))
        out = f(st)
        np.asarray(out)
        t0 = _t.time()
        reps = 5
        for _ in range(reps):
            out = f(out & _MASK16)
        np.asarray(out)
        dt = (_t.time() - t0) / reps
        print(f"permute_mont_planes T={tile:5d}  {dt*1e3:8.2f} ms  "
              f"{N/dt/1e6:6.2f} M perm/s", flush=True)
        pk._TILE = pk_tile

    # u32 vs f32 product throughput (16 dependent (16,T) multiplies)
    def mul_u32(sts, a1, am, ar):
        x = sts[0]
        for j in range(16):
            x = (x * (x ^ np.uint32(j))) & _MASK16 | np.uint32(1)
        return [x]

    def mul_f32(sts, a1, am, ar):
        x = sts[0].astype(jnp.int32).astype(jnp.float32)
        for j in range(16):
            x = x * (x + float(j) + 1.0) % 65536.0 + 1.0
        return [x.astype(jnp.int32).astype(jnp.uint32)]

    probe("16 dep u32 mults", mul_u32)
    probe("16 dep f32 mults", mul_f32)


if __name__ == "__main__":
    main()
