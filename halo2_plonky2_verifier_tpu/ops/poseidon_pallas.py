"""Fused Pallas TPU kernel for the Poseidon-Goldilocks permutation.

The permutation is the framework's hot op (Merkle `two_to_one` is ~88% of the
reference's workload, BASELINE.md).  The jnp/scan implementation materializes
the sponge state between rounds; this kernel keeps the full 30-round
permutation resident in VMEM: one HBM read of the input states, one write of
the outputs.

Layout: states are processed as (12, N) planes — state element index on the
sublane axis, batch on the 128-wide lane axis.  The circulant MDS layer runs
on the MXU as one (96,96)@(96,T) bf16 matmul per round over 8-bit limb planes
(exact: f32 accumulator sums < 2^17); rounds use the lazy non-canonical
(< 2^64) Goldilocks forms with a single canonicalization at kernel exit.  A
VPU sublane-roll MDS fallback remains selectable via POSEIDON_MDS=rolls.

Differentially tested against ops.poseidon (jnp) and refimpl (ints); used by
ops.poseidon when the backend is TPU (POSEIDON_IMPL=jnp opts out).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants.poseidon_goldilocks import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    N_ROUNDS,
    SPONGE_WIDTH,
)
from . import goldilocks as gl

W = SPONGE_WIDTH
_MASK16 = np.uint32(0xFFFF)

import os as _os

# batch lanes per grid step (multiple of 128; POSEIDON_TILE to experiment)
_TILE = int(_os.environ.get("POSEIDON_TILE", "512"))

_RC = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, W)
# (12, 30): state-element on sublanes, round index on lanes -> slicing one
# round's constants yields a (12, 1) column that broadcasts across the batch
_RC_HI = np.ascontiguousarray((_RC >> np.uint64(32)).astype(np.uint32).T)
_RC_LO = np.ascontiguousarray((_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32).T)
_CIRC = [np.uint32(c) for c in MDS_MATRIX_CIRC]
_DIAG0 = np.uint32(MDS_MATRIX_DIAG[0])

# MDS as an MXU matmul: the circulant+diag 12x12 matrix, replicated per 8-bit
# limb plane as a block-diagonal operator.  Entries <= 49 and 8-bit limbs are
# exact in bfloat16; row sums <= 255 * (sum CIRC + DIAG0) < 2^17 are exact in
# the f32 accumulator.  Output blocks are padded to 16 rows (128 total) so
# the per-limb output slices land on vreg-aligned sublane offsets — the MXU
# pads to 128 rows anyway, so the extra rows are free.
_MDS_FULL = np.array([[MDS_MATRIX_CIRC[(j - i) % W] for j in range(W)]
                      for i in range(W)], dtype=np.float32)
_MDS_FULL[0, 0] += MDS_MATRIX_DIAG[0]
_MDS_A = np.zeros((128, 96), dtype=np.float32)
for _m in range(8):
    _MDS_A[_m * 16:_m * 16 + W, _m * W:(_m + 1) * W] = _MDS_FULL
_MASK8 = np.uint32(0xFF)


def mds_operand(groups=1):
    """The bf16 MDS matmul operand (kernels can't capture array constants —
    every fused kernel passes this explicitly).

    groups=1: the (128, 96) limb-stacked block-diagonal operator (input = the
    8 byte planes of one (12, T) state concatenated on sublanes).
    groups>1: the (12G, 12G) element-major operator kron(MDS, I_G) — input is
    ONE byte plane of a (12G, T) multi-state block (row = element*G + group),
    applied once per byte plane.  Entries are identical to the g=1 matrix so
    the same exactness bound holds (f32 sums < 2^17)."""
    if groups == 1:
        return jnp.asarray(_MDS_A, dtype=jnp.bfloat16)
    return jnp.asarray(np.kron(_MDS_FULL, np.eye(groups, dtype=np.float32)),
                       dtype=jnp.bfloat16)


def mds_spec(groups=1):
    """BlockSpec for the MDS operand (whole matrix in VMEM, any grid)."""
    if groups == 1:
        return pl.BlockSpec((128, 8 * W), lambda *i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((W * groups, W * groups), lambda *i: (0, 0),
                        memory_space=pltpu.VMEM)


def rc_planes(groups=1):
    """Round-constant planes, rows repeated per group (row = element*G+g)."""
    if groups == 1:
        return jnp.asarray(_RC_HI), jnp.asarray(_RC_LO)
    return (jnp.asarray(np.repeat(_RC_HI, groups, axis=0)),
            jnp.asarray(np.repeat(_RC_LO, groups, axis=0)))


def rc_spec(groups=1):
    return pl.BlockSpec((W * groups, N_ROUNDS), lambda *i: (0, 0),
                        memory_space=pltpu.VMEM)


def default_groups():
    """Sublane state-group count for the fused kernels (POSEIDON_GROUPS).

    G>1 stacks G independent sponge states on the sublane axis in
    element-major order (row = element*G + group): the partial-round sbox
    becomes an aligned (G, T) block instead of a 1/8-utilized (1, T) row,
    and every elementwise op packs 12G rows into full 8-sublane vregs
    (12 rows waste 4/8 sublanes of their second vreg tile).

    Default G=8: the partial-round sbox block is exactly one full vreg row
    set.  Measured on v5e (round 3): kernel 19.3 -> 26.6 -> 30.1 -> 35.2
    M perm/s for G=1/2/4/8; flagship verifier 33.2k -> 54.5k -> 59.0k
    proofs/s for G=1/4/8.  G=16 adds nothing (the sbox is already a full
    vreg at 8) and doubles VMEM tile height."""
    return int(_os.environ.get("POSEIDON_GROUPS", "8"))


def lane_tile(n, groups=1):
    """Grid lane tile for n pre-grouping lanes: big inputs use the full
    _TILE; small ones (unit tests, tiny batches) one 128-lane vreg tile, so
    the G-group padding floor is 128*G lanes instead of 512*G."""
    return _TILE if n >= _TILE * groups else 128


def to_groups(x, groups):
    """(r, N) -> (r*G, N/G) element-major regroup: out[e*G+g, t] =
    x[e, g*(N/G)+t].  N must be a multiple of G (pad first)."""
    r, n = x.shape
    return x.reshape(r, groups, n // groups).reshape(r * groups, n // groups)


def from_groups(x, groups):
    """Inverse of to_groups: (r*G, M) -> (r, M*G)."""
    rg, m = x.shape
    r = rg // groups
    return x.reshape(r, groups, m).reshape(r, groups * m)


def _sbox(x):
    """x^7 on lazy (< 2^64) planes: 2 squares + 2 muls (52 limb products)."""
    x2 = gl.square_lazy(x)
    x4 = gl.square_lazy(x2)
    x6 = gl.mul_lazy(x4, x2)
    return gl.mul_lazy(x6, x)


def _mds_planes_mxu(hi, lo, mds_a):
    """MDS over (12, T) lazy planes as one (96,96)@(96,T) bf16 matmul.

    Kills the per-round 44 sublane rolls + 48 VPU multiplies of the roll
    formulation: the state is split into eight 8-bit limb planes (exact in
    bf16), the block-diagonal limb-replicated MDS matrix is applied on the
    MXU with exact f32 accumulation (sums < 2^17), and the result is
    recombined with one 4-step carry chain + lazy Goldilocks reduction."""
    l16 = [lo & _MASK16, lo >> 16, hi & _MASK16, hi >> 16]
    l8 = []
    for v in l16:
        l8.append(v & _MASK8)
        l8.append(v >> 8)
    # Mosaic has no u32<->bf16 cast; values < 2^8 so the i32/f32 hops are exact
    x = jnp.concatenate(l8, axis=0).astype(jnp.int32).astype(
        jnp.float32).astype(jnp.bfloat16)                      # (96, T)
    y = jax.lax.dot_general(
        mds_a, x,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32).astype(
            jnp.uint32)                                         # exact < 2^17
    ys = [y[m * 16:m * 16 + W] for m in range(8)]
    cols = [ys[2 * k] + (ys[2 * k + 1] << 8) for k in range(4)]  # < 2^26
    return _recombine_cols(cols)


def _recombine_cols(cols):
    """Four (r, T) u32 16-bit-column planes (< 2^26) -> lazy (hi, lo)."""
    out_limbs = []
    carry = jnp.zeros_like(cols[0])
    for k in range(4):
        v = cols[k] + carry
        out_limbs.append(v & _MASK16)
        carry = v >> 16
    lo64 = gl.from_limbs16(out_limbs)
    hi64 = (jnp.zeros_like(carry), carry)
    return gl.reduce128_lazy(hi64, lo64)


def _mds_planes_mxu_grouped(hi, lo, mds_g):
    """MDS over element-major (12G, T) lazy planes: kron(MDS, I_G) applied on
    the MXU once per 8-bit byte plane (8 matmuls of (12G,12G)@(12G,T)).

    Unlike the g=1 form there is NO sublane slicing anywhere: each byte plane
    is a full-array operand and each product a full-array result; the
    per-group mixing is entirely inside the matmul.  Exactness matches the
    g=1 operand (entries <= 49, 8-bit inputs, f32 sums < 2^17).  (A single
    (12G,12G)@(12G,8T) matmul over lane-concatenated byte planes was tried
    and measured SLOWER — 29.5 vs 35.2 M perm/s at G=8: the lane-axis
    concat + result slicing relayouts cost more than 7 extra dispatches.)"""
    l16 = [lo & _MASK16, lo >> 16, hi & _MASK16, hi >> 16]
    ys = []
    for v in l16:
        for sh in (0, 8):
            x = ((v >> sh) & _MASK8).astype(jnp.int32).astype(
                jnp.float32).astype(jnp.bfloat16)
            ys.append(jax.lax.dot_general(
                mds_g, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32).astype(
                    jnp.uint32))
    cols = [ys[2 * k] + (ys[2 * k + 1] << 8) for k in range(4)]  # < 2^26
    return _recombine_cols(cols)


def _mds_planes(hi, lo):
    """MDS over (12, T) planes via incremental sublane rolls in limb space."""
    limbs = [lo & _MASK16, lo >> 16, hi & _MASK16, hi >> 16]
    cols = [limbs[k] * _CIRC[0] for k in range(4)]
    rolled = limbs
    for i in range(1, W):
        # roll by -1 == roll by W-1 (pltpu.roll requires non-negative shifts)
        rolled = [pltpu.roll(l, W - 1, 0) for l in rolled]
        for k in range(4):
            cols[k] = cols[k] + rolled[k] * _CIRC[i]
    # diagonal: only row 0 gets DIAG0 * state[0]; build via row mask
    row_ids = jax.lax.broadcasted_iota(jnp.uint32, cols[0].shape, 0)
    row0 = (row_ids == 0).astype(jnp.uint32)
    for k in range(4):
        cols[k] = cols[k] + (limbs[k] * _DIAG0) * row0
    # carry propagate -> 5 u16 limbs (+ residual)
    out_limbs = []
    carry = jnp.zeros_like(cols[0])
    for k in range(4):
        v = cols[k] + carry
        out_limbs.append(v & _MASK16)
        carry = v >> 16
    lo64 = gl.from_limbs16(out_limbs)
    hi64 = (jnp.zeros_like(carry), carry)
    return gl.reduce128(hi64, lo64)


_MDS_MXU = _os.environ.get("POSEIDON_MDS", "mxu") == "mxu"


def _permute_planes(hi, lo, rc_hi, rc_lo, mds_a=None, groups=1):
    """Full 30-round permutation on (12G, T) hi/lo planes (unrolled).

    groups=1 (the classic layout): rows are the 12 state elements;
    rc_hi/rc_lo are the (12, 30) round-constant planes and mds_a the
    (128, 96) limb-stacked operand (None -> VPU roll formulation).

    groups=G>1 (element-major multi-state): row e*G+g is element e of
    independent state g; rc planes are row-repeated (rc_planes(G)) and mds_a
    is the (12G, 12G) kron(MDS, I_G) operand.  Wins vs G=1: the
    partial-round sbox runs on the aligned (G, T) block state[:G] instead of
    a 1/8-utilized (1, T) row, and 12G rows pack into full 8-sublane vregs
    ((12, T) wastes 4/8 sublanes of its second vreg tile).  An in-kernel
    (1,T)->(8,T/8) repack and a limb-convolution sbox were both tried and
    measured neutral-to-negative (bench 32.7k vs 31.9k proofs/s); the
    multi-state layout removes the waste without any relayout ops.

    Rounds run in the lazy (< 2^64, non-canonical) representation — one
    canonicalization at the very end instead of a compare+select tail on
    every add/mul/reduce (ops.goldilocks lazy variants, bounds in-line
    there)."""
    use_mxu = _MDS_MXU and mds_a is not None
    if groups > 1 and not use_mxu:
        raise ValueError("grouped permutation requires the MXU MDS operand")
    state = (hi, lo)
    for rnd in range(N_ROUNDS):
        rc = (rc_hi[:, rnd:rnd + 1], rc_lo[:, rnd:rnd + 1])   # (12G, 1)
        state = gl.add_lazy(state, rc)
        if HALF_N_FULL_ROUNDS <= rnd < HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS:
            s0 = (state[0][0:groups, :], state[1][0:groups, :])
            s0 = _sbox(s0)
            state = (jnp.concatenate([s0[0], state[0][groups:, :]], axis=0),
                     jnp.concatenate([s0[1], state[1][groups:, :]], axis=0))
        else:
            state = _sbox(state)
        if groups > 1:
            state = _mds_planes_mxu_grouped(state[0], state[1], mds_a)
        elif use_mxu:
            state = _mds_planes_mxu(state[0], state[1], mds_a)
        else:
            state = _mds_planes(state[0], state[1])
    return gl.canonicalize(state)


def _permute_kernel(rc_hi_ref, rc_lo_ref, mds_ref, hi_ref, lo_ref,
                    oh_ref, ol_ref, *, groups=1):
    hi, lo = _permute_planes(hi_ref[:], lo_ref[:], rc_hi_ref[:], rc_lo_ref[:],
                             mds_ref[:], groups=groups)
    oh_ref[:] = hi
    ol_ref[:] = lo


def _permute_planes_call_impl(hi, lo, interpret=False, groups=1):
    """(12G, N') element-major planes -> permuted; N' padded to the lane
    tile (512, or one 128-lane vreg for small inputs)."""
    g = groups
    n = hi.shape[1]
    tile = _TILE if n >= _TILE else 128
    n_pad = -n % tile
    if n_pad:
        hi = jnp.pad(hi, ((0, 0), (0, n_pad)))
        lo = jnp.pad(lo, ((0, 0), (0, n_pad)))
    total = hi.shape[1]
    grid = (total // tile,)
    spec = pl.BlockSpec((W * g, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    rch, rcl = rc_planes(g)
    out_hi, out_lo = pl.pallas_call(
        functools.partial(_permute_kernel, groups=g),
        grid=grid,
        in_specs=[rc_spec(g), rc_spec(g), mds_spec(g), spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((W * g, total), jnp.uint32),
                   jax.ShapeDtypeStruct((W * g, total), jnp.uint32)),
        interpret=interpret,
    )(rch, rcl, mds_operand(g), hi, lo)
    if n_pad:
        out_hi = out_hi[:, :n]
        out_lo = out_lo[:, :n]
    return out_hi, out_lo


@functools.lru_cache(maxsize=None)
def _jitted_variant(fn, interpret, groups):
    """Per-(interpret, groups) smart_jit wrapper: jax.jit on TPU, fusion-pass
    disabled on CPU (the XLA:CPU pathology — utils/compile.py)."""
    from ..utils.compile import smart_jit

    return smart_jit(functools.partial(fn, interpret=interpret,
                                       groups=groups))


def _permute_planes_call(hi, lo, interpret=False, groups=1):
    return _jitted_variant(_permute_planes_call_impl, interpret, groups)(
        hi, lo)


def permute_planes(hi, lo, interpret=False, groups=None):
    """(12, N) hi/lo u32 planes -> permuted planes (lane-layout API; the
    element-major G-group regrouping is internal, POSEIDON_GROUPS)."""
    g = default_groups() if groups is None else groups
    if g == 1:
        return _permute_planes_call(hi, lo, interpret=interpret, groups=1)
    n = hi.shape[1]
    n_pad = -n % g
    if n_pad:
        hi = jnp.pad(hi, ((0, 0), (0, n_pad)))
        lo = jnp.pad(lo, ((0, 0), (0, n_pad)))
    oh, ol = _permute_planes_call(to_groups(hi, g), to_groups(lo, g),
                                  interpret=interpret, groups=g)
    oh, ol = from_groups(oh, g), from_groups(ol, g)
    if n_pad:
        oh, ol = oh[:, :n], ol[:, :n]
    return oh, ol


def _permute_chained_call_impl(hi, lo, chain, interpret=False, groups=1):
    g = groups

    def kernel(rc_hi_ref, rc_lo_ref, mds_ref, hi_ref, lo_ref, oh_ref, ol_ref):
        rc_hi, rc_lo = rc_hi_ref[:], rc_lo_ref[:]
        mds_a = mds_ref[:]

        def body(_, st):
            return _permute_planes(st[0], st[1], rc_hi, rc_lo, mds_a,
                                   groups=g)

        hi_out, lo_out = jax.lax.fori_loop(
            0, chain, body, (hi_ref[:], lo_ref[:]))
        oh_ref[:] = hi_out
        ol_ref[:] = lo_out

    n = hi.shape[1]
    tile = _TILE if n >= _TILE else 128
    n_pad = -n % tile
    if n_pad:
        hi = jnp.pad(hi, ((0, 0), (0, n_pad)))
        lo = jnp.pad(lo, ((0, 0), (0, n_pad)))
    total = hi.shape[1]
    grid = (total // tile,)
    spec = pl.BlockSpec((W * g, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    rch, rcl = rc_planes(g)
    out_hi, out_lo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[rc_spec(g), rc_spec(g), mds_spec(g), spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((W * g, total), jnp.uint32),
                   jax.ShapeDtypeStruct((W * g, total), jnp.uint32)),
        interpret=interpret,
    )(rch, rcl, mds_operand(g), hi, lo)
    if n_pad:
        out_hi = out_hi[:, :n]
        out_lo = out_lo[:, :n]
    return out_hi, out_lo


@functools.lru_cache(maxsize=None)
def _chained_variant(chain, interpret, groups):
    from ..utils.compile import smart_jit

    return smart_jit(functools.partial(_permute_chained_call_impl,
                                       chain=chain, interpret=interpret,
                                       groups=groups))


def _permute_chained_call(hi, lo, chain, interpret=False, groups=1):
    return _chained_variant(chain, interpret, groups)(hi, lo)


def permute_planes_chained(hi, lo, chain, interpret=False, groups=None):
    """`chain` serial permutations with the state VMEM-resident throughout —
    one HBM read and one write TOTAL.  This is the speed-of-light probe for
    the roofline accounting (tools/sol_bench.py): it measures the pure
    compute rate of the permutation with no per-call memory traffic, which
    is the ceiling the fused Merkle/transcript kernels run against."""
    g = default_groups() if groups is None else groups
    if g == 1:
        return _permute_chained_call(hi, lo, chain, interpret=interpret,
                                     groups=1)
    n = hi.shape[1]
    n_pad = -n % g
    if n_pad:
        hi = jnp.pad(hi, ((0, 0), (0, n_pad)))
        lo = jnp.pad(lo, ((0, 0), (0, n_pad)))
    oh, ol = _permute_chained_call(to_groups(hi, g), to_groups(lo, g), chain,
                                   interpret=interpret, groups=g)
    oh, ol = from_groups(oh, g), from_groups(ol, g)
    if n_pad:
        oh, ol = oh[:, :n], ol[:, :n]
    return oh, ol


def permute(state, interpret=False):
    """Drop-in for ops.poseidon.permute: (hi, lo) pair of (..., 12) u32."""
    hi, lo = state
    batch_shape = hi.shape[:-1]
    n = 1
    for d in batch_shape:
        n *= d
    hi2 = hi.reshape(n, W).T          # (12, N)
    lo2 = lo.reshape(n, W).T
    oh, ol = permute_planes(hi2, lo2, interpret=interpret)
    return (oh.T.reshape(batch_shape + (W,)), ol.T.reshape(batch_shape + (W,)))
