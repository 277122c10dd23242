"""Fused Pallas TPU kernel for the Poseidon-BN254 permutation (t=4, x^5,
8 full + 56 partial rounds — the gnark/circomlib instance behind the
reference's PoseidonBN254 chips, verifier/src/hash/poseidon_bn254/).

All 64 rounds run with the 4xFr state resident in VMEM in plane layout
(ops/bn254_planes.py: limb index on sublanes, batch on lanes).  Each MDS row
accumulates its four schoolbook products in raw columns and pays a single
Montgomery reduction — 4 REDCs per mix instead of 16.

Montgomery reductions avoid sequential carry ripples (measured ~40% of
kernel time as latency-bound (1, T) chains): both REDC const-multiplies run
as MXU conv-matmuls fed raw columns as byte planes (_redc_mxu), the mod-R
product needs only one local carry pass, and the single remaining exact
normalization uses Kogge-Stone carry lookahead (bn254_planes.normalize_ks).

The jnp scan path (ops/poseidon_bn254.py) serves CPU tests and the op
census; this kernel engages on TPU via poseidon_bn254.permute_mont.
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants.poseidon_bn254 import FULL_ROUNDS, PARTIAL_ROUNDS, WIDTH, generate
from . import bn254 as fr
from . import bn254_planes as frp

_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS
_HALF = FULL_ROUNDS // 2
# Batch lanes per grid step.  The round/level loops are fully serial inside
# one grid step (and TPU runs grid steps sequentially), so the kernel is
# latency-bound at narrow tiles: wider lanes amortize the dependent-op chain
# over more work per instruction ((16, T) planes are only 4 vregs at T=256).
# Measured (v5e, BN254 bench): 2492 / 3336 / 3572 / 3630 proofs/s at
# T=256/512/1024/2048 (round-4 kernels); the standalone permute kernel gains
# more from the wide tile (0.32 -> 0.38 M perm/s).
#
# Round-4 restructuring probes (tools/bn254_micro.py, all MEASURED on v5e):
#   - interleaving 2 independent path sets per grid step ANTI-scales (0.50x
#     per state: 2 states cost 4x one) — the VERDICT-suggested cross-tile
#     overlap is a loss on this chip, the kernel is VPU-throughput-bound,
#     not latency-bound, at T >= 1024;
#   - school(x,x) vs the symmetric school_sq in round context: school_sq
#     wins (13.6 vs 15.3 us/round/tile) despite isolated probes suggesting
#     otherwise;
#   - fully unrolling the 64-round loop (static rc indices): +18% on the
#     standalone permute kernel at T=2048, but CRASHES Mosaic's
#     ApplyVectorLayoutPass inside the path kernel's level loop
#     ("Check failed: limits[i] <= dim(i)"), so it stays opt-in
#     (POSEIDON_BN254_UNROLL=1) and off the default path.
_TILE = int(os.environ.get("POSEIDON_BN254_TILE", "2048"))

# REDC const-multiplies (m = t*N' mod R, u = m*p) on the MXU (default) or
# the VPU school_const ripple (POSEIDON_BN254_REDC=vpu fallback).
_REDC_MXU = os.environ.get("POSEIDON_BN254_REDC", "mxu") != "vpu"

# Unroll the 64-round loop inside the kernels instead of the 3-segment
# fori_loop.  Probe-chain microbenchmarks run a partial round at
# ~13.6us/tile while the fori_loop kernel spends ~50us/round — the dynamic
# rc_ref[r] index plus per-iteration loop state are the suspected gap.
#   "1":    python-level unroll with STATIC rc_ref[r] slices — +18% on the
#           standalone permute but crashes Mosaic's ApplyVectorLayoutPass
#           inside the path kernel's level loop ("limits[i] <= dim(i)
#           (2 vs. 1)": the static (64, 1) rc loads get a lane layout the
#           level-loop body can't consume);
#   "fori": jax.lax.fori_loop(..., unroll=True) — the same fully unrolled
#           schedule, but the rc loads stay dynamic-slice ops (the layout
#           Mosaic already handles in the rolled loop).
# Round-5 workaround hunt (all reproduce the same "(2 vs. 1)" abort inside
# the path kernel's level loop; the standalone permute kernel is fine):
# "fori" mode, 8-lane-replicated rc operands (POSEIDON_BN254_RC_LANES=8),
# and u32-concat select masks (the GL 7a443d5 fix) were each tried on the
# real chip and none unblocks it — the trigger is the unrolled 64-round
# body inside the level fori itself, not the rc slicing or the i1
# broadcasts.  Both unroll modes stay opt-in experiments; the op-count
# roofline (tools/op_roofline.py) instead bounds the headroom: the rolled
# kernel already runs at ~71% of the static VPU ceiling (BENCH r5).
_UNROLL = os.environ.get("POSEIDON_BN254_UNROLL", "0")

# Lane width of the round-constant operand (see the workaround-hunt note;
# kept as an experiment knob, default 1 = the shipped layout).
_RC_LANES = int(os.environ.get("POSEIDON_BN254_RC_LANES",
                               "8" if _UNROLL != "0" else "1"))

_M_NP = None   # (4, 4, 16) u32 host Montgomery-form MDS limb tables
_RC_NP = None  # (rounds, 64, 1) u32 Montgomery-form round-constant planes
_A_NP = None   # (256, 128) f32 conv-matmul MDS operand (8-bit limb blocks)
_REDC_NP = {}  # per-k (96k, 64k) f32 block-diag [A_Nprime; A_p] REDC operands


def _get_tables():
    global _M_NP, _RC_NP, _A_NP
    if _M_NP is None:
        c, m = generate()
        mm = np.zeros((WIDTH, WIDTH, fr.N_LIMBS), dtype=np.uint32)
        for i in range(WIDTH):
            for j in range(WIDTH):
                v = m[i][j] * fr.R_INT % fr.P_INT
                for k in range(fr.N_LIMBS):
                    mm[i, j, k] = (v >> (16 * k)) & 0xFFFF
        rc = np.zeros((_ROUNDS, WIDTH * fr.N_LIMBS, 1), dtype=np.uint32)
        for r in range(_ROUNDS):
            for i in range(WIDTH):
                v = c[r * WIDTH + i] * fr.R_INT % fr.P_INT
                for k in range(fr.N_LIMBS):
                    rc[r, i * fr.N_LIMBS + k, 0] = (v >> (16 * k)) & 0xFFFF
        # MDS as one MXU matmul: the full-width Fr multiply out[i] = sum_j
        # M[i,j] * x[j] is a LINEAR map of x's 8-bit limbs, i.e. a limb
        # convolution -> a (256, 128) matrix.  Layout (all host-side, so
        # the device slices are vreg-aligned):
        #   X rows (j*32 + m):        lo8 of 16-bit limb m of element j
        #          (j*32 + 16 + m):   hi8 of limb m         (8-bit pos 2m+1)
        #   Y rows (i*64 + k):        even conv column c = 2k   (k 0..31)
        #          (i*64 + 32 + k):   odd  conv column c = 2k+1 (k 0..30)
        #          (i*64 + 63):       zero (roll-wrap guard)
        # Entries <= 255 (exact in bf16); per-row sums <= 128 * 255^2 < 2^24
        # (exact in the f32 accumulator).
        a_np = np.zeros((4 * 64, 4 * 32), dtype=np.float32)
        for i in range(WIDTH):
            for j in range(WIDTH):
                v = m[i][j] * fr.R_INT % fr.P_INT
                m8 = [(v >> (8 * t)) & 0xFF for t in range(32)]
                for col in range(32):
                    b = 2 * (col % 16) + (1 if col >= 16 else 0)
                    for cc in range(b, min(b + 32, 63)):
                        row = (i * 64 + cc // 2 if cc % 2 == 0
                               else i * 64 + 32 + cc // 2)
                        a_np[row, j * 32 + col] = m8[cc - b]
        _M_NP, _RC_NP, _A_NP = mm, rc, a_np
    return _M_NP, _RC_NP


def _get_mds_a():
    _get_tables()
    return _A_NP


def _conv_block(c_int, out_digits):
    """(out_digits, 64) conv matrix: const * value as a linear map of the
    value's raw 16-bit COLUMNS fed as four 8-bit byte planes (input row
    b * 16 + m = byte b of column m, sitting at 8-bit position 2m + b).
    Output rows use the evens/odds layout of _get_tables (even digit
    columns k in rows [0, half), odd in [half, out_digits)).  Feeding raw
    columns (< 2^26) directly means no carry normalization is needed
    before the matmul."""
    c8 = [(c_int >> (8 * t)) & 0xFF for t in range(32)]
    half = out_digits // 2
    a = np.zeros((out_digits, 64), dtype=np.float32)
    for b in range(4):
        for m in range(16):
            pos = 2 * m + b
            for cc in range(pos, min(pos + 32, out_digits)):
                row = cc // 2 if cc % 2 == 0 else half + cc // 2
                a[row, b * 16 + m] = c8[cc - pos]
    return a


def _get_redc_a(k=WIDTH):
    """(96k, 64k) f32 REDC conv-matmul operand, block-diagonal over k state
    elements: rows [0, 32k) = A_Nprime (truncated 32-digit output, the mod-R
    multiply m = t_low * N' applied to t's raw low columns), rows [32k, 96k)
    = A_p (full 64-digit output, u = m' * p).  Entries <= 255 (exact bf16);
    per-row sums <= 64 * 255^2 < 2^23 (exact f32).

    k=4 serves the mix and the full-round sbox stages; the k=1 operand
    (96, 64 - one MXU pass instead of six) serves the 56 partial-round
    sboxes and the Merkle path kernel's per-level sibling to_mont, which
    would otherwise pad 3/4 of every matmul with zeros."""
    if k not in _REDC_NP:
        nprime_int = sum(int(x) << (16 * j)
                         for j, x in enumerate(fr.NPRIME_LIMBS))
        an = _conv_block(nprime_int, 32)
        ap = _conv_block(fr.P_INT, 64)
        a = np.zeros((96 * k, 64 * k), dtype=np.float32)
        for i in range(k):
            a[i * 32:(i + 1) * 32, i * 64:(i + 1) * 64] = an
            a[32 * k + i * 64:32 * k + (i + 1) * 64,
              i * 64:(i + 1) * 64] = ap
        _REDC_NP[k] = a
    return _REDC_NP[k]


def _lane_tile(n):
    """Grid lane tile: the full _TILE for real workloads, one small tile for
    tiny inputs (unit tests, small batches) so padding stays bounded."""
    return _TILE if n >= _TILE else 256


def _rc_operand(rc_np):
    """Round-constant operand at _RC_LANES lane replication (see the
    _RC_LANES note)."""
    if _RC_LANES == 1:
        return jnp.asarray(rc_np)
    return jnp.asarray(np.repeat(rc_np, _RC_LANES, axis=2))


def _rc_spec():
    return pl.BlockSpec((_ROUNDS, WIDTH * fr.N_LIMBS, _RC_LANES),
                        lambda *i: (0,) * 3, memory_space=pltpu.VMEM)


def _to_bf16(x):
    # Mosaic has no u32 <-> bf16 cast: hop through i32/f32.
    return x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _from_f32(y):
    return y.astype(jnp.int32).astype(jnp.uint32)


def _bytes4(cols, n):
    """(16, N) u32 columns < 2^32 -> 4 byte planes stacked to (64, N)."""
    return [cols & np.uint32(0xFF), (cols >> 8) & np.uint32(0xFF),
            (cols >> 16) & np.uint32(0xFF), cols >> 24]


def _redc_mxu(cols_list, a_redc):
    """Lazy Montgomery reduction of k <= 4 raw-column planes with both REDC
    const-multiplies as one MXU conv-matmul each, and NO carry ripples on
    the critical path except the final output normalization (Kogge-Stone):
    bit-identical to bn254_planes.redc_lazy mod p with a marginally larger
    lazy bound (t/R + 1.001p instead of t/R + p — the cycling analysis in
    _run_rounds absorbs it).

    cols_list: list of k (32, N) u32 raw column planes (each < 2^26).
    a_redc:    a (96K, 64K) bf16 _get_redc_a(K) operand, K >= k (K > k
               zero-pads the unused element blocks).
    Returns a list of k (16, N) lazy u16-limb planes.

    Steps per element:
      1. t's raw LOW columns (columns >= 16 are multiples of R, i.e. == 0
         mod R) go straight into the A_Nprime matmul as four byte planes —
         no normalization needed, the conv matrix handles the radix
         alignment of each byte.
      2. recombine the truncated 8-bit output into 16-bit raw columns (the
         odd block's roll-wrap row is masked: the digit-31 overflow is
         exactly the mod-R drop), then ONE local carry pass: m' has limbs
         < 2^17 and value m mod R < 1.001 * R — close enough to strict for
         the lazy bound, and exactly what u = m' * p needs.
      3. m' as byte planes (byte 3 is provably zero) -> A_p matmul ->
         recombine (no mask: u < 1.001*R*p < 2^510 forces the digit-63 raw
         sum < 2^6) -> s = t + u -> Kogge-Stone normalize -> s[16:]."""
    k = len(cols_list)
    k_op = a_redc.shape[1] // 64
    n = cols_list[0].shape[1]
    blocks = []
    for c in cols_list:
        blocks.extend(_bytes4(c[:16], n))
    if k < k_op:
        blocks.append(jnp.zeros((64 * (k_op - k), n), jnp.uint32))
    x = _to_bf16(jnp.concatenate(blocks, axis=0))        # (64K, N) bytes
    m8 = _from_f32(jax.lax.dot_general(
        a_redc[:32 * k_op], x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))             # (32K, N)
    row = jax.lax.broadcasted_iota(jnp.uint32, (16, n), 0)
    ms = []
    for i in range(k):
        ev = m8[i * 32:i * 32 + 16]
        od = m8[i * 32 + 16:i * 32 + 32]
        wrap = jnp.where(row == 0, np.uint32(0), pltpu.roll(od >> 8, 1, 0))
        mcols = ev + ((od & np.uint32(0xFF)) << 8) + wrap  # < 2^22
        mp = (mcols & np.uint32(0xFFFF)) + frp._shift_up(mcols >> 16, 1)
        ms.append(mp)                                    # limbs < 2^17
    blocks = []
    zero = jnp.zeros((16, n), jnp.uint32)
    for m in ms:
        blocks.extend([m & np.uint32(0xFF), (m >> 8) & np.uint32(0xFF),
                       m >> 16, zero])
    if k < k_op:
        blocks.append(jnp.zeros((64 * (k_op - k), n), jnp.uint32))
    xm = _to_bf16(jnp.concatenate(blocks, axis=0))
    u8 = _from_f32(jax.lax.dot_general(
        a_redc[32 * k_op:], xm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))             # (64K, N)
    out = []
    for i in range(k):
        ev = u8[i * 64:i * 64 + 32]
        od = u8[i * 64 + 32:i * 64 + 64]
        ucols = ev + ((od & np.uint32(0xFF)) << 8) + pltpu.roll(od >> 8, 1, 0)
        s, _ = frp.normalize_ks(cols_list[i] + ucols)    # t + m'*p < 2^27
        out.append(s[16:])
    return out



def _auto_interp(interpret):
    """interpret=None -> interpret mode unless running on a real TPU (lets
    the fri.py plane path be exercised end-to-end on CPU tests)."""
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret


def _sbox5(x):
    """x^5 with lazy Montgomery reductions (no per-step cond_sub; value
    bounds stay < ~2.6p and cycle stably — see _permute_kernel note).
    Squares use the symmetric schoolbook (136 limb products vs 256)."""
    x2 = frp.redc_lazy(frp.school_sq(x))
    x4 = frp.redc_lazy(frp.school_sq(x2))
    return frp.redc_lazy(frp.school(x4, x))


def _mix_mxu(st, a_mat, a_redc=None):
    """MDS over 4 (16, T) planes as one (256,128)@(128,T) bf16 matmul.

    The state's 8-bit limb planes go through the conv matrix (exact: f32
    sums < 2^24); the 63 8-bit output columns per element are recombined
    into 32 16-bit raw columns (< 2^25) and Montgomery-reduced with the
    usual cond_sub (the one subtraction per round that keeps the lazy
    value bounds cycling at ~1.6p instead of diverging).  With `a_redc`
    the 4 reductions batch through one _redc_mxu; without it they take
    the VPU school_const path."""
    blocks = []
    for j in range(WIDTH):
        blocks.append(st[j] & np.uint32(0xFF))
        blocks.append(st[j] >> 8)
    x = jnp.concatenate(blocks, axis=0).astype(jnp.int32).astype(
        jnp.float32).astype(jnp.bfloat16)                       # (128, T)
    y = jax.lax.dot_general(
        a_mat, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32).astype(
            jnp.uint32)                                          # (256, T)
    cols = []
    for i in range(WIDTH):
        evens = y[i * 64:i * 64 + 32]                            # c = 2k
        odds = y[i * 64 + 32:i * 64 + 64]                        # c = 2k+1
        cols.append(evens + ((odds & np.uint32(0xFF)) << 8)
                    + (pltpu.roll(odds, 1, 0) >> 8))             # < 2^25
    if a_redc is not None:
        return tuple(frp.cond_sub_p(s) for s in _redc_mxu(cols, a_redc))
    return tuple(frp.redc(c) for c in cols)


def _mix(st, m_np):
    """MDS over 4 (16, T) Montgomery planes: raw-column accumulation, one
    REDC per output row."""
    out = []
    for i in range(WIDTH):
        cols = frp.school_const(st[0], m_np[i][0])
        for j in range(1, WIDTH):
            cols = cols + frp.school_const(st[j], m_np[i][j])
        out.append(frp.redc(cols))
    return tuple(out)


def _split(state, t):
    return tuple(state[16 * i:16 * (i + 1), :] for i in range(WIDTH))


def _run_rounds(st, rc_ref, a_mat, a_redc=None, a_redc1=None):
    """All 64 lazy-Montgomery rounds on a 4-tuple of (16, T) planes: values
    drift in [0, ~2.6p) with exactly one conditional subtraction per round
    (inside the mix REDC) — enough to keep the bound cycling (out <= t/R + p
    with t <= 4p * 2.6p and R/p ~ 5.3 gives ~2.6p before, ~1.6p after the
    mix cond_sub).  Output is lazy (< ~1.6p) — callers canonicalize.

    With `a_redc`, every reduction routes through the MXU (_redc_mxu):
    full-round sboxes batch the 4 elements per squaring stage; the partial
    sbox (k=1) uses the dedicated (96, 64) `a_redc1` operand when given —
    one MXU pass instead of six and no zero-padded byte planes — falling
    back to the k=4 operand otherwise.

    `rc_ref` must be the round-constant REF (not a loaded value): Mosaic
    lowers dynamic indexing on a Ref, but dynamic_slice on a value is
    unimplemented for the loop-carried round counter."""

    def round_body(r, st, full):
        rc = rc_ref[r][:, :1]                         # (64, 1)
        st = tuple(frp.add_lazy(st[i], rc[16 * i:16 * (i + 1)])
                   for i in range(WIDTH))
        if a_redc is not None:
            if full:
                x2 = _redc_mxu([frp.school_sq(s) for s in st], a_redc)
                x4 = _redc_mxu([frp.school_sq(s) for s in x2], a_redc)
                st = tuple(_redc_mxu(
                    [frp.school(a, b) for a, b in zip(x4, st)], a_redc))
            else:
                ar1 = a_redc if a_redc1 is None else a_redc1
                x = st[0]
                x2 = _redc_mxu([frp.school_sq(x)], ar1)[0]
                x4 = _redc_mxu([frp.school_sq(x2)], ar1)[0]
                x5 = _redc_mxu([frp.school(x4, x)], ar1)[0]
                st = (x5,) + st[1:]
        elif full:
            st = tuple(_sbox5(s) for s in st)
        else:
            st = (_sbox5(st[0]),) + st[1:]
        return _mix_mxu(st, a_mat, a_redc)

    if _UNROLL == "1":
        for r in range(_ROUNDS):
            st = round_body(r, st, r < _HALF or r >= _ROUNDS - _HALF)
        return st
    unroll = True if _UNROLL == "fori" else 1
    st = jax.lax.fori_loop(0, _HALF, lambda r, s: round_body(r, s, True), st,
                           unroll=unroll)
    st = jax.lax.fori_loop(_HALF, _ROUNDS - _HALF,
                           lambda r, s: round_body(r, s, False), st,
                           unroll=unroll)
    st = jax.lax.fori_loop(_ROUNDS - _HALF, _ROUNDS,
                           lambda r, s: round_body(r, s, True), st,
                           unroll=unroll)
    return st


def _permute_kernel(rc_ref, mds_ref, redc_ref, redc1_ref, in_ref, out_ref):
    t = in_ref.shape[1]
    a_redc = redc_ref[:] if _REDC_MXU else None
    a_redc1 = redc1_ref[:] if _REDC_MXU else None
    st = _run_rounds(_split(in_ref[:], t), rc_ref, mds_ref[:], a_redc,
                     a_redc1)
    st = tuple(frp.cond_sub_p(s) for s in st)         # lazy -> canonical
    out_ref[:] = jnp.concatenate(st, axis=0)


def _leaf_kernel(rc_ref, mds_ref, redc_ref, redc1_ref, hi_ref, lo_ref,
                 out_ref, *, w):
    """hash_or_noop over w Goldilocks elements per lane, whole sponge in
    VMEM, output in canonical MONTGOMERY form (poseidon_bn254.hash_or_noop_gl
    semantics: w <= 3 packs 3 GL into one Fr with no permute; otherwise
    chunks of 9 pack into state slots 1..3 with one permute per chunk, the
    last chunk overwriting only ceil(len/3) slots).  Packing is pure limb
    placement — a GL (hi, lo) pair contributes four u16 limb rows — so the
    only arithmetic is the to-Montgomery REDC (through _redc_mxu, batched
    across the chunk's slots) and the rounds."""
    a_mat = mds_ref[:]
    a_redc = redc_ref[:] if _REDC_MXU else None
    a_redc1 = redc1_ref[:] if _REDC_MXU else None
    t = hi_ref.shape[1]
    zrow = jnp.zeros((1, t), jnp.uint32)

    def pack3(els):
        rows = []
        for j in range(3):
            if j < len(els):
                h, l = els[j]
                rows.extend([l & np.uint32(0xFFFF), l >> 16,
                             h & np.uint32(0xFFFF), h >> 16])
            else:
                rows.extend([zrow] * 4)
        rows.extend([zrow] * 4)
        return jnp.concatenate(rows, axis=0)              # (16, T) standard

    def to_mont_lazy(planes):
        """Batched standard -> Montgomery, lazy output (rounds tolerate it)."""
        if a_redc is not None:
            op = a_redc1 if len(planes) == 1 else a_redc
            return _redc_mxu(
                [frp.school_const(p, frp._R2_NP) for p in planes], op)
        return [frp.to_mont(p) for p in planes]

    els = [(hi_ref[j:j + 1], lo_ref[j:j + 1]) for j in range(w)]
    if w <= 3:
        node = to_mont_lazy([pack3(els)])[0]
    else:
        zero16 = jnp.zeros((16, t), jnp.uint32)
        state = [zero16] * WIDTH
        for c0 in range(0, w, 9):
            chunk = els[c0:c0 + 9]
            slots = to_mont_lazy([pack3(chunk[k:k + 3])
                                  for k in range(0, len(chunk), 3)])
            for k, sm in enumerate(slots):
                state[1 + k] = sm
            state = list(_run_rounds(tuple(state), rc_ref, a_mat, a_redc,
                                     a_redc1))
        node = state[0]
    out_ref[:] = frp.cond_sub_p(node)                     # canonical mont


def hash_or_noop_mont_planes(gl_planes, interpret=None):
    """gl_planes: (hi, lo) pair of (w, N) u32 Goldilocks planes (w static).
    Returns (16, N) canonical MONTGOMERY-form Fr leaf-hash planes (feed
    verify_paths_mont_planes with node_in_mont=True)."""
    interpret = _auto_interp(interpret)
    _, rc_np = _get_tables()
    hi, lo = gl_planes
    w, n = hi.shape
    tile = _lane_tile(n)
    n_pad = -n % tile
    if n_pad:
        hi = jnp.pad(hi, ((0, 0), (0, n_pad)))
        lo = jnp.pad(lo, ((0, 0), (0, n_pad)))
    total = hi.shape[1]
    grid = (total // tile,)
    gl_spec = pl.BlockSpec((w, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((fr.N_LIMBS, tile), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    rc_spec = _rc_spec()
    mds_spec = pl.BlockSpec((4 * 64, 4 * 32), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    redc_spec = pl.BlockSpec((384, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    redc1_spec = pl.BlockSpec((96, 64), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_leaf_kernel, w=w),
        grid=grid,
        in_specs=[rc_spec, mds_spec, redc_spec, redc1_spec, gl_spec,
                  gl_spec],
        out_specs=h_spec,
        out_shape=jax.ShapeDtypeStruct((fr.N_LIMBS, total), jnp.uint32),
        interpret=interpret,
    )(_rc_operand(rc_np), jnp.asarray(_get_mds_a(), dtype=jnp.bfloat16),
      jnp.asarray(_get_redc_a(), dtype=jnp.bfloat16),
      jnp.asarray(_get_redc_a(1), dtype=jnp.bfloat16), hi, lo)
    if n_pad:
        out = out[:, :n]
    return out


def _path_kernel(rc_ref, mds_ref, redc_ref, redc1_ref, node_ref, sib_ref,
                 idx_ref, act_ref, out_ref, *, node_in_mont=False):
    """One tile of BN254 Merkle paths, whole level loop in VMEM: the node
    hash stays in MONTGOMERY form across levels (the per-level from_mont /
    to_mont round trips of the scan formulation disappear), each level doing
    sibling to_mont + select + the [0, 0, left, right] two_to_one state +
    64 lazy rounds (poseidon_bn254.two_to_one semantics)."""
    d_max = sib_ref.shape[0]
    a_mat = mds_ref[:]
    a_redc = redc_ref[:] if _REDC_MXU else None
    a_redc1 = redc1_ref[:] if _REDC_MXU else None
    zero = jnp.zeros_like(node_ref[:])

    def to_mont(a):
        if a_redc is None:
            return frp.to_mont(a)
        cols = frp.school_const(a, frp._R2_NP)        # raw < 2^21
        return frp.cond_sub_p(_redc_mxu([cols], a_redc1)[0])

    def from_mont(a):
        if a_redc is None:
            return frp.from_mont(a)
        cols = jnp.pad(a, ((0, fr.N_LIMBS), (0, 0)))
        return frp.cond_sub_p(_redc_mxu([cols], a_redc1)[0])

    def level(l, carry):
        node_m, idx = carry                           # (16,T) mont, (1,T)
        sib_m = to_mont(sib_ref[l])
        bit = (idx & np.uint32(1)) == np.uint32(1)    # (1,T): node is right
        left = jnp.where(bit, sib_m, node_m)
        right = jnp.where(bit, node_m, sib_m)
        st = _run_rounds((zero, zero, left, right), rc_ref, a_mat, a_redc,
                         a_redc1)
        new_node = frp.cond_sub_p(st[0])              # canonical mont
        act = act_ref[pl.ds(l, 1), :] == np.uint32(1)
        node_m = jnp.where(act, new_node, node_m)
        idx = jnp.where(act, idx >> np.uint32(1), idx)
        return node_m, idx

    node_m = node_ref[:] if node_in_mont else to_mont(node_ref[:])
    node_m, _ = jax.lax.fori_loop(
        0, d_max, level, (node_m, idx_ref[:]))
    out_ref[:] = from_mont(node_m)                    # canonical standard


def verify_paths_mont_planes(node, siblings, idx, active, interpret=None,
                             node_in_mont=False):
    """Fused BN254 Merkle path verification.

    node:     (16, N) u32 leaf-hash limb planes (standard form, or canonical
              Montgomery form with node_in_mont=True — the
              hash_or_noop_mont_planes output)
    siblings: (d_max, 16, N) zero-padded standard-form sibling planes
    idx:      (N,) u32 leaf indices
    active:   (d_max, N) u32 per-level masks
    Returns (16, N) standard-form root planes (compare vs caps outside)."""
    interpret = _auto_interp(interpret)
    _, rc_np = _get_tables()
    n = node.shape[1]
    d_max = siblings.shape[0]
    tile = _lane_tile(n)
    n_pad = -n % tile
    idx2 = idx[None, :]
    if n_pad:
        node = jnp.pad(node, ((0, 0), (0, n_pad)))
        siblings = jnp.pad(siblings, ((0, 0), (0, 0), (0, n_pad)))
        idx2 = jnp.pad(idx2, ((0, 0), (0, n_pad)))
        active = jnp.pad(active, ((0, 0), (0, n_pad)))
    total = node.shape[1]
    grid = (total // tile,)
    h_spec = pl.BlockSpec((fr.N_LIMBS, tile), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    sib_spec = pl.BlockSpec((d_max, fr.N_LIMBS, tile), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    act_spec = pl.BlockSpec((d_max, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    rc_spec = _rc_spec()
    mds_spec = pl.BlockSpec((4 * 64, 4 * 32), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    redc_spec = pl.BlockSpec((384, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    redc1_spec = pl.BlockSpec((96, 64), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_path_kernel, node_in_mont=node_in_mont),
        grid=grid,
        in_specs=[rc_spec, mds_spec, redc_spec, redc1_spec, h_spec,
                  sib_spec, idx_spec, act_spec],
        out_specs=h_spec,
        out_shape=jax.ShapeDtypeStruct((fr.N_LIMBS, total), jnp.uint32),
        interpret=interpret,
    )(_rc_operand(rc_np), jnp.asarray(_get_mds_a(), dtype=jnp.bfloat16),
      jnp.asarray(_get_redc_a(), dtype=jnp.bfloat16),
      jnp.asarray(_get_redc_a(1), dtype=jnp.bfloat16),
      node, siblings, idx2, active)
    if n_pad:
        out = out[:, :n]
    return out


def permute_mont_planes(state, interpret=False):
    """(64, N) u32 Montgomery-form state plane -> permuted plane."""
    _, rc_np = _get_tables()
    n = state.shape[1]
    tile = _lane_tile(n)
    n_pad = -n % tile
    if n_pad:
        state = jnp.pad(state, ((0, 0), (0, n_pad)))
    total = state.shape[1]
    grid = (total // tile,)
    spec = pl.BlockSpec((WIDTH * fr.N_LIMBS, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    rc_spec = _rc_spec()
    mds_spec = pl.BlockSpec((4 * 64, 4 * 32), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    redc_spec = pl.BlockSpec((384, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    redc1_spec = pl.BlockSpec((96, 64), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _permute_kernel,
        grid=grid,
        in_specs=[rc_spec, mds_spec, redc_spec, redc1_spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((WIDTH * fr.N_LIMBS, total), jnp.uint32),
        interpret=interpret,
    )(_rc_operand(rc_np), jnp.asarray(_get_mds_a(), dtype=jnp.bfloat16),
      jnp.asarray(_get_redc_a(), dtype=jnp.bfloat16),
      jnp.asarray(_get_redc_a(1), dtype=jnp.bfloat16), state)
    if n_pad:
        out = out[:, :n]
    return out


def permute_mont_batchlast(state, interpret=False):
    """Adapter for ops/poseidon_bn254.permute_mont: (..., 4, 16) Montgomery
    state -> same, through the fused plane kernel."""
    batch = state.shape[:-2]
    n = 1
    for d in batch:
        n *= d
    planes = state.reshape(n, WIDTH * fr.N_LIMBS).T   # rows: slot-major limbs
    out = permute_mont_planes(planes, interpret=interpret)
    return out.T.reshape(batch + (WIDTH, fr.N_LIMBS))
