"""Fused Pallas TPU kernel for the Poseidon-BN254 permutation (t=4, x^5,
8 full + 56 partial rounds — the gnark/circomlib instance behind the
reference's PoseidonBN254 chips, verifier/src/hash/poseidon_bn254/).

All 64 rounds run with the 4xFr state resident in VMEM in plane layout
(ops/bn254_planes.py: limb index on sublanes, batch on lanes).  Each MDS row
accumulates its four schoolbook products in raw columns and pays a single
Montgomery reduction — 4 REDCs per mix instead of 16.

The jnp scan path (ops/poseidon_bn254.py) serves CPU tests and the op
census; this kernel engages on TPU via poseidon_bn254.permute_mont.
"""

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
_TILE = 256  # batch lanes per grid step

_M_NP = None   # (4, 4, 16) u32 host Montgomery-form MDS limb tables
_RC_NP = None  # (rounds, 64, 1) u32 Montgomery-form round-constant planes
_A_NP = None   # (256, 128) f32 conv-matmul MDS operand (8-bit limb blocks)


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


def _sbox5(x):
    """x^5 with lazy Montgomery reductions (no per-step cond_sub; value
    bounds stay < ~2.6p and cycle stably — see _permute_kernel note)."""
    x2 = frp.redc_lazy(frp.school(x, x))
    x4 = frp.redc_lazy(frp.school(x2, x2))
    return frp.redc_lazy(frp.school(x4, x))


def _mix_mxu(st, a_mat):
    """MDS over 4 (16, T) planes as one (256,128)@(128,T) bf16 matmul.

    The state's 8-bit limb planes go through the conv matrix (exact: f32
    sums < 2^24); the 63 8-bit output columns per element are recombined
    into 32 16-bit raw columns (< 2^25) and Montgomery-reduced with the
    usual cond_sub (the one subtraction per round that keeps the lazy
    value bounds cycling at ~1.6p instead of diverging)."""
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
    out = []
    for i in range(WIDTH):
        evens = y[i * 64:i * 64 + 32]                            # c = 2k
        odds = y[i * 64 + 32:i * 64 + 64]                        # c = 2k+1
        cols16 = (evens + ((odds & np.uint32(0xFF)) << 8)
                  + (pltpu.roll(odds, 1, 0) >> 8))               # < 2^25
        out.append(frp.redc(cols16))
    return tuple(out)


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


def _run_rounds(st, rc_ref, a_mat):
    """All 64 lazy-Montgomery rounds on a 4-tuple of (16, T) planes: values
    drift in [0, ~2.6p) with exactly one conditional subtraction per round
    (inside the mix REDC) — enough to keep the bound cycling (out <= t/R + p
    with t <= 4p * 2.6p and R/p ~ 5.3 gives ~2.6p before, ~1.6p after the
    mix cond_sub).  Output is lazy (< ~1.6p) — callers canonicalize.

    `rc_ref` must be the round-constant REF (not a loaded value): Mosaic
    lowers dynamic indexing on a Ref, but dynamic_slice on a value is
    unimplemented for the loop-carried round counter."""

    def round_body(r, st, full):
        rc = rc_ref[r]                                # (64, 1)
        st = tuple(frp.add_lazy(st[i], rc[16 * i:16 * (i + 1)])
                   for i in range(WIDTH))
        if full:
            st = tuple(_sbox5(s) for s in st)
        else:
            st = (_sbox5(st[0]),) + st[1:]
        return _mix_mxu(st, a_mat)

    st = jax.lax.fori_loop(0, _HALF, lambda r, s: round_body(r, s, True), st)
    st = jax.lax.fori_loop(_HALF, _ROUNDS - _HALF,
                           lambda r, s: round_body(r, s, False), st)
    st = jax.lax.fori_loop(_ROUNDS - _HALF, _ROUNDS,
                           lambda r, s: round_body(r, s, True), st)
    return st


def _permute_kernel(rc_ref, mds_ref, in_ref, out_ref):
    t = in_ref.shape[1]
    st = _run_rounds(_split(in_ref[:], t), rc_ref, mds_ref[:])
    st = tuple(frp.cond_sub_p(s) for s in st)         # lazy -> canonical
    out_ref[:] = jnp.concatenate(st, axis=0)


def _path_kernel(rc_ref, mds_ref, node_ref, sib_ref, idx_ref, act_ref,
                 out_ref):
    """One tile of BN254 Merkle paths, whole level loop in VMEM: the node
    hash stays in MONTGOMERY form across levels (the per-level from_mont /
    to_mont round trips of the scan formulation disappear), each level doing
    sibling to_mont + select + the [0, 0, left, right] two_to_one state +
    64 lazy rounds (poseidon_bn254.two_to_one semantics)."""
    d_max = sib_ref.shape[0]
    a_mat = mds_ref[:]
    zero = jnp.zeros_like(node_ref[:])

    def level(l, carry):
        node_m, idx = carry                           # (16,T) mont, (1,T)
        sib_m = frp.to_mont(sib_ref[l])
        bit = (idx & np.uint32(1)) == np.uint32(1)    # (1,T): node is right
        left = jnp.where(bit, sib_m, node_m)
        right = jnp.where(bit, node_m, sib_m)
        st = _run_rounds((zero, zero, left, right), rc_ref, a_mat)
        new_node = frp.cond_sub_p(st[0])              # canonical mont
        act = act_ref[pl.ds(l, 1), :] == np.uint32(1)
        node_m = jnp.where(act, new_node, node_m)
        idx = jnp.where(act, idx >> np.uint32(1), idx)
        return node_m, idx

    node_m = frp.to_mont(node_ref[:])
    node_m, _ = jax.lax.fori_loop(
        0, d_max, level, (node_m, idx_ref[:]))
    out_ref[:] = frp.from_mont(node_m)                # canonical standard


def verify_paths_mont_planes(node, siblings, idx, active, interpret=False):
    """Fused BN254 Merkle path verification.

    node:     (16, N) u32 standard-form leaf-hash limb planes
    siblings: (d_max, 16, N) zero-padded standard-form sibling planes
    idx:      (N,) u32 leaf indices
    active:   (d_max, N) u32 per-level masks
    Returns (16, N) standard-form root planes (compare vs caps outside)."""
    _, rc_np = _get_tables()
    n = node.shape[1]
    d_max = siblings.shape[0]
    n_pad = -n % _TILE
    idx2 = idx[None, :]
    if n_pad:
        node = jnp.pad(node, ((0, 0), (0, n_pad)))
        siblings = jnp.pad(siblings, ((0, 0), (0, 0), (0, n_pad)))
        idx2 = jnp.pad(idx2, ((0, 0), (0, n_pad)))
        active = jnp.pad(active, ((0, 0), (0, n_pad)))
    total = node.shape[1]
    grid = (total // _TILE,)
    h_spec = pl.BlockSpec((fr.N_LIMBS, _TILE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    sib_spec = pl.BlockSpec((d_max, fr.N_LIMBS, _TILE), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, _TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    act_spec = pl.BlockSpec((d_max, _TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((_ROUNDS, WIDTH * fr.N_LIMBS, 1),
                           lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    mds_spec = pl.BlockSpec((4 * 64, 4 * 32), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _path_kernel,
        grid=grid,
        in_specs=[rc_spec, mds_spec, h_spec, sib_spec, idx_spec, act_spec],
        out_specs=h_spec,
        out_shape=jax.ShapeDtypeStruct((fr.N_LIMBS, total), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(rc_np), jnp.asarray(_get_mds_a(), dtype=jnp.bfloat16),
      node, siblings, idx2, active)
    if n_pad:
        out = out[:, :n]
    return out


def permute_mont_planes(state, interpret=False):
    """(64, N) u32 Montgomery-form state plane -> permuted plane."""
    _, rc_np = _get_tables()
    n = state.shape[1]
    n_pad = -n % _TILE
    if n_pad:
        state = jnp.pad(state, ((0, 0), (0, n_pad)))
    total = state.shape[1]
    grid = (total // _TILE,)
    spec = pl.BlockSpec((WIDTH * fr.N_LIMBS, _TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((_ROUNDS, WIDTH * fr.N_LIMBS, 1),
                           lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    mds_spec = pl.BlockSpec((4 * 64, 4 * 32), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _permute_kernel,
        grid=grid,
        in_specs=[rc_spec, mds_spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((WIDTH * fr.N_LIMBS, total), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(rc_np), jnp.asarray(_get_mds_a(), dtype=jnp.bfloat16), state)
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
