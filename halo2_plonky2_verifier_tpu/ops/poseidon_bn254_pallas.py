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


def _get_tables():
    global _M_NP, _RC_NP
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
        _M_NP, _RC_NP = mm, rc
    return _M_NP, _RC_NP


def _sbox5(x):
    x2 = frp.mont_sq(x)
    x4 = frp.mont_sq(x2)
    return frp.redc(frp.school(x4, x))


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


def _permute_kernel(rc_ref, in_ref, out_ref):
    m_np, _ = _get_tables()
    t = in_ref.shape[1]
    st = _split(in_ref[:], t)

    def round_body(r, st, full):
        rc = rc_ref[r]                                # (64, 1)
        st = tuple(frp.add_mod(st[i], rc[16 * i:16 * (i + 1)])
                   for i in range(WIDTH))
        if full:
            st = tuple(_sbox5(s) for s in st)
        else:
            st = (_sbox5(st[0]),) + st[1:]
        return _mix(st, m_np)

    st = jax.lax.fori_loop(0, _HALF, lambda r, s: round_body(r, s, True), st)
    st = jax.lax.fori_loop(_HALF, _ROUNDS - _HALF,
                           lambda r, s: round_body(r, s, False), st)
    st = jax.lax.fori_loop(_ROUNDS - _HALF, _ROUNDS,
                           lambda r, s: round_body(r, s, True), st)
    out_ref[:] = jnp.concatenate(st, axis=0)


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
    out = pl.pallas_call(
        _permute_kernel,
        grid=grid,
        in_specs=[rc_spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((WIDTH * fr.N_LIMBS, total), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(rc_np), state)
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
