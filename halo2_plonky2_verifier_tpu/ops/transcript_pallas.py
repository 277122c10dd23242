"""Fused Pallas TPU kernel for the whole Fiat-Shamir transcript.

The duplex-sponge challenger (reference: verifier/src/challenger/mod.rs) is
strictly sequential per proof; round 1 ran it as a lax.scan over permutation
steps in batch-last (B, 12) layout — only 12 of 128 lanes useful, and every
step's state materialized between scan iterations.  This kernel runs ALL
steps of the (shape-static) transcript schedule inside one pallas_call, in
plane layout (state element on sublanes, proof batch on lanes): the state
never leaves VMEM; the only HBM traffic is the gathered chunk tensor in and
the squeeze outputs out.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants.poseidon_goldilocks import N_ROUNDS, SPONGE_RATE, SPONGE_WIDTH
from .poseidon_pallas import (_RC_HI, _RC_LO, _permute_planes,
                              mds_operand, mds_spec)

W = SPONGE_WIDTH
R = SPONGE_RATE
_TILE = 256  # batch lanes per grid step (n_steps * 8 * T * 2 words live in VMEM)


def _transcript_kernel(rc_hi_ref, rc_lo_ref, mds_ref, mask_ref,
                       ch_hi_ref, ch_lo_ref,
                       ys_hi_ref, ys_lo_ref):
    """All transcript steps for one batch tile.  Per step: overwrite masked
    rate lanes with the observed chunk (overwrite-mode absorb,
    permutation.rs:286-301), permute, emit the rate part (squeeze source)."""
    n_steps = ch_hi_ref.shape[0]
    t = ch_hi_ref.shape[2]
    rc_hi = rc_hi_ref[:]
    rc_lo = rc_lo_ref[:]
    mds_a = mds_ref[:]

    def step(s, carry):
        st_h, st_l = carry
        chi = ch_hi_ref[s]                            # (8, T)
        clo = ch_lo_ref[s]
        m = mask_ref[s] == np.uint32(1)               # (8, 1) broadcasts
        pre_h = jnp.where(m, chi, st_h[:R, :])
        pre_l = jnp.where(m, clo, st_l[:R, :])
        st_h = jnp.concatenate([pre_h, st_h[R:, :]], axis=0)
        st_l = jnp.concatenate([pre_l, st_l[R:, :]], axis=0)
        st_h, st_l = _permute_planes(st_h, st_l, rc_hi, rc_lo, mds_a)
        ys_hi_ref[s] = st_h[:R, :]
        ys_lo_ref[s] = st_l[:R, :]
        return st_h, st_l

    zero = jnp.zeros((W, t), jnp.uint32)
    jax.lax.fori_loop(0, n_steps, step, (zero, zero))


def run_steps_planes(chunks, mask, interpret=False):
    """chunks: (hi, lo) pair of (n_steps, 8, B) u32 gathered observation
    chunks; mask: (n_steps, 8, 1) u32 (1 where the lane is overwritten).
    Returns (hi, lo) pair of (n_steps, 8, B) squeeze outputs."""
    ch_hi, ch_lo = chunks
    n_steps, _, b = ch_hi.shape
    b_pad = -b % _TILE
    if b_pad:
        ch_hi = jnp.pad(ch_hi, ((0, 0), (0, 0), (0, b_pad)))
        ch_lo = jnp.pad(ch_lo, ((0, 0), (0, 0), (0, b_pad)))
    total = ch_hi.shape[2]
    grid = (total // _TILE,)
    ch_spec = pl.BlockSpec((n_steps, R, _TILE), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((n_steps, R, 1), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((W, N_ROUNDS), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    ys_hi, ys_lo = pl.pallas_call(
        _transcript_kernel,
        grid=grid,
        in_specs=[rc_spec, rc_spec, mds_spec(), mask_spec, ch_spec, ch_spec],
        out_specs=(ch_spec, ch_spec),
        out_shape=(jax.ShapeDtypeStruct((n_steps, R, total), jnp.uint32),
                   jax.ShapeDtypeStruct((n_steps, R, total), jnp.uint32)),
        interpret=interpret,
    )(jnp.asarray(_RC_HI), jnp.asarray(_RC_LO), mds_operand(), mask,
      ch_hi, ch_lo)
    if b_pad:
        ys_hi = ys_hi[:, :, :b]
        ys_lo = ys_lo[:, :, :b]
    return ys_hi, ys_lo
