"""Fused Pallas TPU kernel for the whole Fiat-Shamir transcript.

The duplex-sponge challenger (reference: verifier/src/challenger/mod.rs) is
strictly sequential per proof; round 1 ran it as a lax.scan over permutation
steps in batch-last (B, 12) layout — only 12 of 128 lanes useful, and every
step's state materialized between scan iterations.  This kernel runs ALL
steps of the (shape-static) transcript schedule inside one pallas_call, in
plane layout (state element on sublanes, proof batch on lanes): the state
never leaves VMEM; the only HBM traffic is the gathered chunk tensor in and
the squeeze outputs out.

With POSEIDON_GROUPS=G>1 the tile is regrouped element-major (G transcript
states stacked on sublanes, row = element*G + group) like the Merkle kernels:
the partial-round sbox runs on an aligned (G, T) block and all elementwise
ops pack full 8-sublane vregs (see poseidon_pallas.default_groups).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants.poseidon_goldilocks import SPONGE_RATE, SPONGE_WIDTH
from .poseidon_pallas import (_permute_planes, default_groups, from_groups,
                              mds_operand, mds_spec, rc_planes, rc_spec,
                              to_groups)

W = SPONGE_WIDTH
R = SPONGE_RATE
_TILE = 256  # batch lanes per grid step (n_steps * 8 * T * 2 words live in VMEM)


def _transcript_kernel(rc_hi_ref, rc_lo_ref, mds_ref, mask_ref,
                       ch_hi_ref, ch_lo_ref,
                       ys_hi_ref, ys_lo_ref, *, n_steps, groups=1):
    """All transcript steps for one batch tile.  Per step: overwrite masked
    rate lanes with the observed chunk (overwrite-mode absorb,
    permutation.rs:286-301), permute, emit the rate part (squeeze source).

    groups=G>1: chunk/mask/output rows are flattened element-major — step
    s's rows are s*R*G..(s+1)*R*G with row e*G+g holding element e of
    group g; mask rows are group-repeated so broadcasting is unchanged."""
    g = groups
    t = ch_hi_ref.shape[1]
    rc_hi = rc_hi_ref[:]
    rc_lo = rc_lo_ref[:]
    mds_a = mds_ref[:]
    rg = R * g

    def step(s, carry):
        st_h, st_l = carry
        chi = ch_hi_ref[pl.ds(s * rg, rg), :]          # (8G, T)
        clo = ch_lo_ref[pl.ds(s * rg, rg), :]
        m = mask_ref[pl.ds(s * rg, rg), :] == np.uint32(1)  # (8G, 1) broadcasts
        pre_h = jnp.where(m, chi, st_h[:rg, :])
        pre_l = jnp.where(m, clo, st_l[:rg, :])
        st_h = jnp.concatenate([pre_h, st_h[rg:, :]], axis=0)
        st_l = jnp.concatenate([pre_l, st_l[rg:, :]], axis=0)
        st_h, st_l = _permute_planes(st_h, st_l, rc_hi, rc_lo, mds_a,
                                     groups=g)
        ys_hi_ref[pl.ds(s * rg, rg), :] = st_h[:rg, :]
        ys_lo_ref[pl.ds(s * rg, rg), :] = st_l[:rg, :]
        return st_h, st_l

    zero = jnp.zeros((W * g, t), jnp.uint32)
    jax.lax.fori_loop(0, n_steps, step, (zero, zero))


def run_steps_planes(chunks, mask, interpret=False, groups=None):
    """chunks: (hi, lo) pair of (n_steps, 8, B) u32 gathered observation
    chunks; mask: (n_steps, 8, 1) u32 (1 where the lane is overwritten).
    Returns (hi, lo) pair of (n_steps, 8, B) squeeze outputs."""
    g = default_groups() if groups is None else groups
    # grouped blocks are G x taller; shrink the lane tile so the per-tile
    # VMEM footprint (n_steps * 8G * tile words, in + out) stays ~constant
    tile = _TILE if g == 1 else max(128, _TILE // g)
    ch_hi, ch_lo = chunks
    n_steps, _, b = ch_hi.shape
    b_pad = -b % (tile * g)
    if b_pad:
        ch_hi = jnp.pad(ch_hi, ((0, 0), (0, 0), (0, b_pad)))
        ch_lo = jnp.pad(ch_lo, ((0, 0), (0, 0), (0, b_pad)))
    padded = ch_hi.shape[2]
    # flatten the step axis into sublanes and (G>1) regroup element-major:
    # (ns, 8, B) -> (ns*8G, B/G); step s's rows at s*8G..(s+1)*8G
    ch_hi = to_groups(ch_hi.reshape(n_steps * R, padded), g)
    ch_lo = to_groups(ch_lo.reshape(n_steps * R, padded), g)
    m = jnp.repeat(jnp.asarray(mask, jnp.uint32).reshape(n_steps * R, 1), g,
                   axis=0)
    total = ch_hi.shape[1]
    grid = (total // tile,)
    ch_spec = pl.BlockSpec((n_steps * R * g, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((n_steps * R * g, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    rch, rcl = rc_planes(g)
    ys_hi, ys_lo = pl.pallas_call(
        functools.partial(_transcript_kernel, n_steps=n_steps, groups=g),
        grid=grid,
        in_specs=[rc_spec(g), rc_spec(g), mds_spec(g), mask_spec, ch_spec,
                  ch_spec],
        out_specs=(ch_spec, ch_spec),
        out_shape=(jax.ShapeDtypeStruct((n_steps * R * g, total), jnp.uint32),
                   jax.ShapeDtypeStruct((n_steps * R * g, total), jnp.uint32)),
        interpret=interpret,
    )(rch, rcl, mds_operand(g), m, ch_hi, ch_lo)
    ys_hi = from_groups(ys_hi, g).reshape(n_steps, R, padded)
    ys_lo = from_groups(ys_lo, g).reshape(n_steps, R, padded)
    if b_pad:
        ys_hi = ys_hi[:, :, :b]
        ys_lo = ys_lo[:, :, :b]
    return ys_hi, ys_lo
