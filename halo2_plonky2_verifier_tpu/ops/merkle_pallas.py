"""Fused Pallas TPU kernels for the Merkle hot path: whole-path verification
and leaf sponging, with the Poseidon state resident in VMEM end-to-end.

The reference's profile puts Merkle `two_to_one` at ~88% of the workload
(verifier/profile/gl.svg; merkle/mod.rs:57-78).  Round 1 ran the level loop
as a lax.scan whose body called a per-permutation Pallas kernel — every
pallas_call boundary materialized the (4, N) node planes to HBM and blocked
XLA fusion.  These kernels instead take the ENTIRE path loop inside one
pallas_call: per grid tile, the node planes are read once from HBM, all
`d_max` levels (select-by-index-bit, two_to_one compression, 30 Poseidon
rounds each) run from VMEM/registers, and the final nodes are written once.

Layout: planes — hash element index on sublanes, flattened (slot, batch,
query) lanes on the 128-wide lane axis (the TPU-optimal layout; the
batch-last form wastes 116/128 lanes).

Differentially tested against the jnp plane scan and refimpl/merkle.py.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants.poseidon_goldilocks import N_ROUNDS, SPONGE_WIDTH
from . import goldilocks as gl
from .poseidon_pallas import (_RC_HI, _RC_LO, _permute_planes,
                              mds_operand, mds_spec)

W = SPONGE_WIDTH
_TILE = 512  # lanes per grid step (multiple of 128)


def _path_kernel(rc_hi_ref, rc_lo_ref, mds_ref, node_hi_ref, node_lo_ref,
                 sib_hi_ref, sib_lo_ref, idx_ref, act_ref,
                 out_hi_ref, out_lo_ref):
    """One tile of Merkle paths: fori_loop over levels, each level doing a
    full in-VMEM two_to_one compression (merkle/mod.rs:69-74 semantics)."""
    d_max = sib_hi_ref.shape[0]
    rc_hi = rc_hi_ref[:]
    rc_lo = rc_lo_ref[:]
    mds_a = mds_ref[:]

    def level(l, carry):
        nh, nl, idx = carry                          # (4,T), (4,T), (1,T)
        sh = sib_hi_ref[l]                           # (4, T)
        sl = sib_lo_ref[l]
        bit = (idx & np.uint32(1)) == np.uint32(1)   # (1,T): node is right child
        lh = jnp.where(bit, sh, nh)
        ll = jnp.where(bit, sl, nl)
        rh = jnp.where(bit, nh, sh)
        rl = jnp.where(bit, nl, sl)
        z = jnp.zeros_like(lh)
        st_h = jnp.concatenate([lh, rh, z], axis=0)  # (12, T)
        st_l = jnp.concatenate([ll, rl, z], axis=0)
        oh, ol = _permute_planes(st_h, st_l, rc_hi, rc_lo, mds_a)
        act = act_ref[pl.ds(l, 1), :] == np.uint32(1)  # (1, T)
        nh = jnp.where(act, oh[:4, :], nh)
        nl = jnp.where(act, ol[:4, :], nl)
        idx = idx >> np.uint32(1)
        return nh, nl, idx

    nh, nl, _ = jax.lax.fori_loop(
        0, d_max, level, (node_hi_ref[:], node_lo_ref[:], idx_ref[:]))
    out_hi_ref[:] = nh
    out_lo_ref[:] = nl


def verify_paths_planes(node, siblings, idx, active, interpret=False):
    """Run all Merkle path loops fused.

    node:     (hi, lo) pair of (4, N) u32 leaf-hash planes
    siblings: (hi, lo) pair of (d_max, 4, N) u32 sibling planes
    idx:      (N,) u32 leaf indices within each path's tree
    active:   (d_max, N) u32 per-level masks (1 while level < slot depth)
    Returns (hi, lo) pair of (4, N) root-node planes (compare vs cap outside).
    """
    n = node[0].shape[1]
    d_max = siblings[0].shape[0]
    n_pad = -n % _TILE
    idx2 = idx[None, :]
    nh, nl = node
    sh, sl = siblings
    act = active
    if n_pad:
        nh = jnp.pad(nh, ((0, 0), (0, n_pad)))
        nl = jnp.pad(nl, ((0, 0), (0, n_pad)))
        sh = jnp.pad(sh, ((0, 0), (0, 0), (0, n_pad)))
        sl = jnp.pad(sl, ((0, 0), (0, 0), (0, n_pad)))
        idx2 = jnp.pad(idx2, ((0, 0), (0, n_pad)))
        act = jnp.pad(act, ((0, 0), (0, n_pad)))
    total = nh.shape[1]
    grid = (total // _TILE,)
    h_spec = pl.BlockSpec((4, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    sib_spec = pl.BlockSpec((d_max, 4, _TILE), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, _TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    act_spec = pl.BlockSpec((d_max, _TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((W, N_ROUNDS), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_hi, out_lo = pl.pallas_call(
        _path_kernel,
        grid=grid,
        in_specs=[rc_spec, rc_spec, mds_spec(), h_spec, h_spec, sib_spec,
                  sib_spec, idx_spec, act_spec],
        out_specs=(h_spec, h_spec),
        out_shape=(jax.ShapeDtypeStruct((4, total), jnp.uint32),
                   jax.ShapeDtypeStruct((4, total), jnp.uint32)),
        interpret=interpret,
    )(jnp.asarray(_RC_HI), jnp.asarray(_RC_LO), mds_operand(),
      nh, nl, sh, sl, idx2, act)
    if n_pad:
        out_hi = out_hi[:, :n]
        out_lo = out_lo[:, :n]
    return out_hi, out_lo


def _sponge_kernel(rc_hi_ref, rc_lo_ref, mds_ref, in_hi_ref, in_lo_ref,
                   out_hi_ref, out_lo_ref):
    """Leaf sponge over (w, T) planes: overwrite-mode rate-8 absorb, output =
    first 4 state elements (plonky2 hash_n_to_m_no_pad; permutation.rs:286-305,
    hash.rs:162-184).  w static, so the chunk loop unrolls at trace time."""
    w = in_hi_ref.shape[0]
    t = in_hi_ref.shape[1]
    rc_hi = rc_hi_ref[:]
    rc_lo = rc_lo_ref[:]
    mds_a = mds_ref[:]
    st_h = jnp.zeros((W, t), jnp.uint32)
    st_l = jnp.zeros((W, t), jnp.uint32)
    off = 0
    while off < w:
        k = min(8, w - off)
        st_h = jnp.concatenate([in_hi_ref[off:off + k, :], st_h[k:, :]], axis=0)
        st_l = jnp.concatenate([in_lo_ref[off:off + k, :], st_l[k:, :]], axis=0)
        st_h, st_l = _permute_planes(st_h, st_l, rc_hi, rc_lo, mds_a)
        off += k
    out_hi_ref[:] = st_h[:4, :]
    out_lo_ref[:] = st_l[:4, :]


def hash_no_pad_planes(inputs, interpret=False):
    """(hi, lo) pair of (w, N) planes -> (4, N) hash planes, fully in-VMEM."""
    hi, lo = inputs
    w, n = hi.shape
    n_pad = -n % _TILE
    if n_pad:
        hi = jnp.pad(hi, ((0, 0), (0, n_pad)))
        lo = jnp.pad(lo, ((0, 0), (0, n_pad)))
    total = hi.shape[1]
    grid = (total // _TILE,)
    in_spec = pl.BlockSpec((w, _TILE), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((4, _TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((W, N_ROUNDS), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_hi, out_lo = pl.pallas_call(
        _sponge_kernel,
        grid=grid,
        in_specs=[rc_spec, rc_spec, mds_spec(), in_spec, in_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((4, total), jnp.uint32),
                   jax.ShapeDtypeStruct((4, total), jnp.uint32)),
        interpret=interpret,
    )(jnp.asarray(_RC_HI), jnp.asarray(_RC_LO), mds_operand(), hi, lo)
    if n_pad:
        out_hi = out_hi[:, :n]
        out_lo = out_lo[:, :n]
    return out_hi, out_lo
