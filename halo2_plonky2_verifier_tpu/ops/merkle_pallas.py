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

from ..constants.poseidon_goldilocks import SPONGE_WIDTH
from . import goldilocks as gl
from .poseidon_pallas import (_permute_planes, default_groups, from_groups,
                              lane_tile, mds_operand, mds_spec, rc_planes,
                              rc_spec, to_groups)

W = SPONGE_WIDTH
_TILE = 512  # lanes per grid step (multiple of 128)


def _path_kernel(rc_hi_ref, rc_lo_ref, mds_ref, node_hi_ref, node_lo_ref,
                 sib_hi_ref, sib_lo_ref, idx_ref, act_ref,
                 out_hi_ref, out_lo_ref, *, groups=1):
    """One tile of Merkle paths: fori_loop over levels, each level doing a
    full in-VMEM two_to_one compression (merkle/mod.rs:69-74 semantics).

    groups=G>1: element-major multi-state planes — node rows are e*G+g,
    idx/act rows are per-group.  Siblings and act masks are 3-D
    (d_max, rows, T) refs indexed by the dynamic level l on the LEADING
    (untiled) axis — Mosaic cannot prove sublane alignment for a dynamic
    multi-row offset like l*4G on a 2-D ref ("index in dimension 0 is a
    multiple of 8" compile failure), but a dynamic leading index is fine."""
    g = groups
    d_max = sib_hi_ref.shape[0]
    rc_hi = rc_hi_ref[:]
    rc_lo = rc_lo_ref[:]
    mds_a = mds_ref[:]

    def tile4(m):                                    # (G,T) u32 mask -> (4G,T) i1
        # concat in u32 THEN compare: Mosaic cannot concat i1 vregs (lowers to
        # an invalid bitcast_vreg i1->i32 at G>1)
        m4 = m if g == 1 else jnp.concatenate([m] * 4, axis=0)
        return m4 == np.uint32(1)

    def level(l, carry):
        nh, nl, idx = carry                          # (4G,T), (4G,T), (G,T)
        sh = sib_hi_ref[l]                           # (4G, T)
        sl = sib_lo_ref[l]
        bit4 = tile4(idx & np.uint32(1))             # node is right child
        lh = jnp.where(bit4, sh, nh)
        ll = jnp.where(bit4, sl, nl)
        rh = jnp.where(bit4, nh, sh)
        rl = jnp.where(bit4, nl, sl)
        z = jnp.zeros_like(lh)
        st_h = jnp.concatenate([lh, rh, z], axis=0)  # (12G, T)
        st_l = jnp.concatenate([ll, rl, z], axis=0)
        oh, ol = _permute_planes(st_h, st_l, rc_hi, rc_lo, mds_a, groups=g)
        act = tile4(act_ref[l])                      # (G, T) u32 -> (4G, T) i1
        nh = jnp.where(act, oh[:4 * g, :], nh)
        nl = jnp.where(act, ol[:4 * g, :], nl)
        idx = idx >> np.uint32(1)
        return nh, nl, idx

    nh, nl, _ = jax.lax.fori_loop(
        0, d_max, level, (node_hi_ref[:], node_lo_ref[:], idx_ref[:]))
    out_hi_ref[:] = nh
    out_lo_ref[:] = nl


def verify_paths_planes(node, siblings, idx, active, interpret=False,
                        groups=None):
    """Run all Merkle path loops fused.

    node:     (hi, lo) pair of (4, N) u32 leaf-hash planes
    siblings: (hi, lo) pair of (d_max, 4, N) u32 sibling planes
    idx:      (N,) u32 leaf indices within each path's tree
    active:   (d_max, N) u32 per-level masks (1 while level < slot depth)
    Returns (hi, lo) pair of (4, N) root-node planes (compare vs cap outside).

    With POSEIDON_GROUPS=G>1 the tile is regrouped element-major (G states
    per sublane stack) outside the kernel; siblings/act keep the level axis
    LEADING ((d_max, 4G, N/G) / (d_max, G, N/G)) so the kernel's dynamic
    level index lands on an untiled dim (Mosaic alignment requirement)."""
    g = default_groups() if groups is None else groups
    n = node[0].shape[1]
    d_max = siblings[0].shape[0]
    tile = lane_tile(n, g)
    n_pad = -n % (tile * g)
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
    padded = nh.shape[1]
    if g > 1:
        nh, nl = to_groups(nh, g), to_groups(nl, g)          # (4G, N/G)
        # (d,4,N) -> (d, 4G, N/G): level axis stays leading (untiled)
        sh = to_groups(sh.reshape(d_max * 4, padded), g).reshape(
            d_max, 4 * g, padded // g)
        sl = to_groups(sl.reshape(d_max * 4, padded), g).reshape(
            d_max, 4 * g, padded // g)
        idx2 = to_groups(idx2, g)                            # (G, N/G)
        act = to_groups(act, g).reshape(d_max, g, padded // g)
    else:
        act = act.reshape(d_max, 1, padded)
    total = nh.shape[1]
    grid = (total // tile,)
    h_spec = pl.BlockSpec((4 * g, tile), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    sib_spec = pl.BlockSpec((d_max, 4 * g, tile), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((g, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    act_spec = pl.BlockSpec((d_max, g, tile), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    rch, rcl = rc_planes(g)
    out_hi, out_lo = pl.pallas_call(
        functools.partial(_path_kernel, groups=g),
        grid=grid,
        in_specs=[rc_spec(g), rc_spec(g), mds_spec(g), h_spec, h_spec,
                  sib_spec, sib_spec, idx_spec, act_spec],
        out_specs=(h_spec, h_spec),
        out_shape=(jax.ShapeDtypeStruct((4 * g, total), jnp.uint32),
                   jax.ShapeDtypeStruct((4 * g, total), jnp.uint32)),
        interpret=interpret,
    )(rch, rcl, mds_operand(g), nh, nl, sh, sl, idx2, act)
    if g > 1:
        out_hi, out_lo = from_groups(out_hi, g), from_groups(out_lo, g)
    if n_pad:
        out_hi = out_hi[:, :n]
        out_lo = out_lo[:, :n]
    return out_hi, out_lo


def _sponge_kernel(rc_hi_ref, rc_lo_ref, mds_ref, in_hi_ref, in_lo_ref,
                   out_hi_ref, out_lo_ref, *, groups=1):
    """Leaf sponge over (wG, T) planes: overwrite-mode rate-8 absorb, output =
    first 4 state elements (plonky2 hash_n_to_m_no_pad; permutation.rs:286-305,
    hash.rs:162-184).  w static, so the chunk loop unrolls at trace time.
    Element-major rows: input element e of group g at row e*G+g, so a
    k-element chunk is the aligned rows off*G..(off+k)*G."""
    g = groups
    w = in_hi_ref.shape[0] // g
    t = in_hi_ref.shape[1]
    rc_hi = rc_hi_ref[:]
    rc_lo = rc_lo_ref[:]
    mds_a = mds_ref[:]
    st_h = jnp.zeros((W * g, t), jnp.uint32)
    st_l = jnp.zeros((W * g, t), jnp.uint32)
    off = 0
    while off < w:
        k = min(8, w - off)
        st_h = jnp.concatenate(
            [in_hi_ref[off * g:(off + k) * g, :], st_h[k * g:, :]], axis=0)
        st_l = jnp.concatenate(
            [in_lo_ref[off * g:(off + k) * g, :], st_l[k * g:, :]], axis=0)
        st_h, st_l = _permute_planes(st_h, st_l, rc_hi, rc_lo, mds_a,
                                     groups=g)
        off += k
    out_hi_ref[:] = st_h[:4 * g, :]
    out_lo_ref[:] = st_l[:4 * g, :]


def hash_no_pad_planes(inputs, interpret=False, groups=None):
    """(hi, lo) pair of (w, N) planes -> (4, N) hash planes, fully in-VMEM."""
    g = default_groups() if groups is None else groups
    hi, lo = inputs
    w, n = hi.shape
    tile = lane_tile(n, g)
    n_pad = -n % (tile * g)
    if n_pad:
        hi = jnp.pad(hi, ((0, 0), (0, n_pad)))
        lo = jnp.pad(lo, ((0, 0), (0, n_pad)))
    if g > 1:
        hi, lo = to_groups(hi, g), to_groups(lo, g)
    total = hi.shape[1]
    grid = (total // tile,)
    in_spec = pl.BlockSpec((w * g, tile), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((4 * g, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    rch, rcl = rc_planes(g)
    out_hi, out_lo = pl.pallas_call(
        functools.partial(_sponge_kernel, groups=g),
        grid=grid,
        in_specs=[rc_spec(g), rc_spec(g), mds_spec(g), in_spec, in_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((4 * g, total), jnp.uint32),
                   jax.ShapeDtypeStruct((4 * g, total), jnp.uint32)),
        interpret=interpret,
    )(rch, rcl, mds_operand(g), hi, lo)
    if g > 1:
        out_hi, out_lo = from_groups(out_hi, g), from_groups(out_lo, g)
    if n_pad:
        out_hi = out_hi[:, :n]
        out_lo = out_lo[:, :n]
    return out_hi, out_lo
