"""Hash-backend adapters for the JAX verifier (HasherChip analog on lanes).

Two backends matching the reference's configurations:
  - "poseidon_goldilocks": hash = (hi, lo) pair of (..., 4) u32 arrays
  - "poseidon_bn254":      hash = single (..., 16) u16-limb Fr array
Each adapter provides the operations the Merkle layer and transcript need:
leaf hashing, node select, two_to_one, equality, cap gather, and conversion
to Goldilocks elements for Fiat-Shamir observation.
"""

import numpy as np
import jax.numpy as jnp

from .ops import bn254 as fr
from .ops import goldilocks as gl
from .ops import poseidon as pos_gl
from .ops import poseidon_bn254 as pos_bn


class GLHashOps:
    name = "poseidon_goldilocks"
    supports_planes = True

    @staticmethod
    def leaf_hash(gl_inputs):
        """(hi, lo) of (..., k) -> hash."""
        return pos_gl.hash_or_noop(gl_inputs)

    @staticmethod
    def two_to_one(left, right):
        return pos_gl.two_to_one(left, right)

    @staticmethod
    def select(mask, a, b):
        """mask: (...,) bool; hashes (..., 4) pairs."""
        return gl.select(mask[..., None], a, b)

    @staticmethod
    def eq(a, b):
        return gl.eq(a, b).all(axis=-1)

    @staticmethod
    def stack(hashes, axis):
        return (jnp.stack([h[0] for h in hashes], axis=axis),
                jnp.stack([h[1] for h in hashes], axis=axis))

    @staticmethod
    def pad_level_axis(h, axis_from_end, pad):
        def p(x):
            padding = [(0, 0)] * x.ndim
            padding[x.ndim - 1 - axis_from_end] = (0, pad)
            return jnp.pad(x, padding)
        return (p(h[0]), p(h[1]))

    @staticmethod
    def moveaxis(h, src, dst):
        return (jnp.moveaxis(h[0], src, dst), jnp.moveaxis(h[1], src, dst))

    @staticmethod
    def take_along_axis(h, idx, axis):
        return (jnp.take_along_axis(h[0], idx, axis=axis),
                jnp.take_along_axis(h[1], idx, axis=axis))

    @staticmethod
    def broadcast_to(h, shape):
        return (jnp.broadcast_to(h[0], shape + h[0].shape[-1:]),
                jnp.broadcast_to(h[1], shape + h[1].shape[-1:]))

    @staticmethod
    def index(h, idx):
        return (h[0][idx], h[1][idx])

    @staticmethod
    def to_gl_elements(h):
        """hash (..., 4) pair -> list of 4 (hi, lo) scalar-lane pairs
        (observation order, hash/mod.rs:12-18)."""
        return [(h[0][..., i], h[1][..., i]) for i in range(4)]

    @staticmethod
    def canonical_ok(h):
        return gl.is_canonical(h)


class BN254HashOps:
    name = "poseidon_bn254"

    @staticmethod
    def leaf_hash(gl_inputs):
        return pos_bn.hash_or_noop_gl(gl_inputs)

    @staticmethod
    def two_to_one(left, right):
        return pos_bn.two_to_one(left, right)

    @staticmethod
    def select(mask, a, b):
        return jnp.where(mask[..., None], a, b)

    @staticmethod
    def eq(a, b):
        return (a == b).all(axis=-1)

    @staticmethod
    def stack(hashes, axis):
        return jnp.stack(hashes, axis=axis)

    @staticmethod
    def pad_level_axis(h, axis_from_end, pad):
        padding = [(0, 0)] * h.ndim
        padding[h.ndim - 1 - axis_from_end] = (0, pad)
        return jnp.pad(h, padding)

    @staticmethod
    def moveaxis(h, src, dst):
        return jnp.moveaxis(h, src, dst)

    @staticmethod
    def take_along_axis(h, idx, axis):
        return jnp.take_along_axis(h, idx, axis=axis)

    @staticmethod
    def broadcast_to(h, shape):
        return jnp.broadcast_to(h, shape + h.shape[-1:])

    @staticmethod
    def index(h, idx):
        return h[idx]

    @staticmethod
    def to_gl_elements(h):
        """Fr (..., 16) -> 5 x 56-bit (hi, lo) pairs (hash.rs:30-43)."""
        return fr.to_goldilocks_56(h)

    @staticmethod
    def canonical_ok(h):
        return fr.is_canonical(h)


def _take_cap_raw(x, cap_index):
    """x: (B, S, cap, D); cap_index: (B, Q) -> (B, Q, S, D).

    select_from_idx over the Merkle cap (merkle/mod.rs:76-77) as an
    unrolled one-hot mask-sum rather than a gather: TPU lowers
    take_along_axis to dynamic-gather fusions that measured 11% of flagship
    device time (profile/device_time_gl_r3.md, fusion.3/4), while the cap
    size is a small host constant (2^cap_height <= 16 in every shipped
    config), so compare+multiply over the cap axis is a cheap VPU fusion."""
    cap = x.shape[2]
    out = jnp.zeros((x.shape[0], cap_index.shape[1]) + (x.shape[1],
                                                        x.shape[3]), x.dtype)
    for c in range(cap):
        m = (cap_index == np.uint32(c)).astype(x.dtype)[:, :, None, None]
        out = out + m * x[:, None, :, c, :]
    return out


def _gl_take_cap(caps, cap_index):
    return (_take_cap_raw(caps[0], cap_index), _take_cap_raw(caps[1], cap_index))


GLHashOps.take_cap = staticmethod(_gl_take_cap)
BN254HashOps.take_cap = staticmethod(_take_cap_raw)


def get_hash_ops(name):
    if name == "poseidon_goldilocks":
        return GLHashOps
    if name == "poseidon_bn254":
        return BN254HashOps
    raise ValueError(f"unknown hasher {name!r}")
