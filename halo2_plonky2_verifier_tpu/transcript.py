"""Fiat-Shamir transcript as ONE lax.scan — the TPU-native duplex sponge.

The reference's ChallengerChip (verifier/src/challenger/mod.rs) interleaves
observe/squeeze calls imperatively; on TPU that would compile one Poseidon
instance per event.  Here the whole transcript is compiled as a single scan:

  1. A `TranscriptSchedule` symbolically replays the challenger semantics
     (observe clears outputs; get_challenge absorbs pending rate-8 chunks in
     overwrite mode then pops output lane 7 downward) and records, per
     permutation step, which flat input element lands in which of the 8 rate
     lanes — plus (step, lane) coordinates for every challenge drawn.
  2. At runtime the flat element stream (a (B, n_elements) Goldilocks pair,
     concatenated in observation order) is gathered into a (n_steps, B, 8)
     chunk tensor, and one scan with a single Poseidon body runs all steps;
     challenges are gathered from the stacked squeeze outputs.

The schedule depends only on proof SHAPE (config + degree_bits), never on
values, so it is built at trace time.
"""

import numpy as np

import jax
import jax.numpy as jnp

from .ops import goldilocks as gl
from .ops import poseidon
from .ops.poseidon import SPONGE_RATE, W


class ChallengeRef:
    """Coordinates of one drawn challenge in the scan outputs."""

    __slots__ = ("step", "lane")

    def __init__(self, step, lane):
        self.step = step
        self.lane = lane


class TranscriptSchedule:
    """Symbolic challenger: mirrors refimpl.challenger.Challenger exactly,
    but over element *indices* instead of values."""

    def __init__(self):
        self.n_elements = 0
        self.steps = []          # list of [slot0..slot7], each int index or None
        self.challenges = []     # ChallengeRef per get_challenge, in order
        self._input = []         # pending element indices
        self._avail = []         # poppable (step, lane) pairs, lane order 0..7

    def observe(self, k):
        """Observe k new stream elements; returns their flat indices."""
        out = list(range(self.n_elements, self.n_elements + k))
        self.n_elements += k
        self._avail.clear()      # outputs invalidated (challenger/mod.rs:45-50)
        self._input.extend(out)
        return out

    def _flush(self):
        for i in range(0, len(self._input), SPONGE_RATE):
            chunk = self._input[i:i + SPONGE_RATE]
            self.steps.append(chunk + [None] * (SPONGE_RATE - len(chunk)))
        step = len(self.steps) - 1
        self._avail = [(step, lane) for lane in range(SPONGE_RATE)]
        self._input.clear()

    def get_challenge(self):
        if self._input:
            self._flush()
        if not self._avail:
            self.steps.append([None] * SPONGE_RATE)  # bare permute
            step = len(self.steps) - 1
            self._avail = [(step, lane) for lane in range(SPONGE_RATE)]
        step, lane = self._avail.pop()               # LIFO: lane 7 first
        ref = ChallengeRef(step, lane)
        self.challenges.append(ref)
        return ref

    def get_n_challenges(self, n):
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self):
        c = self.get_n_challenges(2)
        return (c[0], c[1])


def run_schedule(schedule, elements):
    """Execute the schedule.

    elements: Goldilocks pair of (B, n_elements) arrays (observation order).
    Returns squeeze outputs ys as a pair of (n_steps, 8, B) arrays (plane
    layout: squeeze lane on the middle axis, batch last).
    """
    n_steps = len(schedule.steps)
    assert n_steps > 0
    src = np.array(
        [[s if s is not None else 0 for s in step] for step in schedule.steps],
        dtype=np.int32)                      # (n_steps, 8)
    mask = np.array(
        [[s is not None for s in step] for step in schedule.steps])  # bool

    from .utils import profiling

    use_pallas = (poseidon._impl() == "pallas" and elements[0].ndim == 2
                  and not profiling.active())
    if use_pallas:
        # VMEM guard: XLA places the kernel's (n_steps*8, B) squeeze
        # outputs in scoped VMEM; a wide schedule x a wide batch overflows
        # the 16MB budget (the plonk recursion-mix schedule, 103 steps, at
        # B=4096 allocates 27MB and fails to compile).  Route those through
        # the jnp scan below — the transcript is ~9% of device time, the
        # merged Merkle kernels dominate either way.
        out_bytes = n_steps * 8 * elements[0].shape[0] * 4 * 2
        use_pallas = out_bytes <= 8 * 1024 * 1024
    if use_pallas:
        from .ops import transcript_pallas

        # plane-form chunk gather: (B, n_el)[:, src] -> (B, ns, 8) -> (ns, 8, B)
        ch_hi = jnp.transpose(elements[0][:, src], (1, 2, 0))
        ch_lo = jnp.transpose(elements[1][:, src], (1, 2, 0))
        m = jnp.asarray(mask.astype(np.uint32)[:, :, None])
        return transcript_pallas.run_steps_planes((ch_hi, ch_lo), m)

    # jnp/scan fallback (CPU tests, GSPMD sharding, op-census tracing)
    ch_hi = jnp.moveaxis(elements[0][..., src], elements[0].ndim - 1, 0)
    ch_lo = jnp.moveaxis(elements[1][..., src], elements[1].ndim - 1, 0)
    m = jnp.asarray(mask)

    batch_shape = elements[0].shape[:-1]
    state = poseidon.zero_state(batch_shape)

    def step_fn(state, x):
        chi, clo, sm = x                     # (B, 8), (B, 8), (8,)
        pre_hi = jnp.where(sm, chi, state[0][..., :SPONGE_RATE])
        pre_lo = jnp.where(sm, clo, state[1][..., :SPONGE_RATE])
        state = (jnp.concatenate([pre_hi, state[0][..., SPONGE_RATE:]], axis=-1),
                 jnp.concatenate([pre_lo, state[1][..., SPONGE_RATE:]], axis=-1))
        state = poseidon.permute(state)
        return state, (state[0][..., :SPONGE_RATE], state[1][..., :SPONGE_RATE])

    with profiling.multiplier(n_steps):
        _, ys = jax.lax.scan(step_fn, state, (ch_hi, ch_lo, m))
    # (n_steps, B..., 8) -> (n_steps, 8, B...)
    return (jnp.moveaxis(ys[0], -1, 1), jnp.moveaxis(ys[1], -1, 1))


class BN254TranscriptSchedule:
    """Symbolic BN254-sponge challenger — the reference ChallengerChip's
    OTHER instantiation (challenger/mod.rs:19 is generic over
    PermutationChip; the BN254 absorb/squeeze is permutation.rs:205-252).
    Mirrors refimpl.challenger.BN254Challenger over element indices:

      - absorb steps take chunks of RATE*3 = 9 GL elements, packed 3-per-Fr
        into state slots 1..3 (partial chunks overwrite only covered slots;
        missing GL inside a covered slot pack as zero);
      - each permute step exposes 15 GL outputs (RATE Fr x 5 56-bit limbs),
        popped LIFO.

    Neither reference test config uses this transcript (plonky2's
    PoseidonBN128GoldilocksConfig keeps the GL InnerHasher for Fiat-Shamir),
    so no proof pipeline engages it; it exists for capability parity and is
    differentially pinned in tests/test_transcript_bn254.py."""

    RATE_GL = 9
    OUT_GL = 15

    def __init__(self):
        self.n_elements = 0
        self.steps = []          # list of [idx0..idx8], int index or None
        self.challenges = []     # ChallengeRef(step, limb 0..14)
        self._input = []
        self._avail = []

    def observe(self, k):
        out = list(range(self.n_elements, self.n_elements + k))
        self.n_elements += k
        self._avail.clear()
        self._input.extend(out)
        return out

    def _flush(self):
        for i in range(0, len(self._input), self.RATE_GL):
            chunk = self._input[i:i + self.RATE_GL]
            self.steps.append(chunk + [None] * (self.RATE_GL - len(chunk)))
        step = len(self.steps) - 1
        self._avail = [(step, limb) for limb in range(self.OUT_GL)]
        self._input.clear()

    def get_challenge(self):
        if self._input:
            self._flush()
        if not self._avail:
            self.steps.append([None] * self.RATE_GL)     # bare permute
            step = len(self.steps) - 1
            self._avail = [(step, limb) for limb in range(self.OUT_GL)]
        step, limb = self._avail.pop()                   # LIFO
        ref = ChallengeRef(step, limb)
        self.challenges.append(ref)
        return ref

    def get_n_challenges(self, n):
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self):
        c = self.get_n_challenges(2)
        return (c[0], c[1])


def _fr_limbs_to_gl(limbs):
    """(..., 16) u32 standard-form u16-limb Fr planes -> 5 Goldilocks
    (hi, lo) pairs of 56-bit little-endian limbs (permutation.rs:234-252:
    decompose_le(x, 56, 5); each 56-bit limb is < p_gl, so canonical)."""
    out = []
    for j in range(5):
        bit0 = 56 * j
        lo = jnp.zeros_like(limbs[..., 0])
        hi = jnp.zeros_like(limbs[..., 0])
        for r in range(16):
            rb = 16 * r - bit0                  # bit offset of row r in limb j
            if rb <= -16 or rb >= 56:
                continue
            row = limbs[..., r]
            if rb < 0:
                row = row >> np.uint32(-rb)
                rb = 0
            width = min(16, 56 - rb)
            row = row & np.uint32((1 << width) - 1)
            if rb < 32:
                lo = lo | ((row << np.uint32(rb)) & np.uint32(0xFFFFFFFF))
                if rb + width > 32:
                    hi = hi | (row >> np.uint32(32 - rb))
            else:
                hi = hi | (row << np.uint32(rb - 32))
        out.append((hi, lo))
    return out


def run_schedule_bn254(schedule, elements):
    """Execute a BN254TranscriptSchedule over a batch.

    elements: Goldilocks pair of (B, n_elements) arrays (observation order).
    Returns ys as a pair of (n_steps, 15, B) arrays (squeeze limb on the
    middle axis), compatible with `extract` / `extract_ext`."""
    from .ops import bn254 as fr
    from .ops import poseidon_bn254 as pb

    n_steps = len(schedule.steps)
    assert n_steps > 0
    src = np.array(
        [[s if s is not None else 0 for s in step] for step in schedule.steps],
        dtype=np.int32)                                  # (n_steps, 9)
    present = np.array(
        [[s is not None for s in step] for step in schedule.steps])
    # Fr slot j of a step is overwritten iff the chunk covers position 3j
    slot_mask = present[:, ::3]                          # (n_steps, 3)

    ch_hi = jnp.moveaxis(elements[0][..., src], elements[0].ndim - 1, 0)
    ch_lo = jnp.moveaxis(elements[1][..., src], elements[1].ndim - 1, 0)
    zero32 = np.uint32(0)
    pm = jnp.asarray(present[:, None, :])                # (n_steps, 1, 9)
    ch_hi = jnp.where(pm, ch_hi, zero32)                 # absent GL pack as 0
    ch_lo = jnp.where(pm, ch_lo, zero32)
    sm = jnp.asarray(slot_mask)                          # (n_steps, 3)

    batch_shape = elements[0].shape[:-1]
    state = jnp.zeros(batch_shape + (pb.WIDTH, fr.N_LIMBS), jnp.uint32)

    from .utils import profiling

    def step_fn(state, x):
        chi, clo, m = x                                  # (B, 9), (B, 9), (3,)
        slots = [state[..., 0:1, :]]
        for j in range(3):
            packed = fr.pack_goldilocks(
                [(chi[..., 3 * j + t], clo[..., 3 * j + t])
                 for t in range(3)])
            packed = fr.to_mont(packed)[..., None, :]
            old = state[..., 1 + j:2 + j, :]
            slots.append(jnp.where(m[j], packed, old))
        state = pb.permute_mont(jnp.concatenate(slots, axis=-2))
        out = fr.from_mont(state[..., :3, :])            # (B, 3, 16) std
        gl5 = [_fr_limbs_to_gl(out[..., s, :]) for s in range(3)]
        ys_hi = jnp.stack([gl5[s][k][0] for s in range(3)
                           for k in range(5)], axis=-1)
        ys_lo = jnp.stack([gl5[s][k][1] for s in range(3)
                           for k in range(5)], axis=-1)
        return state, (ys_hi, ys_lo)

    with profiling.multiplier(n_steps):
        _, ys = jax.lax.scan(step_fn, state, (ch_hi, ch_lo, sm))
    return (jnp.moveaxis(ys[0], -1, 1), jnp.moveaxis(ys[1], -1, 1))


def extract(ys, ref):
    """Challenge value at a ChallengeRef: Goldilocks pair of (B,) arrays."""
    return (ys[0][ref.step, ref.lane], ys[1][ref.step, ref.lane])


def extract_ext(ys, ref_pair):
    return (extract(ys, ref_pair[0]), extract(ys, ref_pair[1]))
