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

    if (poseidon._impl() == "pallas" and elements[0].ndim == 2
            and not profiling.active()):
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


def extract(ys, ref):
    """Challenge value at a ChallengeRef: Goldilocks pair of (B,) arrays."""
    return (ys[0][ref.step, ref.lane], ys[1][ref.step, ref.lane])


def extract_ext(ys, ref_pair):
    return (extract(ys, ref_pair[0]), extract(ys, ref_pair[1]))
