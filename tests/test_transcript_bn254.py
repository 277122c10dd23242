"""BN254-sponge transcript differential: the symbolic schedule + batched jnp
runner must reproduce refimpl.challenger.BN254Challenger bit-for-bit — the
reference ChallengerChip's other PermutationChip instantiation
(challenger/mod.rs:19; BN254 absorb/squeeze permutation.rs:205-252)."""

import random

import numpy as np

from halo2_plonky2_verifier_tpu.refimpl import field as gl
from halo2_plonky2_verifier_tpu.refimpl.challenger import BN254Challenger
from halo2_plonky2_verifier_tpu.transcript import (BN254TranscriptSchedule,
                                                   extract,
                                                   run_schedule_bn254)


def _script(seed, n_ops=12):
    """A deterministic observe/squeeze interleaving (includes partial
    chunks, multi-permute absorbs, and bare-permute squeezes)."""
    rng = random.Random(seed)
    ops = []
    for _ in range(n_ops):
        if rng.random() < 0.55:
            ops.append(("observe", rng.choice([1, 2, 3, 4, 7, 9, 10, 23])))
        else:
            ops.append(("challenge", rng.choice([1, 2, 3, 16])))
    ops.append(("challenge", 2))
    return ops


def _run_refimpl(ops, values):
    ch = BN254Challenger()
    it = iter(values)
    out = []
    for kind, k in ops:
        if kind == "observe":
            ch.observe_elements([next(it) for _ in range(k)])
        else:
            out.extend(ch.get_n_challenges(k))
    return out


def _run(sched, elements):
    """smart_jit keeps XLA:CPU's fusion pass off these integer-heavy scans
    (a raw eager/jit run compiles pathologically slowly — see CLAUDE.md)."""
    from halo2_plonky2_verifier_tpu.utils.compile import smart_jit

    return smart_jit(lambda e: run_schedule_bn254(sched, e))(elements)


def test_bn254_schedule_matches_refimpl():
    import jax.numpy as jnp

    from halo2_plonky2_verifier_tpu.ops import goldilocks as glops

    ops = _script(7)
    sched = BN254TranscriptSchedule()
    refs = []
    for kind, k in ops:
        if kind == "observe":
            sched.observe(k)
        else:
            refs.extend(sched.get_n_challenges(k))

    rng = np.random.default_rng(3)
    B = 3
    vals = rng.integers(0, gl.P, size=(B, sched.n_elements), dtype=np.uint64)
    elements = glops.from_u64(vals)
    ys = _run(sched, elements)

    for b in range(B):
        expect = _run_refimpl(ops, [int(x) for x in vals[b]])
        got = []
        for ref in refs:
            hi, lo = extract(ys, ref)
            got.append((int(np.asarray(hi)[b]) << 32) | int(np.asarray(lo)[b]))
        assert got == expect


def test_bn254_schedule_partial_chunk_slots():
    """4 observed elements cover Fr slots 1-2 only; slot 3 keeps its prior
    value across the permute (reference absorb_goldilocks semantics)."""
    import jax.numpy as jnp

    from halo2_plonky2_verifier_tpu.ops import goldilocks as glops

    ops = [("observe", 23), ("challenge", 1), ("observe", 4),
           ("challenge", 18)]
    sched = BN254TranscriptSchedule()
    refs = []
    for kind, k in ops:
        if kind == "observe":
            sched.observe(k)
        else:
            refs.extend(sched.get_n_challenges(k))

    rng = np.random.default_rng(11)
    vals = rng.integers(0, gl.P, size=(1, sched.n_elements), dtype=np.uint64)
    elements = glops.from_u64(vals)
    ys = _run(sched, elements)
    expect = _run_refimpl(ops, [int(x) for x in vals[0]])
    got = [(int(np.asarray(extract(ys, r)[0])[0]) << 32)
           | int(np.asarray(extract(ys, r)[1])[0]) for r in refs]
    assert got == expect
