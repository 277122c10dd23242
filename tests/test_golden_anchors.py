"""Frozen bit-exactness anchors (tests/fixtures/golden_anchors.json).

Two guarantees beyond the prover<->verifier differential chain:

1. FROZEN transcript values: every Fiat-Shamir challenge of the canonical
   fixtures is pinned to a committed constant — any drift in challenger
   semantics (observe order, clear-on-observe, LIFO pop, cap element order)
   fails here even if prover and verifier drift together.
2. TRIPLE-IMPLEMENTATION Merkle commit: the trace cap is recomputed from the
   regenerated trace through three independent implementations — refimpl
   pure ints, the C++ native backend, and the JAX ops layer — and must equal
   both the committed proof cap and the frozen anchor.

See tools/gen_golden_anchors.py for the derivation audit.
"""

import json
import os

import numpy as np
import pytest

from halo2_plonky2_verifier_tpu.refimpl import field as gl
from halo2_plonky2_verifier_tpu.refimpl import fft, hashers, verifier
from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof
from halo2_plonky2_verifier_tpu.refimpl.merkle import MerkleTree

ANCHORS = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_anchors.json")


def _load():
    with open(ANCHORS) as f:
        return json.load(f)["anchors"]


def _get(anchor):
    hasher = None if anchor["hasher"] == "poseidon_goldilocks" else hashers.BN254
    return get_fibonacci_proof(anchor["num_rows"], hasher=hasher), hasher


@pytest.mark.parametrize("anchor", _load(),
                         ids=lambda a: f"n{a['num_rows']}_{a['hasher']}")
def test_frozen_transcript_challenges(anchor):
    (stark, config, pwp), hasher = _get(anchor)
    ch = verifier.get_stark_challenges(pwp.proof, stark, config,
                                       hasher or hashers.GOLDILOCKS)
    assert [str(a) for a in ch["stark_alphas"]] == anchor["stark_alphas"]
    assert [str(ch["stark_zeta"][0]), str(ch["stark_zeta"][1])] == anchor["stark_zeta"]
    assert [str(ch["fri_alpha"][0]), str(ch["fri_alpha"][1])] == anchor["fri_alpha"]
    assert [[str(b[0]), str(b[1])] for b in ch["fri_betas"]] == anchor["fri_betas"]
    assert str(ch["fri_pow_response"]) == anchor["fri_pow_response"]
    assert [str(q) for q in ch["fri_query_indices"][:8]] \
        == anchor["fri_query_indices_first8"]
    if "permutation_challenges" in anchor:
        got = [[[str(b), str(g)] for (b, g) in cset]
               for cset in ch["permutation_challenge_sets"]]
        assert got == anchor["permutation_challenges"]


def _load_plonk():
    with open(ANCHORS) as f:
        return json.load(f).get("plonk_anchors", [])


@pytest.mark.parametrize("anchor", _load_plonk(),
                         ids=lambda a: a["circuit"])
def test_frozen_plonk_anchors(anchor):
    """PLONK-path anchors (VERDICT r4 item 7): the recursion-mix bench
    circuit's and the recursive-verifier circuit's digests, commitments,
    and Fiat-Shamir challenges are frozen — prover/verifier co-drift and
    any builder-layout drift fail here."""
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import (
        get_plonk_proof_batch, get_recursive_proof_batch)
    from halo2_plonky2_verifier_tpu.refimpl.plonk.verifier import (
        get_plonk_challenges)
    from halo2_plonky2_verifier_tpu.refimpl.poseidon import hash_no_pad

    if anchor["circuit"] == "plonk_recmix_s60":
        common, vd, proofs = get_plonk_proof_batch(4)
        pwp = proofs[0]
    else:
        common, vd, outers, _inners = get_recursive_proof_batch(count=2)
        pwp = outers[0]
    assert common.degree_bits == anchor["degree_bits"]
    assert [str(x) for x in vd.circuit_digest] == anchor["circuit_digest"]
    assert [str(x) for x in pwp.public_inputs] == anchor["public_inputs"]
    ch = get_plonk_challenges(pwp.proof, hash_no_pad(list(pwp.public_inputs)),
                              common, vd)
    assert [str(ch["plonk_zeta"][0]),
            str(ch["plonk_zeta"][1])] == anchor["plonk_zeta"]
    assert str(ch["fri_pow_response"]) == anchor["fri_pow_response"]
    for key, got in (
            ("plonk_betas", ch["plonk_betas"]),
            ("plonk_gammas", ch["plonk_gammas"]),
            ("plonk_alphas", ch["plonk_alphas"])):
        if key in anchor:
            assert [str(x) for x in got] == anchor[key]
    if "fri_betas" in anchor:
        assert [[str(b[0]), str(b[1])] for b in ch["fri_betas"]] \
            == anchor["fri_betas"]
    if "fri_query_indices_first8" in anchor:
        assert [str(q) for q in ch["fri_query_indices"][:8]] \
            == anchor["fri_query_indices_first8"]
    if "wires_cap_first4" in anchor:
        assert [[str(x) for x in h] for h in pwp.proof.wires_cap[:4]] \
            == anchor["wires_cap_first4"]
    if "constants_sigmas_cap_first4" in anchor:
        assert [[str(x) for x in h]
                for h in vd.constants_sigmas_cap[:4]] \
            == anchor["constants_sigmas_cap_first4"]


def _trace_lde_leaves(stark, config, num_rows):
    """Regenerate the trace and its bit-reversed LDE leaf rows (the committed
    data of the trace oracle; plonky2 PolynomialBatch semantics)."""
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import fibonacci_public_inputs

    pis = fibonacci_public_inputs(num_rows)
    trace = stark.generate_trace(pis[0], pis[1], gl.P)
    rate_bits = config.fri_config.rate_bits
    lde = [fft.coset_fft(fft.lde(fft.ifft(col), rate_bits), gl.GENERATOR)
           for col in trace]
    n_lde = len(lde[0])
    rows = [[col[i] for col in lde] for i in range(n_lde)]
    return fft.reverse_index_bits(rows)


def test_trace_cap_triple_implementation():
    anchor = [a for a in _load()
              if a["num_rows"] == 32 and a["hasher"] == "poseidon_goldilocks"][0]
    (stark, config, pwp), _ = _get(anchor)
    cap_height = config.fri_config.cap_height
    leaves = _trace_lde_leaves(stark, config, anchor["num_rows"])

    # 1. pure-int refimpl (force the python path, not the native one)
    tree = MerkleTree.__new__(MerkleTree)
    levels = [[hashers.GOLDILOCKS.hash_or_noop(leaf) for leaf in leaves]]
    while len(levels[-1]) > (1 << cap_height):
        prev = levels[-1]
        levels.append([hashers.GOLDILOCKS.two_to_one(prev[2 * i], prev[2 * i + 1])
                       for i in range(len(prev) // 2)])
    cap_py = [list(map(int, h)) for h in levels[-1]]
    assert cap_py == [list(map(int, h)) for h in pwp.proof.trace_cap]
    assert [[str(x) for x in h] for h in cap_py] == anchor["trace_cap"]

    # 2. C++ native backend
    from halo2_plonky2_verifier_tpu.refimpl import native_backend as nb

    if nb.available():
        nat_levels = nb.merkle_levels(np.array(leaves, dtype=np.uint64),
                                      cap_height)
        cap_cc = [list(map(int, h)) for h in nat_levels[-1]]
        assert cap_cc == cap_py
    else:
        pytest.skip("native backend unavailable")

    # 3. JAX ops layer (hash_or_noop + scanned two_to_one levels)
    import jax.numpy as jnp

    from halo2_plonky2_verifier_tpu.ops import goldilocks as gl_ops
    from halo2_plonky2_verifier_tpu.ops import poseidon as pos_ops
    from halo2_plonky2_verifier_tpu.utils.compile import smart_jit

    leaves_np = np.array(leaves, dtype=np.uint64)

    def commit(leaf_pair):
        h = pos_ops.hash_or_noop(leaf_pair)              # (n, 4)
        while h[0].shape[0] > (1 << cap_height):
            left = (h[0][0::2], h[1][0::2])
            right = (h[0][1::2], h[1][1::2])
            h = pos_ops.two_to_one(left, right)
        return h

    cap_jax = gl_ops.to_u64(smart_jit(commit)(gl_ops.from_u64(leaves_np)))
    assert [list(map(int, h)) for h in cap_jax] == cap_py
