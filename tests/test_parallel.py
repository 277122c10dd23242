"""Multi-device sharding tests on the virtual 8-device CPU mesh — the
no-cluster analog of a TPU slice (SURVEY.md §4 multi-node strategy)."""

import copy

import numpy as np

import jax

from halo2_plonky2_verifier_tpu import load_proofs, proof_shape
from halo2_plonky2_verifier_tpu.parallel.mesh import (
    make_mesh, shard_batch, sharded_verifier)
from halo2_plonky2_verifier_tpu.refimpl import field as gl
from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof


def _batch(num_rows, n):
    stark, config, pwp = get_fibonacci_proof(num_rows)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits)
    proofs = [copy.deepcopy(pwp) for _ in range(n)]
    return stark, config, degree_bits, shape, proofs


def test_sharded_verify_dp_qp():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(jax.devices()[:8], dp=4, qp=2)
    stark, config, degree_bits, shape, proofs = _batch(8, 8)
    # one tampered lane to prove the sharded path really verifies
    proofs[5].proof.opening_proof.pow_witness ^= 1
    batch = load_proofs(proofs, shape)
    sharded = shard_batch(batch, mesh)
    verify = sharded_verifier(stark, config, degree_bits, mesh)
    verdict = np.asarray(verify(sharded))
    expect = [True] * 8
    expect[5] = False
    assert list(verdict) == expect


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
