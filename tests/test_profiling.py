"""Profiling subsystem (the reference's ContextTree / #[count] analog)."""

import os

from halo2_plonky2_verifier_tpu import build_verifier, load_proofs, proof_shape
from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof
from halo2_plonky2_verifier_tpu.utils import profiling


def test_profile_verifier_census(tmp_path):
    stark, config, pwp = get_fibonacci_proof(32)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits)
    batch = load_proofs([pwp], shape)
    verify = build_verifier(stark, config, degree_bits)

    tree = profiling.profile_verifier(verify, batch)

    total = tree.root.total("gl_mul")
    assert total > 100_000  # the flagship workload is ~289k muls/proof

    def find(node, name):
        if node.name == name:
            return node
        for c in node.children.values():
            hit = find(c, name)
            if hit is not None:
                return hit
        return None

    # Merkle hashing dominates, mirroring the reference's profile
    mk = find(tree.root, "verify_merkle_proofs").total("gl_mul")
    assert mk / total > 0.5
    assert tree.root.total("poseidon_permute") == 551  # 84*3*2 + transcript

    report = tree.report("gl_mul")
    assert "verify_merkle_proofs" in report and "%" in report

    folded = tmp_path / "p.folded"
    svg = tmp_path / "p.svg"
    tree.write_collapsed(str(folded))
    tree.write_flamegraph_svg(str(svg), title="test")
    assert "two_to_one" in folded.read_text()
    assert svg.read_text().startswith("<svg")


def test_profile_inactive_is_free():
    # without an active profile, scopes are plain named_scopes and record is a no-op
    assert not profiling.active()
    profiling.record("gl_mul", 123)  # no crash, no effect
    with profiling.scope("x"):
        pass


def test_logging_layer(capsys):
    """utils.logging: env_logger-style level filtering with per-module
    overrides (SURVEY.md §5 metrics/logging component)."""
    from halo2_plonky2_verifier_tpu.utils import logging as flog

    log = flog.get_logger("halo2_plonky2_verifier_tpu.witness")
    other = flog.get_logger("halo2_plonky2_verifier_tpu.stark")
    flog.set_level("info")
    log.debug("hidden %d", 1)
    log.info("shown %d", 2)
    flog.set_level("halo2_plonky2_verifier_tpu.witness=trace,error")
    log.trace("witness-trace")
    other.warn("stark-warn-hidden")
    err = capsys.readouterr().err
    assert "hidden 1" not in err
    assert "shown 2" in err
    assert "witness-trace" in err
    assert "stark-warn-hidden" not in err
    assert log.enabled(flog.TRACE)
    flog.set_level("warn")  # restore default
