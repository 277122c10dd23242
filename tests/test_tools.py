"""CI coverage for the operational surfaces (the JSONL verification service
and the 2-process multi-host demo), run as real subprocesses so the protocol
loop, geometry cache, per-host loading, and plonky2-format ingestion paths
are exercised end-to-end and fail loudly on drift."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env(**extra):
    # JAX_PLATFORMS=cpu alone is NOT enough: this image's sitecustomize
    # clobbers it at interpreter start (CLAUDE.md).  The tools take explicit
    # force-cpu routes: run_multihost_demo.py calls jax.config itself;
    # serve.py honors SERVE_PLATFORM=cpu.
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "SERVE_PLATFORM": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    env.update(extra)
    return env


def test_serve_self_test():
    """serve.py --self-test: compile-once geometry cache, tamper rejection,
    malformed-request error path, and plonky2 serde-format ingestion."""
    p = subprocess.run(
        [sys.executable, os.path.join("tools", "serve.py"), "--self-test"],
        cwd=REPO, env=_cpu_env(), capture_output=True, text=True,
        timeout=1800)
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-2000:])
    assert "serve self-test OK" in p.stdout
    assert "plonky2-format: OK" in p.stdout


def test_multihost_demo():
    """2-process jax.distributed bring-up over a global (dp, qp) mesh with
    host-local proof loading; each host checks its own verdict slice."""
    p = subprocess.run(
        [sys.executable, os.path.join("tools", "run_multihost_demo.py")],
        cwd=REPO, env=_cpu_env(MULTIHOST_PORT="12931"),
        capture_output=True, text=True, timeout=1800)
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-2000:])
    assert "multihost demo OK" in p.stdout
