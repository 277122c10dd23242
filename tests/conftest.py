import os
import sys

# Tests run on a virtual 8-device CPU mesh (the no-cluster analog of the
# reference's MockProver harness, SURVEY.md §4): sharding/collective code paths
# compile and execute exactly as on a TPU slice, minus the hardware.
#
# NOTE: this environment force-registers the `axon` TPU platform via
# sitecustomize (JAX_PLATFORMS=axon is set before the interpreter starts and
# jax is imported at startup), so mutating os.environ here is too late —
# jax.config.update is the reliable override.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The library default is POSEIDON_GROUPS=8 (the TPU-optimal multi-state
# layout).  On CPU the kernels run in interpret mode, where G=8's lane-pad
# floor (128*G) makes the tiny test shapes ~4x more expensive; the suite
# pins G=2 — the grouped code path with a cheap floor — and covers the
# G=8 default explicitly (test_poseidon_groups: kernel-level G=8 diffs +
# test_e2e_verifier_grouped, full verifier at G=8).  Tests that care set
# groups=/POSEIDON_GROUPS themselves.
os.environ.setdefault("POSEIDON_GROUPS", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache is deliberately NOT enabled for CPU
# test runs — XLA:CPU AOT cache entries reload with machine-feature mismatch
# warnings ("could lead to ... SIGILL"), and the observed speedup was small.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
