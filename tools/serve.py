"""Batch verification service: a long-running process that turns proof JSON
into verdicts — the framework's serving entry point.

Protocol: one JSON object per stdin line, one JSON response per stdout line
(all logs go to stderr, see utils/logging).  Request:

    {"id": "req-1",
     "stark": {"family": "fibonacci", "num_rows": 32},
     "config": {"num_challenges": 2, "rate_bits": 1, "cap_height": 4,
                "proof_of_work_bits": 16, "num_query_rounds": 84},   # optional
     "hasher": "poseidon_goldilocks",                                 # optional
     "format": "native" | "plonky2",                                  # optional
     "proofs": ["<proof json>", ...]}

"format": "plonky2" accepts proofs in plonky2's own serde-JSON layout
(serde_json of starky StarkProofWithPublicInputs — see interop.py for the
exact schema), so proofs from a Rust plonky2 toolchain verify directly.

Response: {"id": "req-1", "verdicts": [true, ...], "batch": N,
           "compile_s": ..., "verify_ms": ...}

Design for production serving:
  - compile-once per geometry: verifiers are cached by (family, num_rows,
    config, hasher, padded-batch) — steady-state requests pay zero compiles
    (the on-disk jax compilation cache persists across restarts too);
  - batch padding to power-of-two buckets bounds the number of distinct
    compiled programs per geometry to log2(max_batch);
  - malformed requests / wrong-shape proofs return {"error": ...} without
    killing the service.

Cold-start latency: the FIRST request for a new geometry pays the XLA/Mosaic
compile (tens of seconds to minutes on a tunneled TPU backend; ~95 s for the
flagship GL shape, ~8 min for BN254 — see STATUS.md).  For latency-sensitive
deployments, warm each expected geometry at startup by sending one self-
generated request per (family, num_rows, config, hasher, bucket) before
taking traffic; with the persistent compilation cache enabled (default), the
warmup survives process restarts, so steady-state replicas start hot.

Usage:  python tools/serve.py < requests.jsonl > responses.jsonl
Demo:   python tools/serve.py --self-test   (generates, serves, tampers)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# SERVE_PLATFORM=cpu forces the CPU backend (jax.config — this image's
# sitecustomize clobbers a JAX_PLATFORMS=cpu env var at interpreter start,
# so the env route does NOT work; see CLAUDE.md).  Used by tests/test_tools
# so CI never compiles over the TPU tunnel.
if os.environ.get("SERVE_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def _bucket(n):
    b = 1
    while b < n:
        b <<= 1
    return b


class VerifierService:
    def __init__(self):
        self._verifiers = {}
        self._warm = set()
        from halo2_plonky2_verifier_tpu.utils.logging import get_logger
        self.log = get_logger("halo2_plonky2_verifier_tpu.serve")
        # persistent compilation cache: service restarts skip the big compile
        from halo2_plonky2_verifier_tpu.utils.compile import (
            enable_persistent_cache)
        enable_persistent_cache()

    def _config(self, cfg):
        from halo2_plonky2_verifier_tpu.utils.config import FriConfig, StarkConfig
        if not cfg:
            return StarkConfig.standard_fast_config()
        fri_keys = ("rate_bits", "cap_height", "proof_of_work_bits",
                    "num_query_rounds")
        fri = FriConfig(**{k: cfg[k] for k in fri_keys if k in cfg})
        return StarkConfig(num_challenges=cfg.get("num_challenges", 2),
                           fri_config=fri)

    def _stark(self, spec):
        family = spec.get("family", "fibonacci")
        if family == "fibonacci":
            from halo2_plonky2_verifier_tpu.models.fibonacci import FibonacciStark
            return FibonacciStark(spec["num_rows"])
        if family == "plonkish":
            from halo2_plonky2_verifier_tpu.models.plonkish import PlonkishStark
            return PlonkishStark(spec["num_rows"])
        raise ValueError(f"unknown stark family: {family}")

    def _verifier(self, key, stark, config, degree_bits, hasher):
        if key not in self._verifiers:
            from halo2_plonky2_verifier_tpu import build_verifier
            from halo2_plonky2_verifier_tpu.utils.compile import smart_jit
            self.log.info("compiling verifier for %s", key)
            self._verifiers[key] = smart_jit(
                build_verifier(stark, config, degree_bits, hasher=hasher))
        return self._verifiers[key]

    def handle(self, req):
        import numpy as np

        from halo2_plonky2_verifier_tpu import load_proofs, proof_shape
        from halo2_plonky2_verifier_tpu.refimpl.proof import proof_from_json

        stark = self._stark(req["stark"])
        config = self._config(req.get("config"))
        hasher = req.get("hasher", "poseidon_goldilocks")
        fmt = req.get("format", "native")
        if fmt == "plonky2":
            from halo2_plonky2_verifier_tpu.interop import (
                stark_proof_from_plonky2_json as load_json)
        elif fmt == "native":
            load_json = proof_from_json
        else:
            raise ValueError(f"unknown proof format: {fmt}")
        proofs = [load_json(p) if isinstance(p, str) else
                  load_json(json.dumps(p)) for p in req["proofs"]]
        if not proofs:
            return {"id": req.get("id"), "verdicts": []}
        degree_bits = proofs[0].proof.recover_degree_bits(config)
        shape = proof_shape(stark, config, degree_bits, hasher)

        n = len(proofs)
        bucket = _bucket(n)
        padded = proofs + [proofs[0]] * (bucket - n)   # pad with a real proof
        batch = load_proofs(padded, shape)

        key = (req["stark"].get("family", "fibonacci"),
               req["stark"]["num_rows"], config, hasher, bucket)
        verify = self._verifier(key, stark, config, degree_bits, hasher)
        compile_s = None
        if key not in self._warm:    # jit compiles lazily: warm explicitly
            t0 = time.monotonic()
            np.asarray(verify(batch))
            compile_s = round(time.monotonic() - t0, 2)
            self._warm.add(key)
        t1 = time.monotonic()
        verdict = np.asarray(verify(batch))[:n]
        t2 = time.monotonic()
        return {
            "id": req.get("id"),
            "verdicts": [bool(v) for v in verdict],
            "batch": bucket,
            "compile_s": compile_s,
            "verify_ms": round((t2 - t1) * 1e3, 2),
        }

    def run(self, lines_in=sys.stdin, out=sys.stdout):
        for line in lines_in:
            line = line.strip()
            if not line:
                continue
            try:
                resp = self.handle(json.loads(line))
            except Exception as e:  # malformed request must not kill service
                resp = {"error": f"{type(e).__name__}: {e}"}
            out.write(json.dumps(resp) + "\n")
            out.flush()


def self_test():
    """Generate proofs, serve them through the full protocol path, tamper."""
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof
    from halo2_plonky2_verifier_tpu.refimpl.proof import proof_to_json

    stark, config, pwp = get_fibonacci_proof(8)
    good = proof_to_json(pwp)
    bad = json.loads(good)
    bad["public_inputs"][2] = (bad["public_inputs"][2] + 1) % ((1 << 64) - (1 << 32) + 1)
    req = {
        "id": "self-test",
        "stark": {"family": "fibonacci", "num_rows": 8},
        "config": {"num_challenges": config.num_challenges,
                   "rate_bits": config.fri_config.rate_bits,
                   "cap_height": config.fri_config.cap_height,
                   "proof_of_work_bits": config.fri_config.proof_of_work_bits,
                   "num_query_rounds": config.fri_config.num_query_rounds},
        "proofs": [good, json.dumps(bad), good],
    }
    svc = VerifierService()
    resp = svc.handle(req)
    print(json.dumps(resp))
    assert resp["verdicts"] == [True, False, True], resp
    # second request on the same geometry: no compile
    resp2 = svc.handle(req)
    assert resp2["compile_s"] is None and resp2["verdicts"] == [True, False, True]
    # protocol loop: malformed request must answer an error, not die
    import io
    out = io.StringIO()
    svc.run(io.StringIO('{"bad json\n' + json.dumps(req) + "\n"), out)
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert "error" in lines[0] and lines[1]["verdicts"] == [True, False, True]
    # external-format ingestion: the same proofs in plonky2's serde layout
    from halo2_plonky2_verifier_tpu.interop import stark_proof_to_plonky2_json
    ext = stark_proof_to_plonky2_json(pwp)
    bad_ext = json.loads(ext)
    bad_ext["public_inputs"][2] = (bad_ext["public_inputs"][2] + 1) \
        % ((1 << 64) - (1 << 32) + 1)
    req_ext = dict(req, id="self-test-plonky2", format="plonky2",
                   proofs=[ext, json.dumps(bad_ext), ext])
    resp3 = svc.handle(req_ext)
    assert resp3["verdicts"] == [True, False, True], resp3
    print("serve self-test OK (cached verify: %.1f ms; plonky2-format: OK)"
          % resp2["verify_ms"])


if __name__ == "__main__":
    if "--self-test" in sys.argv:
        self_test()
    else:
        VerifierService().run()
