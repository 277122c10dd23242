"""Emit the verifier's static op-count profile (text + collapsed stacks +
flamegraph SVG) — the analog of the reference's committed profile/*.svg
artifacts (produced at stark/mod.rs:453-455, 512-514).

Usage: python tools/profile_verifier.py [num_rows] [gl|bn254] [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # tracing only; no device work

    from halo2_plonky2_verifier_tpu import build_verifier, load_proofs, proof_shape
    from halo2_plonky2_verifier_tpu.refimpl import hashers
    from halo2_plonky2_verifier_tpu.refimpl.fixtures import get_fibonacci_proof
    from halo2_plonky2_verifier_tpu.utils import profiling

    num_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = sys.argv[2] if len(sys.argv) > 2 else "gl"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "profile"
    hasher_ref = hashers.BN254 if cfg == "bn254" else None
    hasher = "poseidon_bn254" if cfg == "bn254" else "poseidon_goldilocks"

    stark, config, pwp = get_fibonacci_proof(num_rows, hasher=hasher_ref)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits, hasher)
    batch = load_proofs([pwp], shape)
    verify = build_verifier(stark, config, degree_bits, hasher=hasher)

    tree = profiling.profile_verifier(verify, batch)

    metric = "bn254_mont_mul" if cfg == "bn254" else "gl_mul"
    os.makedirs(out_dir, exist_ok=True)
    title = f"{cfg} (n={num_rows}) — {metric} per proof"
    print(tree.report(metric))
    print()
    print("poseidon permutes per proof:",
          tree.root.total("poseidon_permute"))
    if cfg == "bn254":
        print("bn254 permutes per proof:",
              tree.root.total("poseidon_bn254_permute"))
    tree.write_collapsed(os.path.join(out_dir, f"{cfg}_n{num_rows}.folded"), metric)
    tree.write_flamegraph_svg(
        os.path.join(out_dir, f"{cfg}_n{num_rows}.svg"), metric, title=title)
    tree.reversed_tree(metric).write_flamegraph_svg(
        os.path.join(out_dir, f"{cfg}_n{num_rows}_rev.svg"), metric,
        title=title + " (reversed)")
    print(f"\nwrote {out_dir}/{cfg}_n{num_rows}{{.folded,.svg,_rev.svg}}")


if __name__ == "__main__":
    main()
