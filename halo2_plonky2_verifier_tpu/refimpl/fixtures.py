"""Proof fixture management: deterministic Fibonacci-STARK proofs cached on
disk (tests/fixtures/) so the slow pure-int prover runs only once per shape.
"""

import os

from ..models.fibonacci import FibonacciStark, fibonacci
from ..utils.config import StarkConfig
from . import field as gl
from .proof import proof_from_json, proof_to_json

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures")


def fibonacci_public_inputs(num_rows):
    return [0, 1, fibonacci(num_rows - 1, 0, 1, gl.P)]


def get_fibonacci_proof(num_rows, config=None, cache_dir=None, hasher=None,
                        transcript="poseidon_goldilocks"):
    """Returns (stark, config, proof_with_pis); generates and caches on miss.

    `hasher=refimpl.hashers.BN254` produces the PoseidonBN128GoldilocksConfig
    analog (BN254 Merkle commitments, Goldilocks transcript);
    `transcript="poseidon_bn254"` additionally swaps the Fiat-Shamir sponge
    (the all-BN254 configuration)."""
    config = config or StarkConfig.standard_fast_config()
    cache_dir = cache_dir or FIXTURE_DIR
    stark = FibonacciStark(num_rows)
    suffix = "" if hasher is None or hasher.name == "poseidon_goldilocks"         else f"_{hasher.name}"
    if transcript != "poseidon_goldilocks":
        suffix += "_bn254sponge"
    path = os.path.join(cache_dir, f"fib_stark_n{num_rows}{suffix}.json")
    if os.path.exists(path):
        with open(path) as f:
            return stark, config, proof_from_json(f.read())
    from . import prover
    public_inputs = fibonacci_public_inputs(num_rows)
    trace = stark.generate_trace(public_inputs[0], public_inputs[1], gl.P)
    pwp = prover.prove(stark, config, trace, public_inputs, hasher,
                       transcript)
    os.makedirs(cache_dir, exist_ok=True)
    with open(path, "w") as f:
        f.write(proof_to_json(pwp))
    return stark, config, pwp


def _prove_one(args):
    """Top-level worker (picklable) for parallel fixture generation."""
    num_rows, config, hasher_name, k = args
    from . import hashers, prover

    stark = FibonacciStark(num_rows)
    hasher = None if hasher_name is None else getattr(hashers, hasher_name)
    x0, x1 = 2 * k + 1, 3 * k + 2
    pis = [x0 % gl.P, x1 % gl.P, fibonacci(num_rows - 1, x0, x1, gl.P)]
    trace = stark.generate_trace(pis[0], pis[1], gl.P)
    return prover.prove(stark, config, trace, pis, hasher)


def _prove_batch(stark, config, num_rows, count, hasher):
    """Generate `count` distinct proofs, fanning out over cores for large
    counts (the proof factory is pure CPU; the native backend is fork-safe)."""
    hasher_name = None
    if hasher is not None:
        # hashers are module-level singletons; pass by attribute name
        from . import hashers as _h
        hasher_name = next(n for n in dir(_h)
                           if getattr(_h, n, None) is hasher)
    jobs = [(num_rows, config, hasher_name, k) for k in range(count)]
    if count >= 64:
        import multiprocessing as mp
        with mp.Pool(min(mp.cpu_count(), 8)) as pool:
            return pool.map(_prove_one, jobs, chunksize=8)
    return [_prove_one(j) for j in jobs]


def get_fibonacci_proof_batch(num_rows, count, config=None, cache_dir=None,
                              hasher=None):
    """`count` DISTINCT proofs (varying x0/x1 public inputs), cached as one
    JSON-lines file.  Used by the benchmark so batched verification measures
    genuinely different proofs."""
    import json

    config = config or StarkConfig.standard_fast_config()
    cache_dir = cache_dir or FIXTURE_DIR
    stark = FibonacciStark(num_rows)
    suffix = "" if hasher is None or hasher.name == "poseidon_goldilocks" \
        else f"_{hasher.name}"
    path = os.path.join(cache_dir, f"fib_stark_n{num_rows}{suffix}_x{count}.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            proofs = [proof_from_json(line) for line in f if line.strip()]
        if len(proofs) >= count:
            return stark, config, proofs[:count]
    proofs = _prove_batch(stark, config, num_rows, count, hasher)
    os.makedirs(cache_dir, exist_ok=True)
    with open(path, "w") as f:
        for pwp in proofs:
            f.write(proof_to_json(pwp) + "\n")
    return stark, config, proofs


def get_fibonacci_batch_columnar(num_rows, count, config=None, cache_dir=None,
                                 hasher=None):
    """`count` DISTINCT proofs as a loaded, columnar ProofBatch — cached as
    one compressed npz so batch load time is seconds even at count=4096
    (the per-proof JSON walk runs only once, at cache build).

    Returns (stark, config, batch)."""
    from .. import load_proofs, proof_shape
    from ..witness import load_batch_npz, save_batch_npz

    config = config or StarkConfig.standard_fast_config()
    cache_dir = cache_dir or FIXTURE_DIR
    hasher_name = "poseidon_goldilocks" if hasher is None else hasher.name
    suffix = "" if hasher_name == "poseidon_goldilocks" else f"_{hasher_name}"
    npz = os.path.join(cache_dir,
                       f"fib_stark_n{num_rows}{suffix}_x{count}.npz")
    stark, config, pwp = get_fibonacci_proof(num_rows, config, cache_dir,
                                             hasher)
    degree_bits = pwp.proof.recover_degree_bits(config)
    shape = proof_shape(stark, config, degree_bits, hasher_name)
    if os.path.exists(npz):
        template = load_proofs([pwp], shape)
        return stark, config, load_batch_npz(npz, template)
    _, _, proofs = get_fibonacci_proof_batch(num_rows, count, config,
                                             cache_dir, hasher)
    batch = load_proofs(proofs, shape)
    save_batch_npz(npz, batch)
    return stark, config, batch


def recursion_inner_stark_config():
    """Tiny inner STARK shape for the recursive-verifier circuit: one
    arity-4 FRI fold, 2 query rounds, cap 2^1, 8-bit PoW — small enough
    that the outer circuit stays at degree 2^7 while exercising every
    in-circuit verification surface (transcript, Merkle paths, vanishing,
    combine_initial, fold, final poly)."""
    from ..utils.config import FriConfig, StarkConfig
    return StarkConfig(num_challenges=2, fri_config=FriConfig(
        rate_bits=1, cap_height=1, proof_of_work_bits=8,
        reduction_strategy=(2, 1), num_query_rounds=2))


def recursive_fib_setup(num_rows=8, count=2):
    """The recursive-verifier workload (the executor analog of the
    reference's test_recursive_stark_verifier,
    /root/reference/verifier/src/test_util/fibonacci_stark.rs:210-232):
    `count` DISTINCT inner Fibonacci-STARK proofs plus the outer PLONK
    circuit that verifies one such proof in-circuit.

    Returns (stark, inner_config, inners, builder, proof_targets).
    Inner proving is milliseconds (n=8); the circuit build is deterministic
    so the outer common data / digest are stable across runs.

    The outer config keeps the standard_recursion geometry (135/80 wires,
    rate 1/8, cap 2^4, arity-16 folds) but 8 FRI query rounds instead of
    28 — purely a CI wall-clock choice (XLA:CPU compiles the 28-query
    batched verifier for >45 min; gate mix and compositions are
    unaffected by the outer query count)."""
    from ..utils.config import FriConfig
    from . import prover as sprover
    from .plonk import CircuitConfig
    from .plonk.recursion import build_recursive_stark_verifier

    cfg = recursion_inner_stark_config()
    stark = FibonacciStark(num_rows)
    inners = []
    for k in range(count):
        x0, x1 = (2 * k) % gl.P, (2 * k + 1) % gl.P
        pis = [x0, x1, fibonacci(num_rows - 1, x0, x1, gl.P)]
        trace = stark.generate_trace(x0, x1, gl.P)
        inners.append(sprover.prove(stark, cfg, trace, pis))
    outer = CircuitConfig(
        num_wires=135, num_routed_wires=80,
        fri_config=FriConfig(rate_bits=3, cap_height=4,
                             proof_of_work_bits=16,
                             reduction_strategy=(4, 5), num_query_rounds=8))
    b, proof_t = build_recursive_stark_verifier(stark, cfg, inners[0], outer)
    return stark, cfg, inners, b, proof_t


def get_recursive_proof_batch(count=2, num_rows=8, cache_dir=None):
    """`count` outer PLONK proofs, each verifying a DISTINCT inner
    Fibonacci-STARK proof in-circuit; outer proofs cached as JSON lines.

    Returns (common, verifier_data, outer_proofs, inners)."""
    from .plonk import plonk_proof_from_json, plonk_proof_to_json
    from .plonk.prover import prove as plonk_prove
    from .plonk.recursion import recursive_witness

    cache_dir = cache_dir or FIXTURE_DIR
    stark, cfg, inners, b, proof_t = recursive_fib_setup(num_rows, count)
    common, prover_data, verifier_data, builder = b.build()
    path = os.path.join(cache_dir,
                        f"recursive_fib_n{num_rows}_x{count}.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            outers = [plonk_proof_from_json(line) for line in f
                      if line.strip()]
        if len(outers) >= count:
            return common, verifier_data, outers[:count], inners
    outers = [plonk_prove(common, prover_data, builder,
                          recursive_witness(proof_t, inner))
              for inner in inners]
    os.makedirs(cache_dir, exist_ok=True)
    with open(path, "w") as f:
        for pwp in outers:
            f.write(plonk_proof_to_json(pwp) + "\n")
    return common, verifier_data, outers, inners


def bench_plonk_circuit(cfg=None, steps=60):
    """Deterministic PLONK bench circuit with plonky2's FULL
    standard_recursion gate mix — every gate type the plonky2 recursive
    verifier circuit uses (the reference's recursion target,
    /root/reference/verifier/src/test_util/fibonacci_stark.rs:210-232):
    Noop, Constant, PublicInput, Arithmetic, ArithmeticExtension,
    MulExtension, BaseSum, Exponentiation, RandomAccess, Reducing,
    ReducingExtension, CosetInterpolation, Poseidon, PoseidonMds — at the
    standard_recursion_config geometry (135 wires / 80 routed, rate 1/8,
    cap 2^4, 28 queries, arity-16 folds)."""
    from ..utils.config import FriConfig
    from .plonk import CircuitBuilder, CircuitConfig

    if cfg is None:
        cfg = CircuitConfig(
            num_wires=135, num_routed_wires=80,
            fri_config=FriConfig(
                rate_bits=3, cap_height=4, proof_of_work_bits=16,
                reduction_strategy=(4, 5), num_query_rounds=28))
    b = CircuitBuilder(cfg)
    a = b.add_input()
    x = b.add_input()
    b.register_public_input(a)
    b.register_public_input(x)
    cur, prev = x, a
    for _ in range(steps):
        cur, prev = b.add(cur, prev), cur
    y = b.mul(cur, cur)
    e = b.exp(b.constant(3), b.constant(5), 3)   # 3^5, small enough to split
    b.split_le(e, 15)
    z = b.arithmetic(3, 5, y, b.constant(2), cur)
    b.register_public_input(z)

    # the recursion-verifier gate mix, fed from the chain so every proof's
    # witness differs: a sponge digest (PoseidonGate), an explicit MDS step
    # (PoseidonMdsGate), alpha-fold reductions (Reducing / ReducingExtension),
    # an arity-16 coset interpolation (CosetInterpolationGate — the FRI fold
    # step), a random access pick, and extension arithmetic gluing them.
    digest = b.hash_n_to_m_no_pad([a, x, cur, z], 8)
    alpha = (digest[0], digest[1])
    red = b.reduce_with_powers(alpha, [cur, z, y, digest[2]])
    rede = b.reduce_with_powers_ext(
        alpha, [(digest[2], digest[3]), (digest[4], digest[5]), (z, y)])
    state = [(digest[i % 8], digest[(i + 3) % 8]) for i in range(12)]
    mds = b.mds_permute_ext(state)
    values = [mds[i % 12] for i in range(16)]
    pt = b.add_extension(b.mul_extension(red, rede), alpha)
    interp = b.interpolate_coset(4, b.constant(7), values, pt)
    bits = b.split_le(digest[6], 64)
    idx = b.arithmetic(2, 1, bits[1], b.constant(1), bits[0])
    idx = b.arithmetic(4, 1, bits[2], b.constant(1), idx)
    picked = b.random_access(idx, [d for d in digest[:8]])
    for t in (*interp, picked):
        b.register_public_input(t)
    return b, (a, x)


def get_plonk_proof_batch(count, steps=60, cache_dir=None):
    """`count` DISTINCT plonky2-PLONK proofs of the bench circuit (varying
    private inputs), cached as one JSON-lines file.

    Returns (common, verifier_data, proofs)."""
    from .plonk import (plonk_proof_from_json, plonk_proof_to_json, prove,
                        verify)

    cache_dir = cache_dir or FIXTURE_DIR
    b, (a, x) = bench_plonk_circuit(steps=steps)
    common, prover_data, verifier_data, builder = b.build()
    path = os.path.join(cache_dir, f"plonk_recmix_s{steps}_x{count}.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            proofs = [plonk_proof_from_json(line) for line in f if line.strip()]
        if len(proofs) >= count:
            return common, verifier_data, proofs[:count]
    proofs = [prove(common, prover_data, builder,
                    {a: (2 * k + 1) % gl.P, x: (3 * k + 2) % gl.P})
              for k in range(count)]
    for pwp in proofs:
        verify(common, verifier_data, pwp)
    os.makedirs(cache_dir, exist_ok=True)
    with open(path, "w") as f:
        for pwp in proofs:
            f.write(plonk_proof_to_json(pwp) + "\n")
    return common, verifier_data, proofs
