"""Differential tests for the fused Pallas hot-path kernels (interpret mode
on CPU) vs the jnp plane-scan implementations and refimpl pure-int spec.

The fused kernels (ops/merkle_pallas.py, ops/transcript_pallas.py) are what
the TPU verifier actually runs; these tests pin them bit-exactly to the same
semantics the rest of the differential chain validates.
"""

import functools

import numpy as np
import pytest

import jax.numpy as jnp

from halo2_plonky2_verifier_tpu.ops import goldilocks as gl_ops
from halo2_plonky2_verifier_tpu.ops import merkle_pallas, poseidon, transcript_pallas
from halo2_plonky2_verifier_tpu.refimpl import field as gl_int
from halo2_plonky2_verifier_tpu.refimpl import poseidon as pos_ref
from halo2_plonky2_verifier_tpu.utils.compile import smart_jit

RNG = np.random.default_rng(7)

# interpret-mode kernels compiled via smart_jit (XLA:CPU fusion pathology —
# the unrolled 30-round kernel bodies compile pathologically otherwise)
_sponge_i = smart_jit(functools.partial(merkle_pallas.hash_no_pad_planes,
                                        interpret=True))
_paths_i = smart_jit(functools.partial(merkle_pallas.verify_paths_planes,
                                       interpret=True))
_steps_i = smart_jit(functools.partial(transcript_pallas.run_steps_planes,
                                       interpret=True))


def rand_u64(shape):
    return RNG.integers(0, gl_int.P, size=shape, dtype=np.uint64)


def to_planes(x):
    """(N, w) u64 -> (hi, lo) (w, N) u32 planes."""
    hi = (x >> np.uint64(32)).astype(np.uint32).T
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32).T
    return jnp.asarray(hi), jnp.asarray(lo)


def from_planes(p):
    """(hi, lo) (w, N) planes -> (N, w) u64."""
    hi = np.asarray(p[0], dtype=np.uint64).T
    lo = np.asarray(p[1], dtype=np.uint64).T
    return (hi << np.uint64(32)) | lo


def test_sponge_kernel_vs_refimpl():
    for w in (5, 8, 9, 16, 32):
        data = rand_u64((40, w))
        got = from_planes(
            _sponge_i(to_planes(data)))
        for i in range(data.shape[0]):
            want = pos_ref.hash_no_pad([int(v) for v in data[i]])
            assert [int(v) for v in got[i]] == want, (w, i)


def test_sponge_kernel_vs_jnp_planes():
    data = rand_u64((33, 12))
    with poseidon.force_impl("jnp"):
        want = from_planes(poseidon.hash_no_pad_planes(to_planes(data)))
    got = from_planes(
        _sponge_i(to_planes(data)))
    assert (got == want).all()


def _random_paths(n, d_max, depths_per_lane):
    """Build random path-verification inputs; lanes have varying depths."""
    node = rand_u64((n, 4))
    sib = rand_u64((d_max, n, 4))
    idx = RNG.integers(0, 1 << d_max, size=(n,), dtype=np.uint32)
    active = np.zeros((d_max, n), dtype=np.uint32)
    for i, d in enumerate(depths_per_lane):
        active[:d, i] = 1
    return node, sib, idx, active


def _expected_roots(node, sib, idx, active):
    """Pure-int reference of the level loop."""
    n = node.shape[0]
    d_max = sib.shape[0]
    out = []
    for i in range(n):
        cur = [int(v) for v in node[i]]
        ix = int(idx[i])
        for l in range(d_max):
            if not active[l, i]:
                continue
            s = [int(v) for v in sib[l, i]]
            if ix & 1:
                cur = pos_ref.two_to_one(s, cur)
            else:
                cur = pos_ref.two_to_one(cur, s)
            ix >>= 1
        out.append(cur)
    return np.array(out, dtype=np.uint64)


@pytest.mark.parametrize("d_max", [1, 3, 6])
def test_path_kernel_vs_refimpl(d_max):
    n = 50
    depths = [RNG.integers(0, d_max + 1) for _ in range(n)]
    node, sib, idx, active = _random_paths(n, d_max, depths)
    want = _expected_roots(node, sib, idx, active)

    node_p = to_planes(node)
    sib_p_hi = jnp.asarray((sib >> np.uint64(32)).astype(np.uint32)).transpose(0, 2, 1)
    sib_p_lo = jnp.asarray((sib & np.uint64(0xFFFFFFFF)).astype(np.uint32)).transpose(0, 2, 1)
    got = from_planes(_paths_i(
        node_p, (sib_p_hi, sib_p_lo), jnp.asarray(idx), jnp.asarray(active)))
    assert (got == want).all()


def test_path_kernel_vs_jnp_scan():
    from halo2_plonky2_verifier_tpu.fri import merkle_scan_planes

    n, d_max = 64, 4
    depths = [RNG.integers(1, d_max + 1) for _ in range(n)]
    node, sib, idx, active = _random_paths(n, d_max, depths)
    node_p = to_planes(node)
    sib_p = (jnp.asarray((sib >> np.uint64(32)).astype(np.uint32)).transpose(0, 2, 1),
             jnp.asarray((sib & np.uint64(0xFFFFFFFF)).astype(np.uint32)).transpose(0, 2, 1))
    with poseidon.force_impl("jnp"):
        want = from_planes(merkle_scan_planes(
            node_p, jnp.asarray(idx), sib_p, jnp.asarray(active)))
    got = from_planes(_paths_i(node_p, sib_p, jnp.asarray(idx), jnp.asarray(active)))
    assert (got == want).all()


def test_bn254_permute_kernel_vs_refimpl():
    from halo2_plonky2_verifier_tpu.ops import bn254 as fr
    from halo2_plonky2_verifier_tpu.ops import poseidon_bn254_pallas as pbp
    from halo2_plonky2_verifier_tpu.refimpl import poseidon_bn254 as pb_ref

    rng = np.random.default_rng(11)
    vals = [[int.from_bytes(rng.bytes(31), "little") % fr.P_INT
             for _ in range(4)] for _ in range(7)]
    std = fr.from_ints(vals)
    mont = smart_jit(fr.to_mont)(std)
    kern = smart_jit(functools.partial(pbp.permute_mont_batchlast,
                                       interpret=True))
    got = fr.to_ints(smart_jit(fr.from_mont)(kern(mont)))
    for i, v in enumerate(vals):
        want = [w % fr.P_INT for w in pb_ref.permute(v)]
        assert [int(x) for x in got[i]] == want, i


def test_bn254_planes_vs_batchlast():
    from halo2_plonky2_verifier_tpu.ops import bn254 as fr
    from halo2_plonky2_verifier_tpu.ops import bn254_planes as frp

    rng = np.random.default_rng(12)
    va = [int.from_bytes(rng.bytes(31), "little") % fr.P_INT for _ in range(33)]
    vb = [int.from_bytes(rng.bytes(31), "little") % fr.P_INT for _ in range(33)]
    A, B = fr.from_ints(va), fr.from_ints(vb)
    Ap, Bp = frp.to_planes(A), frp.to_planes(B)
    got = fr.to_ints(frp.from_planes(smart_jit(frp.mont_mul)(Ap, Bp), (33,)))
    want = fr.to_ints(smart_jit(fr.mont_mul)(A, B))
    assert (got == want).all()
    got = fr.to_ints(frp.from_planes(smart_jit(frp.add_mod)(Ap, Bp), (33,)))
    assert (got == np.array([(a + b) % fr.P_INT for a, b in zip(va, vb)],
                            dtype=object)).all()


def test_transcript_kernel_vs_jnp_schedule():
    from halo2_plonky2_verifier_tpu.transcript import (
        TranscriptSchedule, run_schedule)

    sched = TranscriptSchedule()
    sched.observe(11)
    sched.get_n_challenges(3)
    sched.observe(5)
    sched.get_n_challenges(12)   # forces a bare permute
    b, n_el = 9, sched.n_elements
    els_np = rand_u64((b, n_el))
    els = ((jnp.asarray((els_np >> np.uint64(32)).astype(np.uint32))),
           (jnp.asarray((els_np & np.uint64(0xFFFFFFFF)).astype(np.uint32))))
    with poseidon.force_impl("jnp"):
        want = run_schedule(sched, els)

    src = np.array([[s if s is not None else 0 for s in st] for st in sched.steps],
                   dtype=np.int32)
    mask = np.array([[s is not None for s in st] for st in sched.steps])
    ch_hi = jnp.transpose(els[0][:, src], (1, 2, 0))
    ch_lo = jnp.transpose(els[1][:, src], (1, 2, 0))
    m = jnp.asarray(mask.astype(np.uint32)[:, :, None])
    got = _steps_i((ch_hi, ch_lo), m)
    assert (np.asarray(got[0]) == np.asarray(want[0])).all()
    assert (np.asarray(got[1]) == np.asarray(want[1])).all()


def test_poseidon_kernel_mds_paths():
    """Both MDS formulations of the fused permutation kernel — the (96,96)
    bf16 MXU matmul and the sublane-roll VPU fallback — must match refimpl
    bit-exactly (incl. the lazy-rounds/final-canonicalize restructuring)."""
    from halo2_plonky2_verifier_tpu.ops import poseidon_pallas as pp

    old = pp._MDS_MXU
    try:
        # per-variant smart_jit wrappers: (a) permute_planes' own jax.jit
        # cache would not retrace after flipping the flag, and (b) plain
        # jax.jit hits the XLA:CPU fusion pathology on this graph (CLAUDE.md)
        for mxu, n in ((True, 256), (False, 384)):
            pp._MDS_MXU = mxu
            f = smart_jit(functools.partial(
                pp._permute_planes_call_impl, interpret=True))
            s = rand_u64((12, n))
            hi, lo = gl_ops.from_u64(s)
            want = np.array([pos_ref.permute([int(v) for v in s[:, i]])
                             for i in range(n)], dtype=np.uint64).T
            oh, ol = f(hi, lo)
            got = gl_ops.to_u64((np.asarray(oh), np.asarray(ol)))
            assert np.array_equal(got, want), f"mxu={mxu}"
    finally:
        pp._MDS_MXU = old


def test_bn254_path_kernel_vs_refimpl():
    """Fused BN254 Merkle path kernel (whole level loop in VMEM, node kept
    in Montgomery form across levels) vs the refimpl two_to_one chain, with
    mixed per-lane depths and left/right orientations."""
    import jax.numpy as jnp

    from halo2_plonky2_verifier_tpu.ops import bn254 as fr
    from halo2_plonky2_verifier_tpu.ops import poseidon_bn254_pallas as pbp
    from halo2_plonky2_verifier_tpu.refimpl.poseidon_bn254 import (
        two_to_one as ref_t2o)

    rng = np.random.default_rng(9)
    N, D = 64, 3

    def rand_fr(n):
        return [int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62))
                % fr.P_INT for _ in range(n)]

    leaves = rand_fr(N)
    sibs = [rand_fr(D) for _ in range(N)]
    idxs = rng.integers(0, 1 << D, N).astype(np.uint32)
    depth_of = [D if i % 3 else 2 for i in range(N)]

    def limbs(v):
        return [(v >> (16 * k)) & 0xFFFF for k in range(16)]

    node_p = np.array([limbs(v) for v in leaves], dtype=np.uint32).T
    sib_p = np.zeros((D, 16, N), dtype=np.uint32)
    act = np.zeros((D, N), dtype=np.uint32)
    for i in range(N):
        act[:depth_of[i], i] = 1
        for l in range(D):
            sib_p[l, :, i] = limbs(sibs[i][l])

    f = smart_jit(functools.partial(pbp.verify_paths_mont_planes,
                                    interpret=True))
    out = np.asarray(f(jnp.asarray(node_p), jnp.asarray(sib_p),
                       jnp.asarray(idxs), jnp.asarray(act)))
    for i in range(N):
        cur, ix = leaves[i], int(idxs[i])
        for l in range(depth_of[i]):
            s = sibs[i][l]
            cur = ref_t2o(s, cur) if ix & 1 else ref_t2o(cur, s)
            ix >>= 1
        got = sum(int(out[k, i]) << (16 * k) for k in range(16))
        assert got == cur, f"lane {i}"


def test_bn254_redc_paths():
    """Both REDC implementations of the BN254 kernel — MXU conv-matmuls
    (default) and the VPU school_const fallback (POSEIDON_BN254_REDC=vpu) —
    produce bit-identical permutations matching refimpl."""
    from halo2_plonky2_verifier_tpu.ops import bn254 as fr
    from halo2_plonky2_verifier_tpu.ops import poseidon_bn254_pallas as pbp
    from halo2_plonky2_verifier_tpu.refimpl import poseidon_bn254 as pb_ref

    rng = np.random.default_rng(13)
    vals = [[int.from_bytes(rng.bytes(31), "little") % fr.P_INT
             for _ in range(4)] for _ in range(5)]
    std = fr.from_ints(vals)
    mont = smart_jit(fr.to_mont)(std)
    want = [[w % fr.P_INT for w in pb_ref.permute(v)] for v in vals]
    old = pbp._REDC_MXU
    try:
        for mxu in (True, False):
            pbp._REDC_MXU = mxu
            kern = smart_jit(functools.partial(pbp.permute_mont_batchlast,
                                               interpret=True))
            got = fr.to_ints(smart_jit(fr.from_mont)(kern(mont)))
            for i in range(len(vals)):
                assert [int(x) for x in got[i]] == want[i], (mxu, i)
    finally:
        pbp._REDC_MXU = old


@pytest.mark.parametrize("w", [2, 3, 4, 9, 13, 21])
def test_bn254_leaf_kernel_vs_refimpl(w):
    """Fused BN254 leaf sponge kernel (hash_or_noop_mont_planes: packing,
    chunked absorb, permutes all in VMEM, Montgomery output) vs the refimpl
    hash_or_noop, across the pack-only (w<=3), single-chunk, and multi-chunk
    (incl. partial last chunk) width regimes."""
    import jax.numpy as jnp

    from halo2_plonky2_verifier_tpu.ops import bn254 as fr
    from halo2_plonky2_verifier_tpu.ops import poseidon_bn254_pallas as pbp
    from halo2_plonky2_verifier_tpu.refimpl import poseidon_bn254 as pb_ref

    rng = np.random.default_rng(100 + w)
    N = 16
    P_GL = (1 << 64) - (1 << 32) + 1
    vals = rng.integers(0, P_GL, size=(N, w), dtype=np.uint64)
    hi = (vals >> 32).astype(np.uint32).T                  # (w, N)
    lo = (vals & 0xFFFFFFFF).astype(np.uint32).T
    f = smart_jit(functools.partial(pbp.hash_or_noop_mont_planes,
                                    interpret=True))
    out = np.asarray(f((jnp.asarray(hi), jnp.asarray(lo))))   # (16, N) mont
    rinv = pow(fr.R_INT, -1, fr.P_INT)
    for i in range(N):
        want = pb_ref.hash_or_noop([int(v) for v in vals[i]])
        got_m = sum(int(out[k, i]) << (16 * k) for k in range(16))
        assert got_m * rinv % fr.P_INT == want % fr.P_INT, (w, i)


def test_bn254_plane_verdict_vs_merged():
    """fri._bn254_merkle_planes_verdict (fused leaf sponge + path kernels,
    interpret mode on CPU) vs fri.merged_merkle_verdict on the same
    synthetic multi-slot geometry: mixed leaf widths (pack-only / one-chunk
    / multi-chunk), mixed depths, consistent planted caps, plus a tampered
    sibling lane — verdicts must agree elementwise and match expectation."""
    import jax.numpy as jnp

    from halo2_plonky2_verifier_tpu import fri
    from halo2_plonky2_verifier_tpu.hashing import get_hash_ops
    from halo2_plonky2_verifier_tpu.ops import bn254 as frops
    from halo2_plonky2_verifier_tpu.refimpl import poseidon_bn254 as pb_ref

    rng = np.random.default_rng(77)
    H = get_hash_ops("poseidon_bn254")
    B, Q = 2, 3
    P_GL = (1 << 64) - (1 << 32) + 1
    lde_bits, cap_height = 5, 2
    slot_cfg = [
        # (width, depth, idx_shift)
        (2, 3, 0),
        (4, 3, 0),
        (21, 2, 1),
    ]
    d_max = max(d for _, d, _ in slot_cfg)
    x_index = rng.integers(0, 1 << lde_bits, size=(B, Q)).astype(np.uint32)
    cap_index = jnp.asarray(x_index >> np.uint32(lde_bits - cap_height))

    def limbs(v):
        return [(v >> (16 * k)) & 0xFFFF for k in range(16)]

    leaf_datas, idxs, sibs, depths, caps = [], [], [], [], []
    for si, (w, d, shift) in enumerate(slot_cfg):
        vals = rng.integers(0, P_GL, size=(B, Q, w), dtype=np.uint64)
        leaf_datas.append((jnp.asarray((vals >> 32).astype(np.uint32)),
                           jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))))
        idx = (x_index >> np.uint32(shift)).astype(np.uint32)
        idxs.append(jnp.asarray(idx))
        depths.append(d)
        sib = np.zeros((B, Q, d, 16), dtype=np.uint32)
        cap = np.zeros((B, 1 << cap_height, 16), dtype=np.uint32)
        for b in range(B):
            for q in range(Q):
                cur = pb_ref.hash_or_noop([int(v) for v in vals[b, q]])
                ix = int(idx[b, q])
                for l in range(d):
                    s = int(rng.integers(0, 2**62)) * int(
                        rng.integers(0, 2**62)) % frops.P_INT
                    sib[b, q, l] = limbs(s)
                    cur = (pb_ref.two_to_one(s, cur) if ix & 1
                           else pb_ref.two_to_one(cur, s))
                    ix >>= 1
                cap[b, int(x_index[b, q]) >> (lde_bits - cap_height)] = \
                    limbs(cur)
        sibs.append(jnp.asarray(sib))
        caps.append(jnp.asarray(cap))

    # tamper lane (b=1, q=2): corrupt slot 1's level-0 sibling
    sibs[1] = sibs[1].at[1, 2, 0, 0].set(sibs[1][1, 2, 0, 0] ^ 1)

    plane_fn = smart_jit(lambda ld, ix, sb, cp, ci:
                         fri._bn254_merkle_planes_verdict(
                             H, ld, ix, sb, tuple(depths), cp, ci, d_max))
    got_plane = np.asarray(plane_fn(leaf_datas, idxs, sibs, caps, cap_index))

    def merged(ld_list, ix, sb, cp, ci):
        nodes = [H.leaf_hash(ld) for ld in ld_list]
        sibs_p = [s if d == d_max else H.pad_level_axis(s, 1, d_max - d)
                  for s, d in zip(sb, depths)]
        return fri.merged_merkle_verdict(
            H, H.stack(nodes, 2), jnp.stack(ix, axis=-1), H.stack(sibs_p, 2),
            tuple(depths), H.stack(cp, 1), ci)

    got_merged = np.asarray(
        smart_jit(merged)(leaf_datas, idxs, sibs, caps, cap_index))

    assert got_plane.shape == got_merged.shape == (B, Q, len(slot_cfg))
    assert np.array_equal(got_plane, got_merged)
    want = np.ones((B, Q, 3), dtype=bool)
    want[1, 2, 1] = False
    assert np.array_equal(got_plane, want)
