"""FRI verification on TPU lanes: all query rounds of all proofs at once.

Executor form of the reference FriChip (verifier/src/fri/mod.rs:97-502):

- the 84 query rounds are a vectorized axis Q (and proofs a batch axis B) —
  the reference's sequential hot loop (fri/mod.rs:488-501) becomes wide lanes;
- ALL Merkle path checks (every oracle's initial proof and every reduction
  step's proof) are stacked on one "slot" axis and verified by a single
  lax.scan over levels with per-slot depth masks — one Poseidon instance for
  ~90% of the reference's workload (the two_to_one frames in its profile);
- `assert_equal` becomes boolean lanes AND-reduced into a per-proof verdict.

Index conventions follow the chip exactly: x_index = low lde_bits of the
query challenge (LSB-first bits drive left/right selection), cap index = top
cap_height bits, subgroup point = 7 * phi^bitrev(x_index) (fri/mod.rs:363-389).
"""

import numpy as np

import jax
import jax.numpy as jnp

from .ops import goldilocks as gl
from .ops import goldilocks_ext as gle
from .ops import poseidon
from .refimpl import field as gl_int
from .refimpl.fft import reverse_index_bits


def _pow_root_consts(n_log):
    """Host table: phi^(2^k) for phi = primitive 2^n_log-th root."""
    phi = gl_int.primitive_root_of_unity(n_log)
    out = []
    cur = phi
    for _ in range(n_log):
        out.append(cur)
        cur = cur * cur % gl_int.P
    return out


def exp_from_bits_const_base(idx_u32, base_pows, nbits, shape):
    """prod_i (bit_i(idx) ? base^(2^i) : 1) — the executor form of
    exp_from_bits_const_base (base.rs:408-430).  base_pows[i] = base^(2^i)."""
    acc = gl.full(shape, 1)
    for i in range(nbits):
        bit = ((idx_u32 >> np.uint32(i)) & np.uint32(1)) == 1
        acc = gl.select(bit, gl.mul(acc, gl.full(shape, base_pows[i])), acc)
    return acc


def bit_reverse_u32(idx, nbits):
    """Bit-reverse the low nbits of a u32 array."""
    out = jnp.zeros_like(idx)
    for i in range(nbits):
        out = out | (((idx >> np.uint32(i)) & np.uint32(1))
                     << np.uint32(nbits - 1 - i))
    return out


def merged_merkle_verdict(H, nodes, indices, siblings, depths, caps, cap_index):
    """Verify a stack of Merkle paths with one scan, batch-last layout (the
    BN254 hash backend; GL uses the plane-form path below).

    nodes:    (B, Q, S[, hash]) — leaf hashes per slot
    indices:  (B, Q, S) u32 — leaf index within each slot's tree
    siblings: (B, Q, S, Dmax[, hash]) — zero-padded sibling stacks
    depths:   host tuple of per-slot depths
    caps:     (B, S, cap[, hash]) — expected caps per slot
    cap_index:(B, Q) u32
    Returns (B, Q, S) bool.
    """
    S = len(depths)
    d_max = max(depths) if depths else 0
    if d_max:
        level_active = np.zeros((d_max, S), dtype=bool)
        for s, d in enumerate(depths):
            level_active[:d, s] = True
        sib_scan = H.moveaxis(siblings, -2, 0)       # (Dmax, B, Q, S[, hash])

        def level(carry, x):
            (node, idx) = carry
            sib, active = x                          # (B,Q,S[,hash]), (S,)
            bit = (idx & np.uint32(1)) == 1          # True => node is right child
            left = H.select(bit, sib, node)
            right = H.select(bit, node, sib)
            new_node = H.two_to_one(left, right)
            act = jnp.broadcast_to(active[None, None, :], bit.shape)
            node = H.select(act, new_node, node)
            idx = jnp.where(active[None, None, :], idx >> np.uint32(1), idx)
            return (node, idx), None

        from .utils import profiling
        with profiling.multiplier(d_max), profiling.scope("two_to_one"):
            (nodes, indices), _ = jax.lax.scan(
                level, (nodes, indices), (sib_scan, jnp.asarray(level_active)))

    root = H.take_cap(caps, cap_index)               # (B, Q, S[, hash])
    return H.eq(root, nodes)


def _bn254_merkle_planes_verdict(H, leaf_datas, idxs, sibs, depths, caps,
                                 cap_index, d_max):
    """BN254 Merkle verification, plane-first (the BN254 analog of
    _gl_merkle_planes_verdict): leaf hashing runs as fused sponge kernels
    (ops/poseidon_bn254_pallas.hash_or_noop_mont_planes, output kept in
    Montgomery form), and the whole level loop runs in one path kernel with
    lanes = flattened (slot, batch, query) — no batch-last detour and no
    from/to-Montgomery round trips anywhere on the path."""
    from .ops import poseidon_bn254_pallas as pbp

    B, Q = idxs[0].shape
    M = B * Q
    S = len(depths)
    node_parts = []
    for ld in leaf_datas:
        w = ld[0].shape[-1]
        planes = (ld[0].reshape(M, w).T, ld[1].reshape(M, w).T)  # (w, M)
        node_parts.append(pbp.hash_or_noop_mont_planes(planes))
    node = jnp.concatenate(node_parts, axis=1)                 # (16, S*M)
    idx_flat = jnp.concatenate([i.reshape(M) for i in idxs])   # (S*M,)
    sib_parts = []
    for s, d in zip(sibs, depths):
        sp = jnp.transpose(s, (2, 3, 0, 1)).reshape(d, 16, M)  # (d,16,M)
        if d < d_max:
            sp = jnp.pad(sp, ((0, d_max - d), (0, 0), (0, 0)))
        sib_parts.append(sp)
    sib = jnp.concatenate(sib_parts, axis=2)                   # (dmax,16,S*M)
    level_active = np.zeros((d_max, S), dtype=np.uint32)
    for si, d in enumerate(depths):
        level_active[:d, si] = 1
    act = jnp.broadcast_to(
        jnp.asarray(level_active)[:, :, None],
        (d_max, S, M)).reshape(d_max, S * M)
    root_p = pbp.verify_paths_mont_planes(node, sib, idx_flat, act,
                                          node_in_mont=True)   # (16, S*M)
    got = jnp.transpose(root_p.reshape(16, S, B, Q), (2, 3, 1, 0))
    caps_st = H.stack(caps, 1)                                 # (B,S,cap,16)
    root = H.take_cap(caps_st, cap_index)                      # (B,Q,S,16)
    return H.eq(root, got)


def merkle_scan_planes(node, idx, sib, active):
    """Plane-form Merkle level loop: node (4, N) pair, idx (N,) u32,
    sib (d_max, 4, N) pair, active (d_max, N) u32 -> (4, N) root pair.

    On TPU this is ONE fused pallas_call running every level's select +
    two_to_one compression with the state resident in VMEM
    (ops/merkle_pallas.py); the jnp scan (a single two_to_one_planes
    instance) serves CPU tests, GSPMD sharding, and the op census."""
    from .ops import poseidon as pos
    from .utils import profiling

    d_max = sib[0].shape[0]
    if d_max == 0:
        return node
    if pos._impl() == "pallas" and not profiling.active():
        from .ops import merkle_pallas

        return merkle_pallas.verify_paths_planes(node, sib, idx, active)

    def level(carry, x):
        (nd, ix) = carry                            # pair (4,N), (N,)
        (sib_hi, sib_lo, act) = x                   # (4,N) x2, (N,)
        s = (sib_hi, sib_lo)
        bit = ((ix & np.uint32(1)) == 1)[None, :]   # (1,N)
        left = gl.select(bit, s, nd)
        right = gl.select(bit, nd, s)
        new_node = poseidon.two_to_one_planes(left, right)
        m = act == np.uint32(1)
        nd = gl.select(m[None, :], new_node, nd)
        ix = jnp.where(m, ix >> np.uint32(1), ix)
        return (nd, ix), None

    with profiling.multiplier(d_max), profiling.scope("two_to_one"):
        (node, _), _ = jax.lax.scan(
            level, (node, idx), (sib[0], sib[1], active))
    return node


def _gl_merkle_planes_verdict(H, leaf_datas, idxs, sibs, depths, caps,
                              cap_index, d_max):
    """GL Merkle verification, plane-first: leaf hashing, the level loop, and
    the cap compare all run with lanes = flattened (slot, batch, query) and
    hash elements on sublanes — no batch-last detour anywhere on the path."""
    from .ops import poseidon as pos

    B, Q = idxs[0].shape
    M = B * Q
    S = len(depths)
    node_parts = []
    for ld in leaf_datas:
        w = ld[0].shape[-1]
        planes = (ld[0].reshape(M, w).T, ld[1].reshape(M, w).T)
        node_parts.append(pos.hash_or_noop_planes(planes))
    node = (jnp.concatenate([p[0] for p in node_parts], axis=1),
            jnp.concatenate([p[1] for p in node_parts], axis=1))   # (4, S*M)
    idx_flat = jnp.concatenate([i.reshape(M) for i in idxs])       # (S*M,)
    sib_hi, sib_lo = [], []
    for s, d in zip(sibs, depths):
        sh = jnp.transpose(s[0], (2, 3, 0, 1)).reshape(d, 4, M)
        sl = jnp.transpose(s[1], (2, 3, 0, 1)).reshape(d, 4, M)
        if d < d_max:
            sh = jnp.pad(sh, ((0, d_max - d), (0, 0), (0, 0)))
            sl = jnp.pad(sl, ((0, d_max - d), (0, 0), (0, 0)))
        sib_hi.append(sh)
        sib_lo.append(sl)
    sib = (jnp.concatenate(sib_hi, axis=2),
           jnp.concatenate(sib_lo, axis=2))                        # (dmax,4,S*M)
    level_active = np.zeros((d_max, S), dtype=np.uint32)
    for si, d in enumerate(depths):
        level_active[:d, si] = 1
    active = jnp.broadcast_to(
        jnp.asarray(level_active)[:, :, None],
        (d_max, S, M)).reshape(d_max, S * M)

    out = merkle_scan_planes(node, idx_flat, sib, active)          # (4, S*M)
    got = (jnp.transpose(out[0].reshape(4, S, B, Q), (2, 3, 1, 0)),
           jnp.transpose(out[1].reshape(4, S, B, Q), (2, 3, 1, 0)))  # (B,Q,S,4)
    caps_st = H.stack(caps, 1)                                     # (B,S,cap,4)
    root = H.take_cap(caps_st, cap_index)                          # (B,Q,S,4)
    return H.eq(root, got)                                         # (B,Q,S)


def merged_merkle_checks(S, H, batch, x_index, cap_index):
    """EVERY Merkle path check of one verification — all oracles' initial
    proofs and all reduction steps' proofs, stacked on one slot axis — as
    the single fused/merged kernel invocation (the two_to_one frames that
    are ~88% of the reference's workload, BASELINE.md).  Returns (B, Q, S)
    booleans.  Shared by verify_fri and the stripped Merkle-only roofline
    probe (stark.build_merkle_only_verifier), so the probe times EXACTLY the
    kernels the verifier runs."""
    leaf_datas, idxs, sibs, depths, caps = [], [], [], [], []
    for oi, w in enumerate(S.oracle_widths):
        leaf_datas.append(batch.initial_evals[oi])               # (B,Q,w) pair
        idxs.append(x_index)
        sibs.append(batch.initial_siblings[oi])                  # (B,Q,D,4)
        depths.append(S.initial_depth)
    caps.extend(batch.oracle_caps())

    cum = 0
    for si, ab in enumerate(S.reduction_arity_bits):
        cum += ab
        coset_idx = x_index >> np.uint32(cum)
        ev = batch.step_evals[si]                                # (B,Q,arity,2) pair
        flat = (ev[0].reshape(ev[0].shape[:2] + (-1,)),
                ev[1].reshape(ev[1].shape[:2] + (-1,)))          # (B,Q,2*arity)
        leaf_datas.append(flat)
        idxs.append(coset_idx)
        sibs.append(batch.step_siblings[si])
        depths.append(S.step_depths[si])
        caps.append(batch.commit_caps[si])

    d_max = max(depths)
    from .ops import poseidon as _pos
    from .utils import profiling as _prof
    if getattr(H, "supports_planes", False):
        return _gl_merkle_planes_verdict(
            H, leaf_datas, idxs, sibs, tuple(depths), caps, cap_index, d_max)
    if (H.name == "poseidon_bn254" and d_max
            and _pos._impl() == "pallas" and not _prof.active()):
        return _bn254_merkle_planes_verdict(
            H, leaf_datas, idxs, sibs, tuple(depths), caps, cap_index, d_max)
    nodes = [H.leaf_hash(ld) for ld in leaf_datas]               # (B,Q[,hash])
    sibs = [s if d == d_max else H.pad_level_axis(s, 1, d_max - d)
            for s, d in zip(sibs, depths)]
    nodes_st = H.stack(nodes, 2)                                 # (B,Q,S[,hash])
    idx_st = jnp.stack(idxs, axis=-1)                            # (B,Q,S)
    sib_st = H.stack(sibs, 2)                                    # (B,Q,S,Dmax[,hash])
    caps_st = H.stack(caps, 1)                                   # (B,S,cap[,hash])
    return merged_merkle_verdict(H, nodes_st, idx_st, sib_st,
                                 tuple(depths), caps_st, cap_index)


from .utils.profiling import count


@count
def verify_fri(shape, batch, challenges, verdict):
    from .hashing import get_hash_ops
    from .utils import profiling
    from .utils.profiling import scope
    H = get_hash_ops(shape.hasher)
    """FRI verification; returns updated (B,) verdict.

    challenges: dict with gl/gle lane values:
      fri_alpha (ext, (B,)), fri_betas (list of ext), fri_pow_response (gl),
      query_lo ((B, Q) u32 low words of query challenges),
      zeta (ext), instance_batches: list of (point_ext, [(oracle, poly)]),
      openings_batches: list of lists of ext (B,) values.
    """
    S = shape
    B = batch.batch_size
    # Q from the data, not the config: under query sharding (shard_map over
    # the qp mesh axis) each shard verifies its local slice of the
    # S.num_queries independent rounds (the reference's sequential hot loop,
    # fri/mod.rs:488-501).
    Q = challenges["query_lo"].shape[-1]
    n_log = S.lde_bits
    assert n_log < 32

    # --- proof-of-work (fri/mod.rs:131-145) --------------------------------
    verdict = verdict & gl.lt_pow2(
        challenges["fri_pow_response"], 64 - S.proof_of_work_bits)

    # --- query indices ------------------------------------------------------
    x_index = challenges["query_lo"] & np.uint32((1 << n_log) - 1)   # (B, Q)
    cap_height = n_log - S.initial_depth
    cap_index = x_index >> np.uint32(S.initial_depth)                # top bits

    # --- subgroup_x = 7 * phi^bitrev(x_index) ------------------------------
    with scope("subgroup_x"):
        phi_pows = _pow_root_consts(n_log)
        rev = bit_reverse_u32(x_index, n_log)
        phi_pow = exp_from_bits_const_base(rev, phi_pows, n_log, (B, Q))
        subgroup_x = gl.mul(gl.full((B, Q), gl_int.GENERATOR), phi_pow)

    # --- reduced openings (PrecomputedReducedOpenings, fri/mod.rs:41-62) ---
    alpha = challenges["fri_alpha"]
    reduced_openings = [
        gle.reduce_with_powers(vals, alpha)
        for vals in challenges["openings_batches"]
    ]

    # --- combine_initial (fri/mod.rs:170-220) ------------------------------
    _combine_scope = scope("combine_initial")
    _combine_scope.__enter__()
    alpha_bq = _bcast_ext(alpha, (B, Q))
    sx_ext = gle.from_base(subgroup_x)
    # all batch denominators inverted with one Fermat chain
    denoms = [gle.sub(sx_ext, _bcast_ext(point, (B, Q)))
              for (point, _) in challenges["instance_batches"]]
    if len(denoms) == 2:
        denom_invs = list(gle.inv_pair(denoms[0], denoms[1]))
    else:
        denom_invs = [gle.inv(d) for d in denoms]
    total = gle.zeros_like(sx_ext)
    for (point, polys), red_open, denom_inv in zip(
            challenges["instance_batches"], reduced_openings, denom_invs):
        evals = []
        for (oi, pi) in polys:
            ev = (batch.initial_evals[oi][0][..., pi],
                  batch.initial_evals[oi][1][..., pi])          # (B, Q)
            evals.append(gle.from_base(ev))
        reduced_evals = gle.reduce_with_powers(evals, alpha_bq)
        numerator = gle.sub(reduced_evals, _bcast_ext(red_open, (B, Q)))
        alpha_shift = gle.exp_const(alpha_bq, len(evals))
        total = gle.mul(alpha_shift, total)
        total = gle.add(gle.mul(numerator, denom_inv), total)
    old_eval = total
    _combine_scope.__exit__(None, None, None)

    # --- merged Merkle checks ----------------------------------------------
    _mk_scope = scope("verify_merkle_proofs")
    _mk_scope.__enter__()
    mk_ok = merged_merkle_checks(S, H, batch, x_index, cap_index)
    verdict = verdict & mk_ok.all(axis=(1, 2))                   # (B,Q,S)
    _mk_scope.__exit__(None, None, None)

    # --- reduction steps (fri/mod.rs:403-438) ------------------------------
    idx_cur = x_index
    for si, ab in enumerate(S.reduction_arity_bits):
        arity = 1 << ab
        within = idx_cur & np.uint32(arity - 1)                  # (B,Q)
        ev = batch.step_evals[si]                                # (B,Q,arity,2)
        # claimed eval at `within` (select_from_idx, fri/mod.rs:412): unrolled
        # one-hot mask-sum — dynamic gathers are slow on TPU (see take_cap)
        # and arity is a small host constant (16/32)
        def g(a):
            out = jnp.zeros(a.shape[:2] + a.shape[3:], a.dtype)
            for c in range(arity):
                m = (within == np.uint32(c)).astype(a.dtype)[..., None]
                out = out + m * a[:, :, c, :]
            return out
        picked = (g(ev[0]), g(ev[1]))                            # (B,Q,2)
        new_eval = ((picked[0][..., 0], picked[1][..., 0]),
                    (picked[0][..., 1], picked[1][..., 1]))      # ext (B,Q)
        verdict = verdict & gle.eq(new_eval, old_eval).all(axis=1)

        with scope("compute_evaluation"):
            old_eval = _compute_evaluation(
                S, subgroup_x, within, ab, ev, challenges["fri_betas"][si], (B, Q))
        subgroup_x = _square_n_gl(subgroup_x, ab)
        idx_cur = idx_cur >> np.uint32(ab)

    # --- final polynomial check (fri/mod.rs:440-443) -----------------------
    fp = batch.final_poly                                        # (B, L, 2)
    sx_ext = gle.from_base(subgroup_x)
    # Horner over coefficients, highest first, scanned
    coeffs0 = (jnp.moveaxis(fp[0][..., 0], -1, 0), jnp.moveaxis(fp[1][..., 0], -1, 0))
    coeffs1 = (jnp.moveaxis(fp[0][..., 1], -1, 0), jnp.moveaxis(fp[1][..., 1], -1, 0))
    # reversed coefficient order for Horner (reduce_with_powers semantics)
    xs = ((coeffs0[0][::-1], coeffs0[1][::-1]),
          (coeffs1[0][::-1], coeffs1[1][::-1]))

    def horner_step(acc, x):
        (c0, c1) = x                                             # gl pairs (B,)
        c = ((c0[0][..., None], c0[1][..., None]),
             (c1[0][..., None], c1[1][..., None]))               # (B,1) broadcast over Q
        acc = gle.add(gle.mul(acc, sx_ext), c)
        return acc, None

    acc0 = gle.zeros_like(sx_ext)
    with scope("final_poly_eval"), profiling.multiplier(S.final_poly_len):
        acc, _ = jax.lax.scan(horner_step, acc0, xs)
    verdict = verdict & gle.eq(acc, old_eval).all(axis=1)
    return verdict


def _bcast_ext(e, shape):
    """Broadcast an ext value of batch shape (B,) to (B, Q)."""
    def b(x):
        return jnp.broadcast_to(x[..., None], shape)
    return ((b(e[0][0]), b(e[0][1])), (b(e[1][0]), b(e[1][1])))


def _square_n_gl(x, n):
    for _ in range(n):
        x = gl.mul(x, x)
    return x


def _compute_evaluation(S, x, within, arity_bits, evals, beta, bq_shape):
    """Barycentric fold (fri/mod.rs:286-322, interpolate_coset 223-283)."""
    arity = 1 << arity_bits
    g = gl_int.primitive_root_of_unity(arity_bits)
    g_inv = pow(g, arity - 1, gl_int.P)
    # g_inv^(2^k) table
    ginv_pows = []
    cur = g_inv
    for _ in range(arity_bits):
        ginv_pows.append(cur)
        cur = cur * cur % gl_int.P
    rev_within = bit_reverse_u32(within, arity_bits)
    start = exp_from_bits_const_base(rev_within, ginv_pows, arity_bits, bq_shape)
    coset_start = gl.mul(start, x)

    # interpolate over domain two_adic_subgroup(arity_bits), values bit-reversed
    brv = np.array(reverse_index_bits(list(range(arity))), dtype=np.int32)
    ev_brv = (evals[0][:, :, brv, :], evals[1][:, :, brv, :])    # (B,Q,arity,2)

    domain = gl_int.two_adic_subgroup(arity_bits)
    weights = _barycentric_weights_host(domain)

    shifted = gle.scalar_mul(_bcast_ext(beta, bq_shape), gl.inv(coset_start))

    # weighted values: ext scalar-mul by host weight constants
    wv0, wv1 = [], []
    for i in range(arity):
        w = gl.full(bq_shape, weights[i])
        e_i = ((ev_brv[0][..., i, 0], ev_brv[1][..., i, 0]),
               (ev_brv[0][..., i, 1], ev_brv[1][..., i, 1]))
        wv = gle.scalar_mul(e_i, w)
        wv0.append(wv[0])
        wv1.append(wv[1])
    # stack for scan: xs = (arity, B, Q) per component
    wv_hi0 = jnp.stack([v[0] for v in wv0]); wv_lo0 = jnp.stack([v[1] for v in wv0])
    wv_hi1 = jnp.stack([v[0] for v in wv1]); wv_lo1 = jnp.stack([v[1] for v in wv1])
    dom_hi = np.array([d >> 32 for d in domain], dtype=np.uint32)
    dom_lo = np.array([d & 0xFFFFFFFF for d in domain], dtype=np.uint32)

    def body(carry, xel):
        ev_acc, partial = carry
        (whi0, wlo0, whi1, wlo1, dhi, dlo) = xel
        val = ((whi0, wlo0), (whi1, wlo1))
        x_i = gle.from_base((jnp.broadcast_to(dhi, bq_shape),
                             jnp.broadcast_to(dlo, bq_shape)))
        term = gle.sub(shifted, x_i)
        ev_acc = gle.add(gle.mul(ev_acc, term), gle.mul(val, partial))
        partial = gle.mul(partial, term)
        return (ev_acc, partial), None

    zero = gle.zeros_like(shifted)
    one = (gl.full(bq_shape, 1), gl.zeros(bq_shape))
    from .utils import profiling
    with profiling.multiplier(arity):
        (ev_out, _), _ = jax.lax.scan(
            body, (zero, one),
            (wv_hi0, wv_lo0, wv_hi1, wv_lo1, jnp.asarray(dom_hi), jnp.asarray(dom_lo)))
    return ev_out


def _barycentric_weights_host(domain):
    """w_i = 1 / prod_{j != i} (x_i - x_j) over host ints."""
    n = len(domain)
    prods = []
    for i in range(n):
        acc = 1
        for j in range(n):
            if j != i:
                acc = acc * ((domain[i] - domain[j]) % gl_int.P) % gl_int.P
        prods.append(acc)
    return gl_int.batch_inv(prods)
