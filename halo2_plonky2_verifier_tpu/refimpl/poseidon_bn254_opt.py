"""Optimized C/S/P-schedule Poseidon-BN254 — the evaluation form the
reference actually consumes, derived from our Grain constants.

The reference's PoseidonBN254 chips execute plonky2x's `permution`
(verifier/src/hash/poseidon_bn254/permutation.rs:7-11, 276-299), which is a
Rust port of the go-iden3-crypto / circomlib "optimized" Poseidon schedule:
instead of (ark -> sbox -> dense MDS) every round, the partial-round dense
mixes are re-associated into ONE dense transition matrix `P` plus a SPARSE
matrix per partial round (first row + first column + identity), and the
partial-round constants are compressed to one scalar added after the s-box.
That form is tabulated as constant arrays C (compressed round constants),
S (sparse-matrix entries), M (the MDS), P (the transition matrix).

This module derives the C/S/P tables from the SAME base (constants, MDS)
pair that `refimpl/poseidon_bn254.permute` uses (Grain-regenerated,
KAT-pinned against circomlib t=3 and go-iden3 t=4 — see
constants/poseidon_bn254.py), and evaluates the permutation in exactly the
go-iden3 loop structure.  `tests/test_poseidon_bn254_opt.py` proves the two
schedules agree on random states, which closes the remaining algebraic
assumption in the lineage chain:

    circomlib KATs  ==pins==  our naive schedule
    our naive       ==this==  our optimized C/S/P schedule
    our C/S/P loop  ==structure==  go-iden3 / plonky2x `permution`

(The external plonky2x test vectors themselves cannot be fetched in this
offline environment; the reference's own test is likewise a runtime
differential against `permution`, not a pinned vector.)

Derivation notes (slot layout mirrors go-iden3-crypto poseidon.go):

  entry full rounds r = 0..half-1:   t-vector ark BEFORE the s-box;
                                     rounds 0..half-2 mix with M,
  transition:                        t-vector ark AFTER the s-box of round
                                     half-1, then mix with the dense P,
  partial rounds i = 0..R_P-1:       s-box on lane 0 only, ONE scalar added
                                     to lane 0 after the s-box, then the
                                     sparse mix S_i,
  exit full rounds j = 0..half-2:    s-box, t-vector ark AFTER the s-box,
                                     mix with M,
  last round:                        s-box, mix with M (no constants).

Matrix factorization (column convention, state' = M @ state): write
M = M'' @ M' with M' = diag(1, M_hat) and M'' = [[m00, v @ M_hat^-1],
[w, I]].  M' is the identity on lane 0, so it commutes with the partial
s-box and with the post-sbox scalar add, and merges backward into the
previous round's matrix; iterating from the last partial round leaves one
sparse M''_i per round and a leftover dense M'_0 that merges into the last
entry round's MDS: P = M'_0 @ M.  Constants migrate backward through the
(invertible) per-round matrices; at partial slots only the lane-0 component
can stay (the rest crosses the lane-0-only s-box and keeps moving up).
"""

from ..constants.poseidon_bn254 import (
    FULL_ROUNDS,
    P_BN254 as P,
    PARTIAL_ROUNDS,
    WIDTH,
    generate,
)

_T = WIDTH
_HALF = FULL_ROUNDS // 2
_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS


# ---------------------------------------------------------------------------
# small dense linear algebra mod P (t = 4: everything is tiny)
# ---------------------------------------------------------------------------

def _mat_vec(a, x):
    return [sum(a[i][j] * x[j] for j in range(len(x))) % P
            for i in range(len(a))]


def _mat_mul(a, b):
    n, k, m = len(a), len(b), len(b[0])
    return [[sum(a[i][l] * b[l][j] for l in range(k)) % P for j in range(m)]
            for i in range(n)]


def _mat_inv(a):
    """Gauss-Jordan over GF(P)."""
    n = len(a)
    aug = [[a[i][j] % P for j in range(n)] + [1 if j == i else 0
                                              for j in range(n)]
           for i in range(n)]
    for col in range(n):
        piv = next(r for r in range(col, n) if aug[r][col] % P != 0)
        aug[col], aug[piv] = aug[piv], aug[col]
        inv = pow(aug[col][col], P - 2, P)
        aug[col] = [(x * inv) % P for x in aug[col]]
        for r in range(n):
            if r != col and aug[r][col]:
                f = aug[r][col]
                aug[r] = [(aug[r][j] - f * aug[col][j]) % P
                          for j in range(2 * n)]
    return [row[n:] for row in aug]


def _sparse_to_dense(row0, col0):
    """Sparse matrix [[row0], [col0[k-1], e_k]] -> dense t x t."""
    m = [[0] * _T for _ in range(_T)]
    m[0] = list(row0)
    for k in range(1, _T):
        m[k][0] = col0[k - 1]
        m[k][k] = (m[k][k] + 1) % P
    return m


# ---------------------------------------------------------------------------
# the C/S/P derivation
# ---------------------------------------------------------------------------

def _derive():
    """Returns (F, T_vec, gammas, E, P_mat, sparse, M) where
    F:      half t-vectors (entry-round pre-sbox arks)
    T_vec:  t-vector added post-sbox of entry round half-1, pre-P
    gammas: R_P scalars (post-sbox lane-0 adds)
    E:      half-1 t-vectors (exit-round post-sbox arks)
    P_mat:  dense transition matrix
    sparse: R_P (row0, col0) sparse-mix pairs
    M:      the original MDS."""
    c, m = generate()
    cr = [c[r * _T:(r + 1) * _T] for r in range(_ROUNDS)]

    # --- matrices: factor backward over the partial rounds ---------------
    # D_i (dense matrix assigned to partial round i) starts at M for the
    # LAST partial round; factoring D_i = M''_i @ M'_i pushes the dense
    # M'_i = diag(1, M_hat_i) backward: D_{i-1} = M'_i @ M, and the first
    # round's M'_0 merges into the entry MDS: P = M'_0 @ M.  The state at
    # the pre-sbox position of partial round i is therefore TWISTED by
    # W_i = M'_i relative to the naive flow (W has e0 as its first row, so
    # lane 0 — the s-boxed lane — is twist-free).
    sparse = [None] * PARTIAL_ROUNDS
    mprime = [None] * PARTIAL_ROUNDS                     # W_i = M'_i
    dense = m
    for i in range(PARTIAL_ROUNDS - 1, -1, -1):
        m00 = dense[0][0]
        v = [dense[0][j] for j in range(1, _T)]          # first row tail
        w = [dense[k][0] for k in range(1, _T)]          # first col tail
        m_hat = [[dense[k][j] for j in range(1, _T)] for k in range(1, _T)]
        m_hat_inv = _mat_inv(m_hat)
        # M'' = [[m00, v @ M_hat^-1], [w, I]]
        v_p = [sum(v[a] * m_hat_inv[a][b] for a in range(_T - 1)) % P
               for b in range(_T - 1)]
        sparse[i] = ([m00] + v_p, w)
        mp = [[0] * _T for _ in range(_T)]
        mp[0][0] = 1
        for a in range(_T - 1):
            for b in range(_T - 1):
                mp[1 + a][1 + b] = m_hat[a][b]
        mprime[i] = mp
        if i > 0:
            dense = _mat_mul(mp, m)                      # D_{i-1} = M'_i @ M
        else:
            p_mat = _mat_mul(mp, m)                      # P = M'_0 @ M

    # --- constants ---------------------------------------------------------
    # Entry rounds keep their naive pre-sbox arks (nothing migrates past T).
    F = [list(cr[r]) for r in range(_HALF)]
    # Exit rounds j >= 1: naive pre-sbox c moves back through the previous
    # round's M into the post-sbox slot.
    m_inv = _mat_inv(m)
    E = [_mat_vec(m_inv, cr[_HALF + PARTIAL_ROUNDS + 1 + j])
         for j in range(_HALF - 1)]
    # Partial rounds: solve the deficit recurrence backward.  Let e_i be the
    # (lane-0-free) deficit of the optimized pre-sbox state of partial round
    # i relative to the twisted naive state W_i @ n_i.  Forward:
    #     e_{i+1} = M''_i @ (e_i + gamma_i e0) - W_{i+1} @ c_{i+1}
    # with W_{Rp} = I and the exit requirement e_{Rp} = 0 (the full s-box of
    # the first exit round needs the exact naive state).  Backward that is
    #     u = M''_i^-1 @ (e_{i+1} + W_{i+1} @ c_{i+1})
    #     gamma_i = u[0],  e_i = (0, u[1:])
    # and at the top, the transition slot absorbs the remaining deficit:
    #     T = P^-1 @ (e_0 + W_0 @ c_{r0}).
    gammas = [0] * PARTIAL_ROUNDS
    e = [0] * _T
    for i in range(PARTIAL_ROUNDS - 1, -1, -1):
        c_next = cr[_HALF + i + 1]
        w_next = mprime[i + 1] if i + 1 < PARTIAL_ROUNDS else None
        twisted = _mat_vec(w_next, c_next) if w_next else list(c_next)
        rhs = [(e[k] + twisted[k]) % P for k in range(_T)]
        u = _mat_vec(_mat_inv(_sparse_to_dense(*sparse[i])), rhs)
        gammas[i] = u[0]
        e = [0] + u[1:]
    w0c = _mat_vec(mprime[0], cr[_HALF])
    T_vec = _mat_vec(_mat_inv(p_mat),
                     [(e[k] + w0c[k]) % P for k in range(_T)])
    return F, T_vec, gammas, E, p_mat, sparse, m


_CACHE = None


def opt_tables():
    global _CACHE
    if _CACHE is None:
        _CACHE = _derive()
    return _CACHE


def goiden3_layout():
    """The flat (C, S, M, P) arrays in go-iden3-crypto's storage layout
    (C: t*R_F + R_P scalars; S: (2t-1)*R_P scalars), for anyone diffing
    these tables against an external plonky2x/go-iden3 table dump."""
    F, T_vec, gammas, E, p_mat, sparse, m = opt_tables()
    C = []
    for f in F:
        C.extend(f)
    C.extend(T_vec)
    C.extend(gammas)
    for e in E:
        C.extend(e)
    S = []
    for row0, col0 in sparse:
        S.extend(row0)
        S.extend(col0)
    return C, S, m, p_mat


def permute_opt(state):
    """go-iden3-structured evaluation of the optimized schedule; must be
    bit-identical to refimpl.poseidon_bn254.permute."""
    assert len(state) == _T
    F, T_vec, gammas, E, p_mat, sparse, m = opt_tables()
    s = [x % P for x in state]
    # entry full rounds
    for r in range(_HALF):
        s = [(s[j] + F[r][j]) % P for j in range(_T)]
        s = [pow(x, 5, P) for x in s]
        if r < _HALF - 1:
            s = _mat_vec(m, s)
    s = [(s[j] + T_vec[j]) % P for j in range(_T)]
    s = _mat_vec(p_mat, s)
    # partial rounds: lane-0 sbox, scalar add, sparse mix
    for i in range(PARTIAL_ROUNDS):
        row0, col0 = sparse[i]
        s0 = (pow(s[0], 5, P) + gammas[i]) % P
        new0 = (row0[0] * s0 + sum(row0[j] * s[j]
                                   for j in range(1, _T))) % P
        s = [new0] + [(s[k] + col0[k - 1] * s0) % P for k in range(1, _T)]
    # exit full rounds
    for j in range(_HALF - 1):
        s = [pow(x, 5, P) for x in s]
        s = [(s[k] + E[j][k]) % P for k in range(_T)]
        s = _mat_vec(m, s)
    s = [pow(x, 5, P) for x in s]
    return _mat_vec(m, s)
