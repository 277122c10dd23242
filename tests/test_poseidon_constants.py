"""Validation of the Poseidon-Goldilocks constant tables.

The reference imports these from the plonky2 crate
(verifier/src/hash/poseidon/permutation.rs:4-7); we vendor them and pin them
with plonky2's own known-answer vectors plus an algebraic cross-check.
"""

from halo2_plonky2_verifier_tpu.constants import poseidon_goldilocks as pg
from halo2_plonky2_verifier_tpu.refimpl import poseidon


def test_table_shape_and_range():
    assert len(pg.ALL_ROUND_CONSTANTS) == 360
    assert all(0 <= c < pg.GOLDILOCKS_PRIME for c in pg.ALL_ROUND_CONSTANTS)
    assert len(pg.MDS_MATRIX_CIRC) == 12 and len(pg.MDS_MATRIX_DIAG) == 12


def test_zero_state_kat():
    inp, expected = pg.KAT_VECTORS[0]
    out = poseidon.permute(inp)
    assert out == expected


def test_range_input_kat():
    out = poseidon.permute(list(range(12)))
    assert out[0] == pg.KAT_RANGE_FIRST_OUT


def test_fast_partial_round_derivation_matches_plonky2():
    first, partial = pg.derive_fast_partial_round_constants()
    n = len(pg.FAST_PARTIAL_FIRST_ROUND_CONSTANT_PREFIX)
    assert first[:n] == pg.FAST_PARTIAL_FIRST_ROUND_CONSTANT_PREFIX
    m = len(pg.FAST_PARTIAL_ROUND_CONSTANTS_PREFIX)
    assert partial[:m] == pg.FAST_PARTIAL_ROUND_CONSTANTS_PREFIX
    assert partial[-1] == 0


def test_mds_is_invertible():
    # A singular "MDS" would break the fast-partial derivation and FRI folding.
    m = pg.mds_matrix()
    inv = pg._mat_inv_mod_p(m)
    p = pg.GOLDILOCKS_PRIME
    ident = [
        [sum(m[r][k] * inv[k][c] for k in range(12)) % p for c in range(12)]
        for r in range(12)
    ]
    assert ident == [[1 if r == c else 0 for c in range(12)] for r in range(12)]
