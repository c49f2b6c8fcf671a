"""Tests for the code/data layer: GF arithmetic, file codecs, RS-LDPC
construction, and the index codebook — verified against the reference's
observable artifacts (the shipped 584 KB pchk and golden codeword files)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from dna_ldpc_tpu.models.codebook import N_STRANDS, codebook_rank, index_codebook
from dna_ldpc_tpu.models.ldpc_graph import LdpcGraph
from dna_ldpc_tpu.models.rs_ldpc import build_rs_ldpc, dna_storage_pchk
from dna_ldpc_tpu.utils import dna
from dna_ldpc_tpu.utils.gf import get_field
from dna_ldpc_tpu.utils.io_formats import (
    SparseBinaryMatrix,
    read_alist,
    read_pchk,
    read_vector,
    write_alist,
    write_pchk,
    write_vector,
)

from conftest import REFERENCE, requires_reference

PCHK_PATH = os.path.join(REFERENCE, "ex_decoder", "decode_n18432_m2048_final.pchk")


# ---------------------------------------------------------------------------
# GF arithmetic
# ---------------------------------------------------------------------------


def test_gf16_tables():
    f = get_field(4)
    # alpha^4 = alpha + 1 for x^4 + x + 1
    assert f.exp_table[4] == 0b0011
    assert f.mul(2, 9) == 1  # alpha * alpha^14 = alpha^15 = 1
    a = np.arange(1, 16)
    assert np.all(f.mul(a, f.inv(a)) == 1)
    # field closure of multiplication: every product row is a permutation
    prod = f.mul(a[:, None], a[None, :])
    for row in prod:
        assert sorted(row.tolist()) == list(range(1, 16))


def test_gf256_matches_reference_poly():
    f = get_field(8)
    # primitive poly 1+x^2+x^3+x^4+x^8: alpha^8 = 0b00011101
    assert f.exp_table[8] == 0b00011101
    assert len(np.unique(f.exp_table[:255])) == 255


# ---------------------------------------------------------------------------
# pchk / alist codecs
# ---------------------------------------------------------------------------


@requires_reference
def test_read_shipped_pchk_structure():
    H = read_pchk(PCHK_PATH)
    assert (H.n_rows, H.n_cols) == (2048, 18432)
    assert H.nnz == 147456
    assert np.all(H.row_weights() == 72)
    assert np.all(H.col_weights() == 8)


@requires_reference
def test_pchk_roundtrip_byte_identical(tmp_path):
    H = read_pchk(PCHK_PATH)
    out = tmp_path / "roundtrip.pchk"
    write_pchk(str(out), H)
    assert out.read_bytes() == open(PCHK_PATH, "rb").read()


def test_alist_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    dense = (rng.random((20, 35)) < 0.2).astype(np.uint8)
    H = SparseBinaryMatrix.from_coo(20, 35, *np.nonzero(dense))
    p = tmp_path / "m.alist"
    write_alist(str(p), H)
    H2 = read_alist(str(p))
    assert H2 == H


def test_sparse_mulvec():
    rng = np.random.default_rng(1)
    dense = (rng.random((16, 40)) < 0.25).astype(np.uint8)
    H = SparseBinaryMatrix.from_coo(16, 40, *np.nonzero(dense))
    x = rng.integers(0, 2, size=(3, 40))
    expect = (dense @ x.T).T % 2
    assert np.array_equal(H.mulvec(x), expect.astype(np.uint8))


@requires_reference
def test_vector_file_roundtrip(tmp_path):
    cw = read_vector(os.path.join(REFERENCE, "ex_decoder", "codeword_n18432_m1860_1.txt"))
    assert cw.shape == (18432,)
    assert set(np.unique(cw)) <= {0, 1}
    p = tmp_path / "cw.txt"
    write_vector(str(p), cw)
    assert p.read_text() == open(
        os.path.join(REFERENCE, "ex_decoder", "codeword_n18432_m1860_1.txt")
    ).read()


# ---------------------------------------------------------------------------
# RS-LDPC construction vs the shipped matrix
# ---------------------------------------------------------------------------


def test_small_rs_ldpc_regular():
    H = build_rs_ldpc(4, 8, 3)  # q=16: 48 x 128
    assert (H.n_rows, H.n_cols) == (48, 128)
    assert np.all(H.row_weights() == 8)
    assert np.all(H.col_weights() == 3)
    # girth >= 6: no two rows share more than one column
    d = H.to_dense().astype(np.int32)
    overlap = d @ d.T
    np.fill_diagonal(overlap, 0)
    assert overlap.max() <= 1


@requires_reference
def test_construction_matches_shipped_pchk():
    ours = dna_storage_pchk()
    shipped = read_pchk(PCHK_PATH)
    assert ours == shipped


# ---------------------------------------------------------------------------
# codebook vs executing the reference enumeration
# ---------------------------------------------------------------------------


def test_codebook_basic():
    cb = index_codebook()
    assert len(cb) == N_STRANDS
    assert len(np.unique(cb)) == N_STRANDS
    assert cb.min() >= 0 and cb.max() < 1 << 16
    rank = codebook_rank()
    assert rank[cb[0]] == 0 and rank[cb[-1]] == N_STRANDS - 1


@requires_reference
@pytest.mark.slow
def test_codebook_matches_reference(tmp_path):
    script = (
        "import sys; sys.path.insert(0, %r)\n"
        "import pre_processing\n"
        "import numpy as np\n"
        "np.save(%r, np.array(sorted(pre_processing.decimal_index)))\n"
    ) % (os.path.join(REFERENCE, "ex_decoder"), str(tmp_path / "ref.npy"))
    subprocess.run([sys.executable, "-c", script], check=True, cwd=str(tmp_path))
    ref = np.load(tmp_path / "ref.npy")
    assert np.array_equal(index_codebook(), ref)


# ---------------------------------------------------------------------------
# DNA mapping
# ---------------------------------------------------------------------------


def test_dna_bits_roundtrip():
    seq = dna.seq_to_bytes("ACGTTGCA")
    bits = dna.dna_to_bits(seq)
    assert bits.tolist() == [0, 0, 0, 1, 1, 0, 1, 1, 1, 1, 1, 0, 0, 1, 0, 0]
    back = dna.bits_to_dna(bits)
    assert bytes(back) == b"ACGTTGCA"
    # gap maps to symbol 2 on both bit positions
    assert dna.dna_to_bits(dna.seq_to_bytes("-")).tolist() == [2, 2]


def test_bits_int_roundtrip():
    vals = np.array([0, 1, 5, 18431, 65535])
    bits = dna.int_to_bits_msb(vals, 16)
    assert np.array_equal(dna.bits_to_int_msb(bits), vals)


@requires_reference
def test_final_dna_strands_decode_to_codebook():
    """Every oligo's 16-nt index prefix in final_DNA.txt must decode to a
    distinct codebook value — ties the DNA mapping, codebook, and dataset
    together (original files/final_DNA.txt, 18432 x 152 nt)."""
    path = os.path.join(REFERENCE, "original files", "final_DNA.txt")
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    assert len(lines) == 18432
    mat = dna.seqs_to_matrix(lines)
    assert mat.shape == (18432, 152)
    idx_bits = dna.dna_to_bits(mat[:, :16])
    vals = dna.bits_to_int_msb(idx_bits)
    # RS(8,4): info = first 4 GF(16) symbols = first 16 of 32 bits
    info = vals >> 16
    assert np.array_equal(np.sort(info), index_codebook())


# ---------------------------------------------------------------------------
# graph tables
# ---------------------------------------------------------------------------


def test_graph_tables_consistency():
    rng = np.random.default_rng(3)
    dense = (rng.random((24, 60)) < 0.15).astype(np.uint8)
    dense[:, dense.sum(0) == 0] = 1  # no empty columns
    H = SparseBinaryMatrix.from_coo(24, 60, *np.nonzero(dense))
    g = LdpcGraph.from_sparse(H)
    assert g.n_edges == H.nnz
    # every real check slot's variable matches H
    for c in range(24):
        vars_c = g.check_vars[c][g.check_mask[c]]
        assert np.array_equal(np.sort(vars_c), H.row(c))
    # edge_perm is a bijection between real edge slots
    real = g.edge_perm[g.edge_perm < g.n_vars * g.dv_max]
    assert len(np.unique(real)) == g.n_edges


def test_flagship_graph_structure():
    H = build_rs_ldpc(4, 8, 3)
    g = LdpcGraph.from_sparse(H)
    assert g.regular and g.dc_max == 8 and g.dv_max == 3
    # blocked structure: check edge slot k lives in column block k
    assert np.all(g.check_vars // 16 == np.arange(8)[None, :])
