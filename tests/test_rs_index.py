"""RS(8,4)/GF(16) index code tests: encoder/decoder roundtrips, exact
bounded-distance behavior, and consistency with the shipped dataset (every
final_DNA.txt oligo's 32-bit index must be a valid codeword)."""

import os

import numpy as np

from dna_ldpc_tpu.models.rs_index import (
    decode_index_bits,
    rs_decode,
    rs_encode,
)
from dna_ldpc_tpu.utils import dna

from conftest import REFERENCE, requires_reference


def _random_messages(rng, n):
    return rng.integers(0, 16, size=(n, 4), dtype=np.int64)


def test_encode_systematic_and_valid():
    rng = np.random.default_rng(0)
    msgs = _random_messages(rng, 500)
    cw = rs_encode(msgs)
    assert cw.shape == (500, 8)
    assert np.array_equal(cw[:, :4], msgs)
    dec, cnumerr = rs_decode(cw)
    assert np.all(cnumerr == 0)
    assert np.array_equal(dec, msgs)


def test_correct_up_to_two_errors():
    rng = np.random.default_rng(1)
    msgs = _random_messages(rng, 2000)
    cw = rs_encode(msgs)
    for n_err in (1, 2):
        rx = cw.copy()
        for b in range(len(rx)):
            pos = rng.choice(8, size=n_err, replace=False)
            for p in pos:
                rx[b, p] ^= rng.integers(1, 16)
        dec, cnumerr = rs_decode(rx)
        assert np.all(cnumerr == n_err), (n_err, np.unique(cnumerr))
        assert np.array_equal(dec, msgs)


def test_three_errors_bounded_distance():
    """With 3 errors the decoder must either fail (-1) or miscorrect to a
    codeword within distance 2 of the received word — exact BD semantics
    shared by any correct decoder including MATLAB's rsdec."""
    rng = np.random.default_rng(2)
    msgs = _random_messages(rng, 3000)
    cw = rs_encode(msgs)
    rx = cw.copy()
    for b in range(len(rx)):
        pos = rng.choice(8, size=3, replace=False)
        for p in pos:
            rx[b, p] ^= rng.integers(1, 16)
    dec, cnumerr, full = rs_decode(rx, return_full=True)
    assert np.all((cnumerr == -1) | (cnumerr >= 1))
    ok = cnumerr >= 0
    assert 0.05 < ok.mean() < 0.9  # both outcomes occur
    # miscorrections produce a full-space codeword within distance cnumerr
    # of the zero-padded received word (corrections may hit the padding)
    rx_full = np.concatenate([np.zeros((ok.sum(), 7), np.int64), rx[ok]], axis=1)
    dist_full = np.count_nonzero(full[ok] != rx_full, axis=1)
    assert np.all(dist_full == cnumerr[ok])
    # corrected full words have zero syndromes: their message+real-region
    # relationship holds only when no padding correction occurred
    from dna_ldpc_tpu.utils.gf import get_field

    f = get_field(4)
    degs = 14 - np.arange(15)
    for j in range(1, 5):
        alpha_j = np.full(15, f.exp_table[j])
        s = np.bitwise_xor.reduce(f.mul(full[ok], f.pow(alpha_j, degs)[None, :]), axis=1)
        assert not s.any()


def test_decode_index_bits_layout():
    rng = np.random.default_rng(3)
    msgs = _random_messages(rng, 64)
    cw = rs_encode(msgs)
    bits = ((cw[..., None] >> np.arange(3, -1, -1)) & 1).reshape(-1, 32)
    out_bits, cnumerr = decode_index_bits(bits)
    assert np.all(cnumerr == 0)
    expect = ((msgs[..., None] >> np.arange(3, -1, -1)) & 1).reshape(-1, 16)
    assert np.array_equal(out_bits, expect)
    # non-binary symbol (value 2 from a gap base) -> failure
    bits2 = bits.copy()
    bits2[0, 5] = 2
    _, cn2 = decode_index_bits(bits2)
    assert cn2[0] == -1 and np.all(cn2[1:] == 0)


@requires_reference
def test_shipped_oligo_indices_are_codewords():
    path = os.path.join(REFERENCE, "original files", "final_DNA.txt")
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    mat = dna.seqs_to_matrix(lines)
    bits = dna.dna_to_bits(mat[:, :16]).astype(np.int64)
    syms = bits.reshape(-1, 8, 4) @ (1 << np.arange(3, -1, -1, dtype=np.int64))
    dec, cnumerr = rs_decode(syms)
    assert np.all(cnumerr == 0)
    assert np.array_equal(rs_encode(dec), syms)
