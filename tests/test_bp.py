"""BP decoder tests: hard-decision and iteration-count parity with a
float64 probability-ratio-domain oracle that mirrors the reference decoder
(``LDPC_dec/ldpc/dec.cpp:583-694``) exactly, plus semantics edge cases."""

import numpy as np
import pytest

from dna_ldpc_tpu.models.ldpc_graph import LdpcGraph
from dna_ldpc_tpu.models.rs_ldpc import build_rs_ldpc
from dna_ldpc_tpu.ops.bp import decode_llrs
from dna_ldpc_tpu.utils.io_formats import SparseBinaryMatrix

from oracle_bp import oracle_bp_decode


@pytest.fixture(scope="module")
def small_code():
    H = build_rs_ldpc(4, 8, 3)  # 48 x 128, (dv=3, dc=8)-regular
    return H, LdpcGraph.from_sparse(H)


def _channel(rng, n, flip_p, mag):
    x = (rng.random(n) < flip_p).astype(np.uint8)
    return np.where(x == 0, mag, -mag).astype(np.float64)


def test_matches_oracle_small_code(small_code):
    H, g = small_code
    rows = [H.row(i) for i in range(H.n_rows)]
    rng = np.random.default_rng(0)
    mag = np.log(0.98 / 0.02)
    agree_bits = 0
    for _ in range(30):
        llr = _channel(rng, 128, 0.05, mag) + rng.normal(0, 1.0, 128)
        ob, oi, ook = oracle_bp_decode(rows, 128, llr, max_iter=50)
        r = decode_llrs(g, llr.astype(np.float32), max_iter=50)
        assert np.array_equal(ob, np.asarray(r.bits)[0])
        assert ook == bool(r.success[0])
        agree_bits += 1
    assert agree_bits == 30


def test_matches_oracle_irregular_code():
    """Irregular degrees exercise the padded table paths."""
    rng = np.random.default_rng(5)
    dense = (rng.random((30, 80)) < 0.12).astype(np.uint8)
    dense[:, dense.sum(0) == 0] = 1
    dense[dense.sum(1) == 0, :] = 1
    H = SparseBinaryMatrix.from_coo(30, 80, *np.nonzero(dense))
    g = LdpcGraph.from_sparse(H)
    rows = [H.row(i) for i in range(30)]
    for t in range(10):
        llr = rng.normal(1.5, 1.5, 80)
        ob, oi, ook = oracle_bp_decode(rows, 80, llr, max_iter=30)
        r = decode_llrs(g, llr.astype(np.float32), max_iter=30)
        assert np.array_equal(ob, np.asarray(r.bits)[0]), f"trial {t}"
        assert ook == bool(r.success[0])


def test_zero_llr_instant_success(small_code):
    """All-erasure input: initial hard decision is all-zero (lratio<1 is
    False at LLR=0), which satisfies H -> success at iteration 0
    (dec.cpp:587-594 checks the syndrome before iterating)."""
    _, g = small_code
    r = decode_llrs(g, np.zeros(128, np.float32))
    assert bool(r.success[0]) and int(r.iterations[0]) == 0
    assert not np.asarray(r.bits).any()


def test_valid_codeword_zero_iterations(small_code):
    """A clean codeword's hard decision passes immediately."""
    H, g = small_code
    # find a nonzero codeword by Gaussian elimination over GF(2)
    dense = H.to_dense()
    from dna_ldpc_tpu.models.mod2 import nullspace_basis

    basis = nullspace_basis(dense)
    cw = basis[0]
    assert H.mulvec(cw).sum() == 0 and cw.any()
    mag = np.float32(np.log(0.98 / 0.02))
    llr = np.where(cw == 0, mag, -mag)
    r = decode_llrs(g, llr)
    assert bool(r.success[0]) and int(r.iterations[0]) == 0
    assert np.array_equal(np.asarray(r.bits)[0], cw)


def test_batch_independent_latching(small_code):
    H, g = small_code
    rng = np.random.default_rng(2)
    mag = np.log(0.98 / 0.02)
    llrs = np.stack(
        [np.zeros(128)]
        + [_channel(rng, 128, p, mag) + rng.normal(0, 0.5, 128) for p in (0.02, 0.3)]
    ).astype(np.float32)
    r = decode_llrs(g, llrs, max_iter=30)
    rows = [H.row(i) for i in range(H.n_rows)]
    for b in range(3):
        ob, oi, ook = oracle_bp_decode(rows, 128, llrs[b].astype(np.float64), max_iter=30)
        assert np.array_equal(ob, np.asarray(r.bits)[b])
        assert ook == bool(r.success[b])
        assert oi == int(r.iterations[b])


def test_early_stop_off_same_results(small_code):
    H, g = small_code
    rng = np.random.default_rng(3)
    mag = np.log(0.98 / 0.02)
    llr = (_channel(rng, 128, 0.04, mag) + rng.normal(0, 0.5, 128)).astype(np.float32)[None]
    r1 = decode_llrs(g, llr, max_iter=30)
    from dna_ldpc_tpu.ops.bp import bp_decode
    import jax.numpy as jnp

    r2 = bp_decode(g, jnp.asarray(llr), max_iter=30, early_stop=False)
    assert np.array_equal(np.asarray(r1.bits), np.asarray(r2.bits))
    assert int(r1.iterations[0]) == int(r2.iterations[0])
