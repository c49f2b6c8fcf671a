"""Tests for the min-sum / Gallager / BEC-peeling decoder family and the
simulation channels."""

import jax
import numpy as np
import pytest

from dna_ldpc_tpu.models.ldpc_graph import LdpcGraph
from dna_ldpc_tpu.models.mod2 import random_codewords
from dna_ldpc_tpu.models.rs_ldpc import build_rs_ldpc
from dna_ldpc_tpu.ops import channels
from dna_ldpc_tpu.ops.decoders import bec_peel, gallager_decode, min_sum_decode


@pytest.fixture(scope="module")
def code():
    H = build_rs_ldpc(4, 8, 4)  # 64 x 128, dv=4 dc=8
    dense = H.to_dense()
    rng = np.random.default_rng(0)
    cws = random_codewords(dense, 16, rng)
    return H, LdpcGraph.from_sparse(H), cws


def test_min_sum_corrects_awgn(code):
    H, g, cws = code
    key = jax.random.PRNGKey(0)
    sigma = channels.ebno_to_sigma(6.0, 0.5)
    llr = channels.awgn_llr(key, cws, sigma)
    r = min_sum_decode(g, llr, max_iter=50)
    ok = np.asarray(r.success)
    bits = np.asarray(r.bits)
    assert ok.mean() > 0.8
    assert np.array_equal(bits[ok], cws[ok])
    # every reported success really satisfies H
    assert not H.mulvec(bits[ok]).any()


def test_min_sum_offset_variant(code):
    _, g, cws = code
    key = jax.random.PRNGKey(1)
    llr = channels.awgn_llr(key, cws, channels.ebno_to_sigma(6.0, 0.5))
    r = min_sum_decode(g, llr, max_iter=50, offset=0.3)
    assert np.asarray(r.success).mean() > 0.7


def test_min_sum_clean_codeword_zero_iters(code):
    _, g, cws = code
    llr = (1.0 - 2.0 * cws[:4].astype(np.float32)) * 5.0
    r = min_sum_decode(g, llr)
    assert np.asarray(r.success).all()
    assert (np.asarray(r.iterations) == 0).all()


def test_gallager_corrects_few_errors(code):
    H, g, cws = code
    rng = np.random.default_rng(2)
    rx = cws.copy()
    # flip exactly 1 bit per codeword — within Gallager-B's reach
    for b in range(len(rx)):
        rx[b, rng.integers(0, 128)] ^= 1
    r = gallager_decode(g, rx, max_iter=30, variant=1)
    ok = np.asarray(r.success)
    assert ok.mean() > 0.5
    assert np.array_equal(np.asarray(r.bits)[ok], cws[ok])


def test_bec_peeling(code):
    H, g, cws = code
    key = jax.random.PRNGKey(3)
    vals = channels.bec_values(key, cws, 0.2)
    r = bec_peel(g, vals)
    ok = np.asarray(r.success)
    bits = np.asarray(r.bits)
    assert ok.mean() > 0.5
    assert np.array_equal(bits[ok], cws[ok])
    # erased-but-given bits must be reproduced wherever known
    known = np.asarray(vals) != channels.ERASE_MARK
    assert np.array_equal(bits[known], cws[known])


def test_channels_shapes_and_signs(code):
    _, _, cws = code
    key = jax.random.PRNGKey(4)
    llr = channels.awgn_llr(key, cws, 0.5)
    # low noise: signs should mostly encode the bits
    bits_hat = (np.asarray(llr) < 0).astype(np.uint8)
    assert (bits_hat == cws).mean() > 0.95
    llr2 = np.abs(np.asarray(channels.bsc_llr(key, cws, 0.05)))
    np.testing.assert_allclose(llr2, np.log(0.95 / 0.05), rtol=1e-6)


def test_quasi_uniform_quantizer():
    """Real quasi-uniform scheme: uniform inner levels, geometric outer
    thresholds, clipping at the precision limit; the reference's enum-22
    branch is an empty stub (Cal_MSA_Q type 1, dec.cpp:1737-1740) and its
    literal all-zero behavior is kept available."""
    import jax.numpy as jnp

    from dna_ldpc_tpu.ops.decoders import (
        quantize_llr,
        quantize_llr_quasi_uniform,
        quantize_llr_reference_stub,
    )

    x = jnp.asarray([0.0, 0.4, 0.6, 1.2, 3.0, 6.0, 12.0, 100.0, -6.0, -100.0])
    q = np.asarray(quantize_llr_quasi_uniform(x, precision=4, step=1.0))
    # precision 4 -> levels 0..7, uniform region 0..3 (step 1), outer
    # thresholds 2.5 * 2^(k-3): t4=5, t5=10, t6=20, t7=40
    np.testing.assert_array_equal(q, [0, 0, 1, 1, 3, 4, 5, 7, -4, -7])
    # inner region agrees with the uniform quantizer
    small = jnp.linspace(-3.4, 3.4, 35)
    np.testing.assert_array_equal(
        np.asarray(quantize_llr_quasi_uniform(small, 4, 1.0)),
        np.asarray(quantize_llr(small, 4, 1.0)),
    )
    assert not np.asarray(quantize_llr_reference_stub(x)).any()


def test_quantized_min_sum_quasi_uniform_decodes():
    import jax.numpy as jnp

    from dna_ldpc_tpu.ops.decoders import quantized_min_sum_decode

    H = build_rs_ldpc(4, 8, 4)
    graph = LdpcGraph.from_sparse(H)
    rng = np.random.default_rng(2)
    cw = random_codewords(H.to_dense(), 8, rng)
    llr = 4.0 * np.where(cw == 0, 1.0, -1.0) + rng.normal(0, 1.2, cw.shape)
    res = quantized_min_sum_decode(
        graph, jnp.asarray(llr, jnp.float32), precision=5, step=0.5,
        quantizer="quasi-uniform",
    )
    ok = np.asarray(res.success)
    assert ok.mean() > 0.7
    assert (np.asarray(res.bits)[ok] == cw[ok]).all()
