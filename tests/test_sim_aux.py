"""Simulation aux subsystems: error-case save/replay (the MKL RNG stream
analog), position-BER tracking, puncturing/shortening fault injection."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from dna_ldpc_tpu.models import LdpcGraph, build_rs_ldpc
from dna_ldpc_tpu.models.mod2 import random_codewords
from dna_ldpc_tpu.ops.simulation import (
    SimConfig,
    format_position_ber,
    load_error_cases,
    replay_error_case,
    save_error_cases,
    simulate_point,
)


@pytest.fixture(scope="module")
def setup():
    H = build_rs_ldpc(3, 6, 3)
    graph = LdpcGraph.from_sparse(H)
    rng = np.random.default_rng(0)
    cws = random_codewords(H.to_dense(), 16, rng)
    return H, graph, cws


def test_error_case_replay_reproduces_failure(setup, tmp_path):
    H, graph, cws = setup
    config = SimConfig(
        decoder="bp", channel="awgn", max_iter=10, batch=32,
        target_frame_errors=4, max_frames=512, save_error_cases=4,
    )
    rate = (H.n_cols - H.n_rows) / H.n_cols
    # noisy enough to fail often
    res = simulate_point(H, graph, cws, 0.5, config, rate)
    assert res.frame_errors > 0 and res.error_cases

    path = tmp_path / "cases.err.json"
    save_error_cases(str(path), [res])
    cases = load_error_cases(str(path))
    assert len(cases) == len(res.error_cases)

    r, cw, rx = replay_error_case(H, graph, cws, cases[0], config)
    errs = int((np.asarray(r.bits)[0] != cw).sum())
    assert errs > 0, "replayed case must still fail identically"
    # replay is deterministic
    r2, _, rx2 = replay_error_case(H, graph, cws, cases[0], config)
    assert np.array_equal(np.asarray(rx), np.asarray(rx2))
    assert np.array_equal(np.asarray(r.bits), np.asarray(r2.bits))


def test_position_ber_tracking(setup):
    H, graph, cws = setup
    config = SimConfig(
        decoder="bp", channel="awgn", max_iter=5, batch=16,
        target_frame_errors=2, max_frames=64, track_position_ber=True,
    )
    rate = (H.n_cols - H.n_rows) / H.n_cols
    res = simulate_point(H, graph, cws, 0.0, config, rate)
    assert res.position_bit_errors is not None
    assert res.position_bit_errors.shape == (H.n_cols,)
    assert res.position_bit_errors.sum() == res.bit_errors
    dump = format_position_ber(res, block=8)
    assert str(int(res.position_bit_errors[:8].sum())) in dump


def test_puncture_and_shorten(setup):
    H, graph, cws = setup
    from dna_ldpc_tpu.ops import channels
    import jax.numpy as jnp

    llr = jnp.ones((2, H.n_cols))
    p = channels.puncture(llr, [0, 5])
    assert float(p[0, 0]) == 0.0 and float(p[0, 5]) == 0.0
    s = channels.shorten(llr, [1])
    assert float(s[0, 1]) == channels.SHORTEN_LLR

    config = SimConfig(
        decoder="bp", channel="awgn", max_iter=20, batch=16,
        target_frame_errors=2, max_frames=32,
        shorten_positions=tuple(range(8)),
    )
    rate = (H.n_cols - H.n_rows) / H.n_cols
    # shortening positions are only valid if those bits are 0 in the
    # transmitted codewords; zero codewords satisfy that trivially
    zeros = np.zeros_like(cws)
    res = simulate_point(H, graph, zeros, 2.0, config, rate)
    assert res.frames > 0


def test_extra_decoders_run(setup):
    H, graph, cws = setup
    rate = (H.n_cols - H.n_rows) / H.n_cols
    for decoder, channel in (("quantized_min_sum", "awgn"), ("faid", "bsc")):
        config = SimConfig(
            decoder=decoder, channel=channel, max_iter=10, batch=8,
            target_frame_errors=1, max_frames=16,
        )
        res = simulate_point(H, graph, cws, 3.0 if channel == "awgn" else 0.01, config, rate)
        assert res.frames > 0
