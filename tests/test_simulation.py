"""Simulation harness smoke tests on a small code."""

import numpy as np

from dna_ldpc_tpu.models.rs_ldpc import build_rs_ldpc
from dna_ldpc_tpu.ops.simulation import SimConfig, format_report, run_simulation


def test_awgn_bp_waterfall():
    H = build_rs_ldpc(4, 8, 4)
    cfg = SimConfig(decoder="bp", channel="awgn", max_iter=30, batch=64,
                    target_frame_errors=20, max_frames=512)
    results = run_simulation(H, [2.0, 7.0], cfg)
    assert results[0].frames > 0
    # FER must improve by orders at high SNR
    assert results[1].fer < results[0].fer
    report = format_report(H, cfg, results)
    assert "rate" in report and "FER" in report


def test_bec_peeling_point():
    H = build_rs_ldpc(4, 8, 4)
    cfg = SimConfig(decoder="bec", channel="bec", max_iter=50, batch=64,
                    target_frame_errors=10, max_frames=256)
    (r,) = run_simulation(H, [0.05], cfg)
    assert r.fer < 0.5
    assert r.undetected_errors == 0
