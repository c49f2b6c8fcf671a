"""Monte-Carlo FER/BER simulation harness.

The batched equivalent of the reference's frame-loop simulator
(``LDPC_dec/ldpc/DNA_main.cpp``: ``Run_Simulation`` :800-930, error
accounting and the ``result_(...).txt`` report of ``Print_All_Result``
:965-1165): instead of one frame per process iteration, frames are decoded
in large device batches per channel point, with early termination once the
target frame-error count is reached — the TPU-native version of the
commented-out MPI frame partitioning (``Set_FrameNum``, :629-651).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import numpy as np

from ..models.ldpc_graph import LdpcGraph
from ..models.mod2 import random_codewords
from ..utils.io_formats import SparseBinaryMatrix
from . import channels
from .bp import bp_decode
from .decoders import bec_peel, gallager_decode, min_sum_decode


@dataclass
class PointResult:
    param: float              # EbNo dB / crossover p / erasure p
    frames: int
    frame_errors: int
    bit_errors: int
    undetected_errors: int    # decoder claimed success but bits differ
    mean_iters: float
    seconds: float

    @property
    def fer(self) -> float:
        return self.frame_errors / max(self.frames, 1)

    @property
    def ber(self) -> float:
        return self.bit_errors / max(self.frames, 1)


@dataclass
class SimConfig:
    decoder: str = "bp"           # bp | min_sum | gallager_a | gallager_b | bec
    channel: str = "awgn"         # awgn | bsc | bec
    max_iter: int = 50
    batch: int = 128
    target_frame_errors: int = 50
    max_frames: int = 20000
    seed: int = 7                 # reference default seed (def_func.py:49)
    min_sum_offset: float = 0.0
    min_sum_normalize: float = 1.0


def _decode(config: SimConfig, graph, llr_or_vals):
    if config.decoder == "bp":
        return bp_decode(graph, llr_or_vals, max_iter=config.max_iter)
    if config.decoder == "min_sum":
        return min_sum_decode(
            graph, llr_or_vals, max_iter=config.max_iter,
            offset=config.min_sum_offset, normalize=config.min_sum_normalize,
        )
    if config.decoder == "gallager_a":
        return gallager_decode(graph, llr_or_vals, max_iter=config.max_iter, variant=0)
    if config.decoder == "gallager_b":
        return gallager_decode(graph, llr_or_vals, max_iter=config.max_iter, variant=1)
    if config.decoder == "bec":
        return bec_peel(graph, llr_or_vals, max_iter=config.max_iter)
    raise ValueError(f"unknown decoder {config.decoder}")


def simulate_point(
    H: SparseBinaryMatrix,
    graph: LdpcGraph,
    codewords: np.ndarray,
    param: float,
    config: SimConfig,
    rate: float,
) -> PointResult:
    """Simulate one channel point until target_frame_errors or max_frames."""
    key = jax.random.PRNGKey(config.seed)
    t0 = time.time()
    frames = fe = be = ue = 0
    iters_sum = 0
    while fe < config.target_frame_errors and frames < config.max_frames:
        key, sub = jax.random.split(key)
        idx = np.arange(frames, frames + config.batch) % len(codewords)
        cws = codewords[idx]
        if config.channel == "awgn":
            sigma = channels.ebno_to_sigma(param, rate)
            rx = channels.awgn_llr(sub, cws, sigma)
        elif config.channel == "bsc":
            if config.decoder.startswith("gallager"):
                flips = jax.random.bernoulli(sub, param, cws.shape)
                rx = np.logical_xor(cws.astype(bool), np.asarray(flips)).astype(np.uint8)
            else:
                rx = channels.bsc_llr(sub, cws, param)
        elif config.channel == "bec":
            rx = channels.bec_values(sub, cws, param)
        else:
            raise ValueError(config.channel)
        res = _decode(config, graph, rx)
        bits = np.asarray(res.bits)
        ok = np.asarray(res.success)
        errs = (bits != cws).sum(axis=1)
        frames += config.batch
        fe += int((errs > 0).sum())
        be += int(errs.sum())
        ue += int(((errs > 0) & ok).sum())
        iters_sum += int(np.asarray(res.iterations).sum())
    return PointResult(
        param=param,
        frames=frames,
        frame_errors=fe,
        bit_errors=be,
        undetected_errors=ue,
        mean_iters=iters_sum / max(frames, 1),
        seconds=time.time() - t0,
    )


def run_simulation(
    H: SparseBinaryMatrix,
    params: list[float],
    config: SimConfig = SimConfig(),
    n_codewords: int = 64,
) -> list[PointResult]:
    graph = LdpcGraph.from_sparse(H)
    rate = (H.n_cols - H.n_rows) / H.n_cols
    rng = np.random.default_rng(config.seed)
    cws = random_codewords(H.to_dense(), n_codewords, rng)
    return [simulate_point(H, graph, cws, p, config, rate) for p in params]


def format_report(H: SparseBinaryMatrix, config: SimConfig, results: list[PointResult]) -> str:
    """Result table in the spirit of Print_All_Result (DNA_main.cpp:
    1040-1126): code parameters then per-point FER/BER rows."""
    N, M = H.n_cols, H.n_rows
    K = N - M
    lines = [
        "=" * 72,
        f"  N = {N}   K = {K}   M = {M}   rate = {K / N:.4f}",
        f"  decoder = {config.decoder}   channel = {config.channel}"
        f"   max_iter = {config.max_iter}   seed = {config.seed}",
        "=" * 72,
        f"{'param':>8} {'frames':>8} {'FER':>12} {'BER':>12} "
        f"{'undet':>6} {'iters':>7} {'sec':>8}",
    ]
    for r in results:
        lines.append(
            f"{r.param:>8.3f} {r.frames:>8d} {r.fer:>12.4e} "
            f"{r.ber / max(H.n_cols, 1):>12.4e} {r.undetected_errors:>6d} "
            f"{r.mean_iters:>7.2f} {r.seconds:>8.2f}"
        )
    return "\n".join(lines) + "\n"
