#!/usr/bin/env python
"""Headline benchmark: decoded LDPC codewords/s/chip on the deployed
n=18432 DNA-storage code, plus the end-to-end trial (cold AND warm).

Reference baseline: ~0.21 codewords/s end-to-end on CPU (272 codewords per
~1300 s trial, ``ex_decoder/o_72000_7_*_result.txt``; BASELINE.md).

Prints exactly one JSON line. Keys:
  value / vs_baseline            early-stop decoder throughput (the
                                 headline; trial-like channel converges in
                                 a handful of iterations)
  fixed50_codewords_per_s        compute-bound figure: 50 forced BP
                                 iterations, no early stop
  fixed50_mfu_pct                fraction of v5e f32 peak the fixed-50 run
                                 sustains, under a 10*nnz flops/iteration
                                 model (2 exclusive-product passes + the
                                 syndrome; BP is permute-bound, so this is
                                 honestly small)
  end_to_end_trial_seconds       full simulated trial, COLD process
                                 (includes compile/cache misses)
  end_to_end_trial_warm_seconds  second trial in the same process — the
                                 steady-state per-trial cost
"""

import json
import time

import numpy as np

BASELINE_CW_PER_S = 0.21
V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = 98.5e12 / 2  # bf16 peak 197 TFLOP/s; f32 ~ quarter of that


def main():
    from dna_ldpc_tpu.pipeline.decode import deployed_graph

    graph = deployed_graph()  # blocked (MXU-routing) fast path attached

    # Realistic trial-like channel: per-strand coverage ~Poisson(3.7),
    # per-read bit error 2%, LLR = (votes) * log((1-eps)/eps) — the
    # distribution the soft-information chain produces (SURVEY.md §2.1).
    B = 512
    rng = np.random.default_rng(7)
    mag = np.log(0.98 / 0.02)
    cov = rng.poisson(3.7, (B, 18432))
    errs = rng.binomial(cov, 0.02)
    llr_np = ((cov - 2 * errs) * mag).astype(np.float32)

    import jax
    import jax.numpy as jnp

    from dna_ldpc_tpu.ops.bp_pallas import bp_decode_blocked_pallas

    llr = jax.device_put(jnp.asarray(llr_np))

    def decode(x, max_iter, early_stop):
        # Fused Pallas kernel under the reference decoder's real
        # semantics: flooding sum-product, syndrome early stop per
        # codeword (def_func.py:49; dec.cpp:583-605). FER/bit parity vs
        # the exact XLA decoder is test-enforced
        # (tests/test_trace_pallas.py).
        r = bp_decode_blocked_pallas(
            graph.blocked, x, max_iter=max_iter, early_stop=early_stop
        )
        # np.asarray on the tiny per-codeword outputs forces a real
        # device sync (block_until_ready alone can under-report through
        # the remote-TPU tunnel)
        return np.asarray(r.unsat)

    unsat = decode(llr, 200, True)  # compile + warm up
    assert (unsat == 0).all(), "bench workload must fully converge"

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        decode(llr, 200, True)
        times.append(time.perf_counter() - t0)
    value = B / min(times)

    # honest compute-bound figure: 50 forced iterations, no early stop
    decode(llr, 50, False)  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        decode(llr, 50, False)
        times.append(time.perf_counter() - t0)
    fixed50 = B / min(times)
    # ALGORITHMIC flops model: per iteration per codeword ~10*nnz f32 ops
    # (check pass fwd/bwd exclusive products ~4*nnz, variable pass
    # ~4*nnz, syndrome ~2*nnz); routing itself is data movement under
    # this model, so the one-hot-routing design is ~1% by construction
    nnz = graph.n_edges
    flops_per_s = fixed50 * 50 * 10 * nnz
    mfu = 100.0 * flops_per_s / V5E_F32_PEAK
    # ACHIEVED-ARITHMETIC model: what the kernel actually executes on the
    # MXU — 2 routing matmul phases x G x J of [B, q] @ [q, q] per
    # iteration (bp_pallas.py route_to_*). This is the number that says
    # whether the kernel is near its hardware roof.
    blk = graph.blocked
    mxu_flops_per_s = fixed50 * 50 * 2 * blk.G * blk.J * blk.q * blk.q * 2
    mxu_util = 100.0 * mxu_flops_per_s / V5E_BF16_PEAK

    out = {
        "metric": f"decoded codewords/s/chip (n=18432, fused pallas BP, reference semantics: sum-product, max 200 iters, syndrome early stop; trial-like channel, batch {B})",
        "value": round(value, 1),
        "unit": "codewords/s",
        "vs_baseline": round(value / BASELINE_CW_PER_S, 1),
        "fixed50_codewords_per_s": round(fixed50, 1),
        "fixed50_mfu_pct": round(mfu, 2),
        "fixed50_mxu_tflops": round(mxu_flops_per_s / 1e12, 1),
        "fixed50_mxu_util_pct": round(mxu_util, 1),
    }
    out.update(end_to_end_trial())
    print(json.dumps(out))


TRIAL_SCRIPT = r"""
import json, time, sys
import numpy as np
from dna_ldpc_tpu.cli import _load_codewords
from dna_ldpc_tpu.pipeline.decode import TrialConfig, decode_trial
from dna_ldpc_tpu.pipeline.simulate import load_oligos, simulate_trial
oligos = load_oligos("/root/reference/original files/final_DNA.txt")
codewords = _load_codewords("/root/reference/ex_decoder")
results = []
budget = 420.0  # self-bound: never risk the driver's bench timeout
t0 = time.time()
for t in range(10):
    reads, quals = simulate_trial(oligos, trial=t)  # calibrated to the
    # shipped per-trial read counts + quality distributions
    r = decode_trial(reads, quals, codewords, TrialConfig())
    results.append({"ok": bool(r.success), "seconds": round(r.total_time, 2),
                    "anneal": int(r.n_anneal_iters),
                    "phase": {k: round(v, 2) for k, v in r.phase_times.items()}})
    print("TRIAL_DONE " + json.dumps(results[-1]), flush=True)
    if time.time() - t0 > budget and len(results) >= 2:
        break
warm = sorted(r["seconds"] for r in results[1:])

# stressed-channel point: reduced coverage puts the code at its erasure
# threshold so the second decoding (epsilon-anneal loop) demonstrably
# fires and recovers, mirroring the golden recovered-failure trials
# (o_72000_7_{1,5,8}: 1, 8, 8 anneal rounds)
from dna_ldpc_tpu.pipeline.simulate import ChannelModel, simulate_reads
stress = {}
dc = {}
if time.time() - t0 < budget:
    sreads, squals = simulate_reads(oligos, 65500, ChannelModel(), seed=123)
    rs = decode_trial(sreads, squals, codewords, TrialConfig())
    stress = {"ok": bool(rs.success), "fail_first": len(rs.fail_first),
              "anneal_iters": int(rs.n_anneal_iters),
              "seconds": round(rs.total_time, 2)}
# double-coverage point (~2x the reference read depth, the --rs knob's
# purpose): bounds the coverage-scaling of the MSA stage
if time.time() - t0 < budget:
    dreads, dquals = simulate_reads(oligos, 140000, ChannelModel(), seed=5)
    rd = decode_trial(dreads, dquals, codewords, TrialConfig())
    dc = {"ok": bool(rd.success), "seconds": round(rd.total_time, 2)}

print("TRIAL_JSON " + json.dumps({
    "trials_decoded": sum(1 for r in results if r["ok"]),
    "trials_total": len(results),
    "seconds": results[0]["seconds"],
    "warm_seconds": warm[len(warm) // 2],
    "phase": results[0]["phase"],
    "warm_phase": results[1]["phase"],
    "anneal_iters": [r["anneal"] for r in results],
    "anneal_stress": stress,
    "double_coverage": dc,
}))
"""


def end_to_end_trial():
    """TEN full simulated trials (RS filter + edit prefilter + MSA + LLR +
    272-codeword BP + anneal) in ONE subprocess, calibrated to the shipped
    per-trial read counts and quality-char distributions: trial 0 is the
    cold figure (compiles included), the warm figure is the median of the
    rest, and trials_decoded mirrors the reference's 10/10 golden outcome
    (o_72000_7_*_result.txt). Reference end-to-end: ~1300 s/trial, ~0.21
    codewords/s (BASELINE.md)."""
    import os
    import subprocess
    import sys

    if not os.path.isdir("/root/reference/ex_decoder"):
        return {}
    try:
        proc = subprocess.run(
            [sys.executable, "-c", TRIAL_SCRIPT],
            capture_output=True, text=True, timeout=1500,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in proc.stdout.splitlines():
            if line.startswith("TRIAL_JSON "):
                data = json.loads(line[len("TRIAL_JSON "):])
                secs = data["seconds"]
                warm = data["warm_seconds"]
                return {
                    "end_to_end_trial_seconds": secs,
                    "end_to_end_trial_warm_seconds": warm,
                    "end_to_end_trials_decoded": f"{data['trials_decoded']}/{data['trials_total']}",
                    "end_to_end_trial_ok": data["trials_decoded"] == data["trials_total"],
                    "end_to_end_anneal_iters": data["anneal_iters"],
                    "end_to_end_codewords_per_s": round(272.0 / secs, 2),
                    "end_to_end_warm_codewords_per_s": round(272.0 / warm, 2),
                    "end_to_end_vs_baseline": round((272.0 / secs) / BASELINE_CW_PER_S, 1),
                    "end_to_end_warm_vs_baseline": round((272.0 / warm) / BASELINE_CW_PER_S, 1),
                    "end_to_end_phase_times": data["phase"],
                    "end_to_end_warm_phase_times": data["warm_phase"],
                    "end_to_end_anneal_stress": data.get("anneal_stress", {}),
                    "end_to_end_double_coverage": data.get("double_coverage", {}),
                }
        return {"end_to_end_trial_seconds": None,
                "end_to_end_error": (proc.stdout + proc.stderr)[-400:]}
    except subprocess.TimeoutExpired:
        return {"end_to_end_trial_seconds": None,
                "end_to_end_error": "timeout (remote device stall)"}


if __name__ == "__main__":
    main()
