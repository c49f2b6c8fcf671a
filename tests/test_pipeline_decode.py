"""Pipeline decode stage: batched first decoding + epsilon-annealing loop
(reference ex_decoder/decoder.py:553-664), tested on a tiny RS-LDPC code."""

import numpy as np

from dna_ldpc_tpu.models import LdpcGraph
from dna_ldpc_tpu.models.rs_ldpc import build_rs_ldpc
from dna_ldpc_tpu.pipeline.decode import TrialConfig, anneal_decode


def _tiny_graph():
    return LdpcGraph.from_sparse(build_rs_ldpc(4, 8, 4))  # 64 x 128


def test_anneal_decode_clean_inputs_succeed_first_pass():
    g = _tiny_graph()
    mag = np.log(0.98 / 0.02)
    soft = np.full((3, 128), mag, np.float32)  # all-zero codeword, clean
    cws = np.zeros((3, 128), np.uint8)
    dec, fail_first, fail, n_iters = anneal_decode(g, soft, cws, TrialConfig())
    assert fail_first == [] and fail == [] and n_iters == 0
    assert dec.shape == (3, 128) and (dec == 0).all()


def test_anneal_decode_failing_codeword_runs_annealing():
    """A codeword whose soft input is mostly erased fails BP outright; the
    annealing loop must rescale + re-decode it (regression: the decoded
    array is written in place per anneal round, decoder.py:655-658)."""
    g = _tiny_graph()
    mag = np.log(0.98 / 0.02)
    rng = np.random.default_rng(3)
    soft = np.full((2, 128), mag, np.float32)
    # codeword 2: erase most positions and flip a third of the rest hard
    soft[1] = 0.0
    keep = rng.permutation(128)[:40]
    soft[1, keep] = mag * np.where(rng.random(40) < 0.33, -3.0, 1.0)
    cws = np.zeros((2, 128), np.uint8)
    cfg = TrialConfig()
    dec, fail_first, fail, n_iters = anneal_decode(g, soft, cws, cfg)
    assert fail_first == [2]
    assert n_iters >= 1  # annealing loop actually ran (and wrote dec rows)
    assert dec.shape == (2, 128) and (dec[0] == 0).all()
    if fail:  # if annealing never rescued it, the loop must have hit the floor
        eps_after = cfg.epsil - (n_iters + 1) * cfg.anneal_step
        assert eps_after <= cfg.anneal_floor + 1e-9
