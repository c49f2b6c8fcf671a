"""Native ingest library tests: C++ counting and edit distance must be
bit-identical to the Python reference paths."""

import random

import numpy as np
import pytest

from dna_ldpc_tpu import native_lib
from dna_ldpc_tpu.ops.editdist import edit_distance_pairs
from dna_ldpc_tpu.pipeline.llr import FilteredReads, compute_trial_llrs
from dna_ldpc_tpu.utils.dna import seqs_to_matrix

pytestmark = pytest.mark.skipif(not native_lib.available(), reason="no g++ toolchain")


def _rand_read(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _identity_aligner(seqs):
    return [(i, (s + "-" * 136)[:136]) for i, s in enumerate(seqs)]


def test_native_counting_matches_python():
    rng = random.Random(1)
    payloads, quals, strands = [], [], []
    strand = 0
    for _ in range(200):
        k = rng.randint(1, 5)
        case = rng.random()
        for i in range(k):
            if case < 0.5:
                L = 136
            elif case < 0.75:
                L = 136 if i else rng.randint(40, 135)
            else:
                L = rng.choice([128, 136, 141])
            payloads.append(_rand_read(rng, L))
            quals.append(rng.choice([40, 52, 53, 63, 64, 70]))
            strands.append(strand)
        strand += rng.randint(1, 2)
    f = FilteredReads(
        payloads=payloads,
        quals=np.array(quals),
        strands=np.array(strands),
        n_input=len(payloads),
        n_rs_pass=len(payloads),
    )
    t_nat = compute_trial_llrs(f, 0.02, _identity_aligner, use_native=True)
    t_py = compute_trial_llrs(f, 0.02, _identity_aligner, use_native=False)
    assert np.array_equal(t_nat, t_py)


def test_native_edit_distance_matches_numpy():
    rng = random.Random(2)
    seqs = [_rand_read(rng, rng.randint(0, 40)) for _ in range(40)]
    mat = seqs_to_matrix(seqs, fill=b"\x00")
    lens = np.array([len(s) for s in seqs], dtype=np.int32)
    a, b = np.triu_indices(40, k=1)
    want = edit_distance_pairs(mat, lens.astype(np.int64), a, b)

    buf = np.frombuffer("".join(seqs).encode(), np.uint8).copy()
    offs = np.zeros(len(seqs), np.int64)
    offs[1:] = np.cumsum(lens[:-1], dtype=np.int64)
    got = native_lib.edit_distance_batch_native(buf, offs, lens, a, b)
    assert np.array_equal(got, want)


def test_native_align_matches_python_path():
    """align(use_native=True) and align(use_native=False) must produce
    identical rows: the C++ progressive-alignment+refine port
    (native/ingest.cpp msa_progressive_refine) claims bit-compatibility
    with ops/msa/align.py, and once the library builds every MSA test
    silently runs only the native path — this is the explicit parity
    check."""
    from dna_ldpc_tpu.ops.msa.align import align

    rng = random.Random(11)

    def mutate(s, subs, dels, inss):
        b = list(s)
        for _ in range(subs):
            b[rng.randrange(len(b))] = rng.choice("ACGT")
        for _ in range(dels):
            del b[rng.randrange(len(b))]
        for _ in range(inss):
            b.insert(rng.randrange(len(b)), rng.choice("ACGT"))
        return "".join(b)

    for n, L in ((3, 60), (4, 90), (5, 136)):
        base = "".join(rng.choice("ACGT") for _ in range(L))
        seqs = [base] + [
            mutate(base, rng.randint(0, 2), rng.randint(0, 2), rng.randint(0, 2))
            for _ in range(n - 1)
        ]
        nat = align(seqs, use_native=True)
        py = align(seqs, use_native=False)
        assert nat == py
