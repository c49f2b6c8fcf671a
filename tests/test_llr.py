"""Fuzz tests: vectorized LLR pipeline vs the literal oracle transcription
of decoder.py's cluster rules, across every branch (all-136, mixed+MSA,
erasure, single short/long read, bit-271 quality rules, gap votes)."""

import math
import random

import numpy as np
import pytest

from dna_ldpc_tpu.pipeline.llr import cluster_llr, rs_filter_reads
from dna_ldpc_tpu.models.codebook import index_codebook
from dna_ldpc_tpu.models.rs_index import rs_encode
from dna_ldpc_tpu.utils import dna

from oracle_llr import oracle_cluster_llr

EPS = 0.02


def fake_aligner_identity(seqs):
    """Pretend-MSA: pad/truncate to 136 with gaps, reverse output order to
    exercise ordinal mapping."""
    out = []
    for i, s in enumerate(seqs):
        row = (s + "-" * 136)[:136]
        out.append((i, row))
    return out[::-1]


def fake_aligner_misaligned(seqs):
    """Pretend-MSA that emits rows of length 137 (none == 136)."""
    return [(i, (s + "-" * 137)[:137]) for i, s in enumerate(seqs)]


def _rand_read(rng, length):
    return "".join(rng.choice("ACGT") for _ in range(length))


def _compare(reads, quals, aligner):
    got = cluster_llr(list(reads), list(quals), EPS, aligner)
    want = oracle_cluster_llr(list(reads), list(quals), EPS, aligner)
    if want is None or got is None:
        assert want is None and got is None
        return
    np.testing.assert_allclose(got, np.array(want), rtol=0, atol=1e-12)


def test_all_136_clusters():
    rng = random.Random(0)
    for _ in range(30):
        k = rng.randint(2, 6)
        base = _rand_read(rng, 136)
        reads = []
        for _ in range(k):
            r = list(base)
            for _ in range(rng.randint(0, 8)):
                r[rng.randrange(136)] = rng.choice("ACGT")
            reads.append("".join(r))
        quals = [rng.choice([40, 53, 60, 63, 70]) for _ in range(k)]
        _compare(reads, quals, None)


def test_single_reads():
    rng = random.Random(1)
    for length in (50, 135, 136, 140):
        for q in (40, 63, 64, 70):
            reads = [_rand_read(rng, length)]
            _compare(reads, [q], None)


def test_mixed_cluster_msa_path():
    rng = random.Random(2)
    for _ in range(20):
        k = rng.randint(2, 5)
        base = _rand_read(rng, 136)
        reads = []
        for j in range(k):
            r = list(base)
            # indels: delete a couple of bases from some reads
            for _ in range(rng.randint(0, 3)):
                del r[rng.randrange(len(r))]
            reads.append("".join(r))
        quals = [rng.choice([40, 53, 64, 70]) for _ in range(k)]
        _compare(reads, quals, fake_aligner_identity)


def test_mixed_cluster_no_136_rows():
    rng = random.Random(3)
    base = _rand_read(rng, 130)
    reads = [base, base[:-2], base[:-1] + "A"]
    for quals in ([70, 70, 70], [40, 64, 70], [40, 40, 40]):
        _compare(reads, quals, fake_aligner_misaligned)


def test_erasure_cluster():
    rng = random.Random(4)
    # two wildly different reads of different length -> edit distance >= 15
    reads = [_rand_read(rng, 136), _rand_read(rng, 100)]
    got = cluster_llr(reads, [70, 70], EPS, fake_aligner_identity)
    want = oracle_cluster_llr(reads, [70, 70], EPS, fake_aligner_identity)
    assert got is None and want is None


def test_gap_counts_as_one():
    # aligned rows containing '-' -> symbol 2 -> counted as a one vote
    reads = ["A" * 136, "A" * 130]  # close pair, mixed lengths
    quals = [70, 70]
    _compare(reads, quals, fake_aligner_identity)
    got = cluster_llr(reads, quals, EPS, fake_aligner_identity)
    mag = math.log((1 - EPS) / EPS)
    # bit 260 (base 130 hi bit): one 'A'(0) + one '-'(2 -> one) = 0
    assert got[260] == 0
    # bit 0: both 'A' -> two zero votes
    assert got[0] == 2 * mag


def test_rs_filter_roundtrip():
    """End-to-end read filtering: encode valid indices, corrupt some, check
    the kept set and cluster grouping."""
    rng = np.random.default_rng(5)
    cb = index_codebook()
    strands = np.array([0, 0, 1, 5, 5, 5, 17, 42])
    values = cb[strands]
    msgs = ((values[:, None] >> np.arange(12, -4, -4)) & 0xF).astype(np.int64)
    cws = rs_encode(msgs)
    bits = ((cws[..., None] >> np.arange(3, -1, -1)) & 1).reshape(-1, 32)
    idx_seqs = ["".join("ACGT"[(b[2 * i] << 1) | b[2 * i + 1]] for i in range(16)) for b in bits]
    payloads = ["".join(rng.choice(list("ACGT"), 136)) for _ in range(len(strands))]
    reads = [i + p for i, p in zip(idx_seqs, payloads)]
    # corrupt read 3's index beyond RS correction (4 symbol errors)
    r = list(reads[3])
    r[0:8] = "TTTTTTTT" if reads[3][0:8] != "TTTTTTTT" else "GGGGGGGG"
    reads[3] = "".join(r)
    quals = ["I"] * len(reads)
    f = rs_filter_reads(reads, quals)
    assert f.n_input == 8
    kept_strands = f.strands.tolist()
    # read 3 (strand 5) may be dropped or miscorrected; all others must survive
    for s in [0, 0, 1, 17, 42]:
        assert s in kept_strands
    assert np.all(np.diff(f.strands) >= 0)
    # payload carried through intact for a known-good read
    i0 = kept_strands.index(1)
    assert f.payloads[i0] == payloads[2]


@pytest.mark.parametrize("q271", [(52, 70), (53, 63), (53, 62), (70, 70)])
def test_bit271_two_vote_rule(q271):
    """Exactly one 0-vote + one 1-vote at bit 271 with differing qualities."""
    r0 = "A" * 136          # last base A -> bit 271 = 0
    r1 = "A" * 135 + "C"    # last base C -> bit 271 = 1
    _compare([r0, r1], list(q271), None)


def test_batched_msa_path_matches_per_cluster():
    """The cross-cluster batched MSA path must produce exactly the same
    LLR table as routing every cluster through cluster_llr + align()."""
    import random

    from dna_ldpc_tpu.ops.msa import msa_aligner
    from dna_ldpc_tpu.pipeline.llr import FilteredReads, compute_trial_llrs

    rng = random.Random(7)

    def mutate(s, dels):
        s = list(s)
        for _ in range(dels):
            del s[rng.randrange(len(s))]
        for _ in range(2):
            s[rng.randrange(len(s))] = rng.choice("ACGT")
        return "".join(s)

    payloads, quals, strands = [], [], []
    strand = 0
    for _ in range(25):
        k = rng.randint(1, 4)
        base = _rand_read(rng, 136)
        mixed = rng.random() < 0.6
        for i in range(k):
            r = base if (i == 0 or not mixed) else mutate(base, rng.randint(0, 2))
            payloads.append(r)
            quals.append(rng.choice([40, 53, 64, 70]))
            strands.append(strand)
        strand += rng.randint(1, 2)
    f = FilteredReads(
        payloads=payloads, quals=np.array(quals), strands=np.array(strands),
        n_input=len(payloads), n_rs_pass=len(payloads),
    )
    t_batch = compute_trial_llrs(f, EPS, aligner=None, batch_msa=True)
    t_percl = compute_trial_llrs(f, EPS, aligner=msa_aligner, batch_msa=False)
    assert np.array_equal(t_batch, t_percl)
