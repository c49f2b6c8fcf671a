"""Paired-end merging (FLASH-analog ingest), k-mer clustering, and the
clustered super-alignment pipeline."""

import numpy as np

from dna_ldpc_tpu.ops.cluster import kmer_cluster, kmer_profiles, super_align
from dna_ldpc_tpu.pipeline.ingest import (
    merge_pairs,
    merged_read_and_qline,
    reverse_complement_batch,
)
from dna_ldpc_tpu.utils.dna import seqs_to_matrix


def _rc(s):
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def test_reverse_complement_batch():
    seqs = ["ACGTT", "GG", "TACGATC"]
    mat = seqs_to_matrix(seqs, pad=8)
    out = reverse_complement_batch(mat, np.array([5, 2, 7]))
    got = [bytes(out[i]).decode().rstrip("-") for i in range(3)]
    assert got == [_rc(s) for s in seqs]


def test_merge_pairs_exact_overlap():
    rng = np.random.default_rng(0)
    frags = ["".join(rng.choice(list("ACGT"), 60)) for _ in range(20)]
    r1 = [f[:40] for f in frags]
    r2 = [_rc(f[20:]) for f in frags]  # R2 reads the other end
    q1 = ["I" * 40] * 20
    q2 = ["5" * 40] * 20
    res = merge_pairs(r1, q1, r2, q2, min_overlap=10)
    assert res.ok.all()
    assert (res.overlap == 20).all()
    assert res.merged == frags
    # agreement -> max quality; head keeps R1 quality, tail R2's
    assert all(q == "I" * 40 + "5" * 20 for q in res.merged_qual)


def test_merge_pairs_mismatch_tolerance_and_reject():
    rng = np.random.default_rng(1)
    frag = "".join(rng.choice(list("ACGT"), 60))
    r1 = frag[:40]
    r2_good = list(frag[20:])
    r2_good[10] = "A" if r2_good[10] != "A" else "C"  # 1 mismatch in 20-overlap
    r2 = _rc("".join(r2_good))
    res = merge_pairs([r1], ["I" * 40], [r2], ["5" * 40], min_overlap=10,
                      max_mismatch_density=0.25)
    assert res.ok[0] and res.mismatches[0] == 1
    # disagreeing base resolved toward the higher-quality read (R1 = 'I')
    assert res.merged[0][:40] == r1
    # random R2 cannot merge
    bad = "".join(rng.choice(list("ACGT"), 40))
    res2 = merge_pairs([r1], ["I" * 40], [bad], ["5" * 40],
                       max_mismatch_density=0.1)
    assert not res2.ok[0] and res2.merged[0] == ""


def test_merged_read_and_qline():
    res = merge_pairs(["ACGTACGTACGTACGTAAAA"], ["IIIIIIIIIIIIIIII!III"],
                      [_rc("ACGTACGTACGTACGTAAAA")], ["I" * 20], min_overlap=10)
    reads, qchars = merged_read_and_qline(res, index_len=4)
    assert reads == ["ACGTACGTACGTACGTAAAA"]
    assert qchars == ["I"]  # the '!' (pos 16 in R1) is outrun by R2's 'I'


def test_kmer_profiles_counts():
    p = kmer_profiles(["AAAA"], k=2, normalize=False)
    assert p.shape == (1, 16)
    assert p[0, 0] == 3 and p[0].sum() == 3  # three AA 2-mers
    # non-ACGT k-mers skipped
    p2 = kmer_profiles(["AANA"], k=2, normalize=False)
    assert p2[0].sum() == 1


def test_kmer_cluster_groups_mutants():
    rng = np.random.default_rng(2)
    centers = ["".join(rng.choice(list("ACGT"), 80)) for _ in range(6)]
    reads, truth = [], []
    for c, center in enumerate(centers):
        for _ in range(8):
            b = list(center)
            for pos in rng.choice(80, 3, replace=False):  # ~4% substitutions
                b[pos] = rng.choice(list("ACGT"))
            reads.append("".join(b))
            truth.append(c)
    order = rng.permutation(len(reads))
    reads = [reads[i] for i in order]
    truth = np.array(truth)[order]
    cl = kmer_cluster(reads, k=4, threshold=0.7)
    assert cl.n_clusters == 6
    # clustering must match the ground-truth partition exactly
    for cid in range(cl.n_clusters):
        members = np.nonzero(cl.assignment == cid)[0]
        assert len(set(truth[members])) == 1
    assert (cl.assignment >= 0).all()


def test_super_align_joins_clusters():
    rng = np.random.default_rng(3)
    a = "".join(rng.choice(list("ACGT"), 40))
    b = "".join(rng.choice(list("ACGT"), 40))
    seqs = [a, a[:20] + "T" + a[21:], b, b[:9] + b[10:]]  # 2 clusters
    rows = super_align(seqs, k=4, threshold=0.6)
    assert sorted(i for i, _ in rows) == [0, 1, 2, 3]
    width = {len(r) for _, r in rows}
    assert len(width) == 1  # rectangular MSA
    by_id = dict(rows)
    for i, s in enumerate(seqs):
        assert by_id[i].replace("-", "") == s  # rows preserve sequences


def test_merge_native_numpy_parity(monkeypatch):
    """The C++ overlap scorer and the numpy fallback must agree exactly."""
    from dna_ldpc_tpu import native_lib
    from dna_ldpc_tpu.pipeline import ingest

    rng = np.random.default_rng(7)
    frags = ["".join(rng.choice(list("ACGT"), rng.integers(50, 80))) for _ in range(60)]
    r1, r2, q1, q2 = [], [], [], []
    for f in frags:
        cut = rng.integers(15, len(f) - 15)
        r1.append(f[: cut + rng.integers(5, 15)])
        r2.append(_rc(f[cut - rng.integers(5, 15):]))
        q1.append("".join(chr(33 + rng.integers(0, 40)) for _ in r1[-1]))
        q2.append("".join(chr(33 + rng.integers(0, 40)) for _ in r2[-1]))
    res_fast = ingest.merge_pairs(r1, q1, r2, q2)
    if native_lib.available():
        monkeypatch.setattr(native_lib, "available", lambda: False)
        res_np = ingest.merge_pairs(r1, q1, r2, q2)
        assert (res_fast.overlap == res_np.overlap).all()
        assert (res_fast.mismatches == res_np.mismatches).all()
        assert res_fast.merged == res_np.merged
        assert res_fast.merged_qual == res_np.merged_qual


def test_index_mat_roundtrip(tmp_path):
    from dna_ldpc_tpu.models.rs_index import decode_index_bits, rs_encode
    from dna_ldpc_tpu.utils.io_formats import (
        read_index_mats,
        read_index_txt,
        write_index_mats,
        write_index_txt,
    )

    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 16, (40, 4))
    cws = rs_encode(msgs)
    bits = ((cws[:, :, None] >> np.arange(3, -1, -1)) & 1).reshape(40, 32)
    # corrupt one symbol in half the reads
    bits_rx = bits.copy()
    bits_rx[:20, 0:4] ^= 1
    dec_bits, cnumerr = decode_index_bits(bits_rx.astype(np.uint8))
    assert (cnumerr[:20] == 1).all() and (cnumerr[20:] == 0).all()

    write_index_txt(tmp_path / "index.txt", bits_rx)
    assert np.array_equal(read_index_txt(tmp_path / "index.txt"), bits_rx)
    write_index_mats(str(tmp_path), dec_bits, cnumerr)
    rd, rc = read_index_mats(str(tmp_path))
    assert np.array_equal(rd, dec_bits) and np.array_equal(rc, cnumerr)


def test_guide_tree_newick():
    from dna_ldpc_tpu.ops.msa.align import guide_tree_newick, joins_to_newick

    # deterministic structure for a simple join list
    assert joins_to_newick([(0, 1), (3, 2)], ["a", "b", "c"]) == "((a,b),c);"
    rng = np.random.default_rng(4)
    base = "".join(rng.choice(list("ACGT"), 50))
    seqs = [base, base[:25] + "A" + base[26:], "".join(rng.choice(list("ACGT"), 50))]
    nw = guide_tree_newick(seqs)
    assert nw.endswith(";") and nw.count("(") == 2
    # the two near-identical sequences join first
    assert "(s0,s1)" in nw or "(s1,s0)" in nw
