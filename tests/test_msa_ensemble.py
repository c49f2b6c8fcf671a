"""MSA ensemble replicates (perturb/stratified/diversified), CC selection
and qscore alignment-accuracy metrics."""

import numpy as np
import pytest

pytest.importorskip("jax")

from dna_ldpc_tpu.ops.msa.align import align
from dna_ldpc_tpu.ops.msa.ensemble import (
    column_confidence,
    ensemble_align,
    perturb_params,
    qscore,
    select_by_cc,
)
from dna_ldpc_tpu.ops.msa.pairhmm import LOG_ZERO, nucleo_params

SEQS = [
    "ACGTACGTACGGTACA",
    "ACGTACTACGGTACA",     # one deletion
    "ACGTACGTACGGTTACA",   # one insertion
    "ACGTACGTACAGTACA",    # one substitution
]


def test_perturb_params_preserves_mass_and_support():
    base = nucleo_params()
    pert = perturb_params(seed=3, delta=0.3)
    for b, p in zip(base, pert):
        b2, p2 = np.atleast_2d(b), np.atleast_2d(p)
        live = b2 > LOG_ZERO / 2
        assert ((p2 > LOG_ZERO / 2) == live).all()  # support unchanged
        for r in range(b2.shape[0]):
            if live[r].any():
                mb = np.exp(b2[r][live[r]]).sum()
                mp = np.exp(p2[r][live[r]]).sum()
                assert abs(mb - mp) < 1e-4 * max(mb, 1e-9)
        assert (np.abs(np.where(live, b2 - p2, 0.0)) > 1e-7).any() or (b2 == p2).all()


def test_ensemble_modes_and_cc():
    ens = ensemble_align(SEQS, replicates=3, mode="diversified", refine_iters=10)
    assert len(ens) == 3
    for aln in ens:
        assert sorted(o for o, _ in aln) == [0, 1, 2, 3]
        width = len(aln[0][1])
        assert all(len(row) == width for _, row in aln)
        # degapping returns the input sequences
        for o, row in aln:
            assert row.replace("-", "") == SEQS[o]
    cc = column_confidence(ens)
    assert cc.shape == (3,) and (cc >= 0).all() and (cc <= 1).all()
    best, cc2 = select_by_cc(ens)
    assert best is ens[int(np.argmax(cc2))]

    with pytest.raises(ValueError):
        ensemble_align(SEQS, replicates=2, mode="bogus")


def test_qscore_self_and_degraded():
    ref = align(SEQS, refine_iters=5)
    assert qscore(ref, ref) == {"Q": 1.0, "TC": 1.0}
    # a strawman test alignment: pad everything to the same width with
    # right gaps (destroys most aligned pairs)
    width = max(len(s) for s in SEQS) + 2
    straw = [(i, s + "-" * (width - len(s))) for i, s in enumerate(SEQS)]
    scores = qscore(straw, ref)
    assert scores["Q"] < 1.0


def _leaves_of(joins):
    n = len(joins) + 1
    used = set()
    for a, b in joins:
        used.update((a, b))
    return {x for x in used if x < n}


def test_permute_join_order_small_tree_unchanged():
    from dna_ldpc_tpu.ops.msa.align import permute_join_order

    joins = [(0, 1), (2, 3), (4, 5), (6, 7)]  # 5 leaves < 10
    # (not a single tree, but the <10-leaf passthrough fires first)
    for perm in ("none", "abc", "acb", "bca"):
        assert permute_join_order(joins, perm) == joins


def test_permute_join_order_valid_and_distinct():
    from dna_ldpc_tpu.ops.msa.align import permute_join_order, upgma_join_order

    rng = np.random.default_rng(5)
    n = 12
    d = rng.random((n, n))
    d = (d + d.T) / 2
    joins = upgma_join_order(d)
    results = {}
    for perm in ("abc", "acb", "bca"):
        pj = permute_join_order(joins, perm)
        # structurally valid join order over the same leaves
        assert len(pj) == n - 1
        assert _leaves_of(pj) == set(range(n))
        seen = set(range(n))
        for k, (a, b) in enumerate(pj):
            assert a in seen and b in seen and a != b
            seen.add(n + k)
        results[perm] = tuple(pj)
    # the three permutations are not all identical
    assert len(set(results.values())) > 1
    with pytest.raises(ValueError):
        permute_join_order(joins, "xyz")


def test_efa_roundtrip(tmp_path):
    from dna_ldpc_tpu.ops.msa.ensemble import read_efa, write_efa

    ens = ensemble_align(SEQS, replicates=3, mode="stratified", refine_iters=4)
    p = tmp_path / "ens.efa"
    write_efa(str(p), ens, names=["a", "b", "c"])
    text = p.read_text()
    assert text.startswith("<a\n")
    names, back = read_efa(str(p))
    assert names == ["a", "b", "c"]
    assert back == [sorted(a) for a in ens]

    bad = tmp_path / "bad.efa"
    bad.write_text(">s0\nACGT\n")
    with pytest.raises(ValueError):
        read_efa(str(bad))
