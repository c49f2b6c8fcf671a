"""Pallas pair-HMM kernel parity vs the XLA antidiagonal path.

The Pallas kernel (ops/msa/pairhmm_pallas.py) is the TPU production path
for match posteriors; the XLA path (ops/msa/pairhmm.py), itself validated
against the scalar oracle (oracle_pairhmm.py), is the reference here. On
CPU the kernel runs in interpreter mode.
"""

import random

import numpy as np
import pytest

from dna_ldpc_tpu.ops.msa.pairhmm import batch_posteriors
from dna_ldpc_tpu.ops.msa.pairhmm_pallas import batch_post_pallas


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _mutate(rng, s, subs=0, dels=0, inss=0):
    s = list(s)
    for _ in range(subs):
        s[rng.randrange(len(s))] = rng.choice("ACGT")
    for _ in range(dels):
        del s[rng.randrange(len(s))]
    for _ in range(inss):
        s.insert(rng.randrange(len(s)), rng.choice("ACGT"))
    return "".join(s)


def _check_parity(xs, ys, Lmax):
    dense = batch_posteriors(xs, ys, transport="dense", Lmax=Lmax)
    post, lx, ly, _ = batch_post_pallas(xs, ys, Lmax=Lmax)
    post = np.asarray(post)
    for p in range(len(xs)):
        d = dense[p]
        q = post[p, : lx[p], : ly[p]]
        assert d.shape == q.shape
        if d.size:
            np.testing.assert_allclose(q, d, atol=1e-4, rtol=1e-4)


def test_pallas_pairhmm_matches_xla_random():
    rng = random.Random(0)
    xs, ys = [], []
    for _ in range(5):
        base = _rand_seq(rng, rng.randint(8, 30))
        xs.append(base)
        ys.append(_mutate(rng, base, subs=2, dels=1, inss=1))
    # unrelated + empty + one-empty edge cases
    xs += [_rand_seq(rng, 12), "", "ACGT", ""]
    ys += [_rand_seq(rng, 20), "", "", "TTAA"]
    _check_parity(xs, ys, Lmax=32)


def test_pallas_pairhmm_matches_xla_full_lengths():
    """Same-shape-as-production case: Lmax chosen so W' pads to 256 and
    the insert-index edge cases (2*Lmax+1 > W') are exercised."""
    rng = random.Random(3)
    base = _rand_seq(rng, 130)
    xs = [base, _rand_seq(rng, 128)]
    ys = [_mutate(rng, base, subs=3, dels=2, inss=1), _rand_seq(rng, 130)]
    _check_parity(xs, ys, Lmax=160)


def test_fused_align_clusters_matches_per_cluster_align(monkeypatch):
    """The device-fused align_clusters flow (posteriors resident on
    device, on-device EA scores and consistency gather) must reproduce
    per-cluster align() exactly — including n=2 raw pass-through, every
    bucket size, and the n>16 host-consistency fallback."""
    monkeypatch.setenv("DNA_LDPC_PAIRHMM", "pallas")
    import numpy as np

    from dna_ldpc_tpu.ops.msa.align import align, _align_clusters_fused

    rng = np.random.default_rng(9)

    def noisy(s, nd):
        b = list(s)
        for _ in range(nd):
            del b[rng.integers(0, len(b))]
        return "".join(b)

    clusters = []
    for n in (1, 2, 3, 5, 9, 17, 4):
        s = "".join("ACGT"[i] for i in rng.integers(0, 4, 24))
        cl = [s] + [noisy(s, int(rng.integers(1, 3))) for _ in range(n - 1)]
        clusters.append(cl)

    fused = _align_clusters_fused(
        clusters, refine_iters=10, consistency_iters=2, seed=0,
        pair_chunk=160, n_workers=2,
    )
    single = [align(cl, refine_iters=10) for cl in clusters]
    assert fused == single


def test_fused_align_clusters_no_consistency(monkeypatch):
    """consistency_iters=0 routes every cluster through the raw zone of
    the fused flow; results must still match per-cluster align()."""
    monkeypatch.setenv("DNA_LDPC_PAIRHMM", "pallas")
    import numpy as np

    from dna_ldpc_tpu.ops.msa.align import align, _align_clusters_fused

    rng = np.random.default_rng(21)

    def noisy(s, nd):
        b = list(s)
        for _ in range(nd):
            del b[rng.integers(0, len(b))]
        return "".join(b)

    clusters = []
    for n in (2, 4, 3):
        s = "".join("ACGT"[i] for i in rng.integers(0, 4, 30))
        clusters.append([s] + [noisy(s, int(rng.integers(1, 3))) for _ in range(n - 1)])

    fused = _align_clusters_fused(
        clusters, refine_iters=5, consistency_iters=0, seed=0,
        pair_chunk=128, n_workers=2,
    )
    single = [align(cl, refine_iters=5, consistency_iters=0) for cl in clusters]
    assert fused == single


def test_fused_align_clusters_overflow_cluster(monkeypatch):
    """A homopolymer cluster whose posterior rows overflow top-8 must
    round-trip losslessly through the fused raw zone (the per-chunk
    guard widens K) and still match per-cluster align()."""
    monkeypatch.setenv("DNA_LDPC_PAIRHMM", "pallas")
    from dna_ldpc_tpu.ops.msa.align import align, _align_clusters_fused

    clusters = [["A" * 20, "A" * 30]]  # support 13 > 8 (raw zone, n=2)
    fused = _align_clusters_fused(
        clusters, refine_iters=5, consistency_iters=2, seed=0,
        pair_chunk=128, n_workers=1,
    )
    single = [align(cl, refine_iters=5) for cl in clusters]
    assert fused == single


def test_fused_align_clusters_odd_pair_chunk(monkeypatch):
    """A pair_chunk that is not a multiple of the kernel's 8-pair tile
    must be rounded up internally (the device chunk tensors are padded
    to the tile, and the window arithmetic must agree)."""
    monkeypatch.setenv("DNA_LDPC_PAIRHMM", "pallas")
    import numpy as np

    from dna_ldpc_tpu.ops.msa.align import align, _align_clusters_fused

    rng = np.random.default_rng(31)

    def noisy(s, nd):
        b = list(s)
        for _ in range(nd):
            del b[rng.integers(0, len(b))]
        return "".join(b)

    clusters = []
    for n in (3, 4, 2, 5):
        s = "".join("ACGT"[i] for i in rng.integers(0, 4, 24))
        clusters.append([s] + [noisy(s, int(rng.integers(1, 3))) for _ in range(n - 1)])

    fused = _align_clusters_fused(
        clusters, refine_iters=5, consistency_iters=2, seed=0,
        pair_chunk=130, n_workers=2,   # not a multiple of 8
    )
    single = [align(cl, refine_iters=5) for cl in clusters]
    assert fused == single


def test_fused_align_clusters_host_consistency_fallback(monkeypatch):
    """Clusters above the largest device bucket take the dense host
    consistency branch; force it with a tiny bucket list so the branch
    is exercised without a 33-sequence cluster."""
    monkeypatch.setenv("DNA_LDPC_PAIRHMM", "pallas")
    import numpy as np

    import dna_ldpc_tpu.ops.msa.consistency as cm
    from dna_ldpc_tpu.ops.msa.align import align, _align_clusters_fused

    monkeypatch.setattr(cm, "N_BUCKETS", (3, 4))
    rng = np.random.default_rng(41)

    def noisy(s, nd):
        b = list(s)
        for _ in range(nd):
            del b[rng.integers(0, len(b))]
        return "".join(b)

    clusters = []
    for n in (6, 3, 2):  # 6 > max bucket 4 -> host consistency
        s = "".join("ACGT"[i] for i in rng.integers(0, 4, 24))
        clusters.append([s] + [noisy(s, int(rng.integers(1, 3))) for _ in range(n - 1)])

    fused = _align_clusters_fused(
        clusters, refine_iters=5, consistency_iters=2, seed=0,
        pair_chunk=128, n_workers=2,
    )
    single = [align(cl, refine_iters=5) for cl in clusters]
    assert fused == single


def test_pallas_randomized_stress(monkeypatch):
    """Randomized shapes (multiple Lmax buckets, empty/single-char/
    homopolymer pathologies): dense parity vs the XLA path and bitwise
    EA-score agreement with host mea_score on the transport values."""
    import random

    from dna_ldpc_tpu.ops.msa.align import mea_score
    from dna_ldpc_tpu.ops.msa.pairhmm import (
        batch_posteriors,
        batch_posteriors_sparse,
        densify_sparse,
    )
    from dna_ldpc_tpu.ops.msa.pairhmm_pallas import batch_post_ea_pallas

    rng = random.Random(99)

    def rs(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    def mut(s, k):
        s = list(s)
        for _ in range(k):
            op = rng.randrange(3)
            if op == 0 and s:
                s[rng.randrange(len(s))] = rng.choice("ACGT")
            elif op == 1 and len(s) > 1:
                del s[rng.randrange(len(s))]
            else:
                s.insert(rng.randrange(len(s)), rng.choice("ACGT"))
        return "".join(s)

    for trial in range(3):
        Lpick = rng.choice([24, 48, 90])
        xs, ys = [], []
        for _ in range(rng.randint(3, 8)):
            b = rs(rng.randint(1, Lpick))
            xs.append(b)
            ys.append(mut(b, rng.randint(0, 4)))
        xs += ["", "A", "A" * min(Lpick, 25)]
        ys += [rs(3), "", "A" * min(Lpick, 30)]

        monkeypatch.setenv("DNA_LDPC_PAIRHMM", "xla")
        dense = batch_posteriors(xs, ys, transport="dense")
        monkeypatch.setenv("DNA_LDPC_PAIRHMM", "pallas")
        post, ea, lx, ly, _L = batch_post_ea_pallas(xs, ys)
        post = np.asarray(post)
        ea = np.asarray(ea)
        sv, si, lxs, lys, _ = batch_posteriors_sparse(xs, ys)
        for p in range(len(xs)):
            d = dense[p]
            q = post[p, : lx[p], : ly[p]]
            assert d.shape == q.shape
            if d.size:
                np.testing.assert_allclose(q, d, atol=2e-4, rtol=2e-4)
            dd = densify_sparse(sv[p], si[p], int(lxs[p]), int(lys[p]))
            host_ea = mea_score(dd) if dd.size else 0.0
            assert np.float32(host_ea) == np.float32(ea[p])
