"""MUSCLE-v5-replacement MSA engine (batched pair-HMM MPC pipeline)."""

from .align import align, align_clusters, mea_align, mea_score, upgma_join_order  # noqa: F401
from .pairhmm import pair_posteriors, pair_fwd_bwd  # noqa: F401


def msa_aligner(seqs, refine_iters: int = 100, seed: int = 0):
    """Aligner-interface adapter for pipeline.llr (list of seqs ->
    [(input ordinal, aligned row)]), the drop-in replacement for the
    reference's `MUSCLE -align` subprocess (decoder.py:39-41, 201-206)."""
    return align(list(seqs), refine_iters=refine_iters, seed=seed)
