"""Sequencing-read simulator: synthesizes trials from the encoded oligo
pool for end-to-end testing and FER/cost studies.

The reference bundles real sampled-read files (``72000_RS_<t>.txt``, large
blobs) produced upstream by FLASH-merging Illumina FASTQs; those artifacts
are not re-derivable from the repo. This simulator plays the channel's
role instead: sample oligos with a coverage distribution, apply
substitution/insertion/deletion noise per base, and emit one quality
character per read (the reference's quality files carry exactly one char
per read, ``72000_RS_Q_*`` / decoder.py:54,90). It doubles as the
pipeline-level fault-injection hook (the analogue of the decoder-level
channels in ``LDPC_dec/ldpc/channel.cpp``, see ops/channels.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..utils import dna


@dataclass
class ChannelModel:
    """Per-base error rates. Defaults are calibrated to the regime the
    reference pipeline actually tolerates: its LLR rules keep only MSA
    rows whose aligned width is exactly 136 (decoder.py:209-233), so ANY
    cluster containing an insertion read (aligned width >= 137) becomes
    an all-but-bit-271 erasure. The real dataset is deletion-dominant
    (variable-length reads are the paper's premise); at Illumina-like
    insertion rates (~1e-5/nt) insertion-erased clusters stay rare enough
    for BP to absorb. Raising ``insertion`` toward ``deletion`` is a
    fault-injection knob, not a realistic channel."""

    substitution: float = 0.01
    insertion: float = 2e-5
    deletion: float = 5e-4
    # quality chars: high-quality reads get > '?' (63), low-quality < '5' (53)
    q_high: int = 70
    q_low: int = 40
    p_low_quality: float = 0.05


def load_oligos(path: str) -> list[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def simulate_reads(
    oligos: list[str],
    n_reads: int,
    channel: ChannelModel = ChannelModel(),
    seed: int = 0,
) -> tuple[list[str], list[str]]:
    """Sample n_reads uniformly from the oligo pool through the noisy
    channel. Returns (reads, quality_chars)."""
    rng = np.random.default_rng(seed)
    picks = rng.integers(0, len(oligos), size=n_reads)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)

    reads: list[str] = []
    quals: list[str] = []
    for p in picks:
        seq = dna.seq_to_bytes(oligos[p]).copy()
        L = len(seq)
        # substitutions: replace with one of the three other bases
        sub_mask = rng.random(L) < channel.substitution
        if sub_mask.any():
            idx = np.nonzero(sub_mask)[0]
            offs = rng.integers(1, 4, size=len(idx))
            cur = dna.dna_to_symbols(seq[idx])
            seq[idx] = bases[(cur + offs) % 4]
        # deletions
        del_mask = rng.random(L) < channel.deletion
        if del_mask.any():
            seq = seq[~del_mask]
        # insertions (insert a random base before position)
        ins_mask = rng.random(len(seq) + 1) < channel.insertion
        if ins_mask.any():
            out = []
            for i, b in enumerate(seq):
                if ins_mask[i]:
                    out.append(bases[rng.integers(0, 4)])
                out.append(b)
            if ins_mask[len(seq)]:
                out.append(bases[rng.integers(0, 4)])
            seq = np.array(out, dtype=np.uint8)
        reads.append(seq.tobytes().decode("ascii"))
        q = channel.q_low if rng.random() < channel.p_low_quality else channel.q_high
        quals.append(chr(q))
    return reads, quals
