"""Instrumented full-scale end-to-end trial timing (real TPU)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

t_all = time.time()


def tick(name, t0):
    print(f"{name}: {time.time()-t0:.2f} s", flush=True)
    return time.time()


from dna_ldpc_tpu.cli import _load_codewords
from dna_ldpc_tpu.pipeline.decode import TrialConfig, anneal_decode, deployed_graph
from dna_ldpc_tpu.pipeline.llr import rs_filter_reads, EDIT_PREFILTER_THRESHOLD
from dna_ldpc_tpu.pipeline.simulate import ChannelModel, load_oligos, simulate_reads

t0 = time.time()
oligos = load_oligos("/root/reference/original files/final_DNA.txt")
reads, quals = simulate_reads(oligos, 70000, ChannelModel(), seed=0)
codewords = _load_codewords("/root/reference/ex_decoder")
t0 = tick("simulate+load", t0)

filtered = rs_filter_reads(reads, quals)
t0 = tick("rs_filter", t0)

# --- replicate compute_trial_llrs with stage timing --------------------
import math

from dna_ldpc_tpu import native_lib
from dna_ldpc_tpu.models.codebook import N_STRANDS, PAYLOAD_BITS
from dna_ldpc_tpu.ops.msa.align import align, cluster_pairs, mea_score
from dna_ldpc_tpu.ops.msa.consistency import consistency_clusters
from dna_ldpc_tpu.ops.msa.pairhmm import batch_posteriors

epsil = 0.02
out = np.zeros((N_STRANDS, PAYLOAD_BITS), dtype=np.float64)
strands = filtered.strands
boundaries = np.nonzero(np.diff(strands))[0] + 1
starts = np.concatenate([[0], boundaries]).astype(np.int64)
ends = np.concatenate([boundaries, [len(strands)]]).astype(np.int64)
strand_of_cluster = strands[starts].astype(np.int32)
print("clusters:", len(starts), flush=True)

lengths = np.array([len(p) for p in filtered.payloads], dtype=np.int32)
offsets = np.zeros(len(lengths), dtype=np.int64)
offsets[1:] = np.cumsum(lengths[:-1], dtype=np.int64)
buf = np.frombuffer("".join(filtered.payloads).encode("latin1"), dtype=np.uint8).copy()
mag = math.log((1 - epsil) / epsil)
needs_python = native_lib.count_trial_llrs_native(
    buf, offsets, lengths, np.ascontiguousarray(filtered.quals, np.int64),
    starts, ends, strand_of_cluster, mag, out,
)
pending = np.nonzero(needs_python)[0]
t0 = tick(f"native counting ({len(pending)} mixed clusters left)", t0)

# edit-distance prefilter
infos = []
pa, pb = [], []
for c in pending:
    s, e = int(starts[c]), int(ends[c])
    rr = filtered.payloads[s:e]
    qq = list(filtered.quals[s:e])
    n = len(rr)
    ii, kk = np.triu_indices(n, k=1)
    infos.append((int(strands[s]), rr, qq, len(pa), len(ii)))
    pa.extend((s + ii).tolist())
    pb.extend((s + kk).tolist())
pa = np.asarray(pa, np.int64)
pb = np.asarray(pb, np.int64)
dists = native_lib.edit_distance_batch_native(buf, offsets, lengths, pa, pb)
t0 = tick(f"edit prefilter ({len(pa)} pairs)", t0)

jobs = []
for strand, rr, qq, off, npairs in infos:
    n = len(rr)
    ii, kk = np.triu_indices(n, k=1)
    close = dists[off : off + npairs] < EDIT_PREFILTER_THRESHOLD
    keep = np.unique(np.concatenate([ii[close], kk[close]]))
    if len(keep) == 0:
        continue
    jobs.append((strand, [rr[i] for i in keep], [qq[i] for i in keep]))
print("msa jobs:", len(jobs), "size hist:",
      np.bincount([len(j[1]) for j in jobs])[:12].tolist(), flush=True)

clusters = [j[1] for j in jobs]
all_x, all_y, spans = [], [], []
for seqs in clusters:
    pairs = cluster_pairs(len(seqs))
    start = len(all_x)
    all_x.extend(seqs[i] for i, _ in pairs)
    all_y.extend(seqs[j] for _, j in pairs)
    spans.append((start, len(all_x)))
print("total pairs:", len(all_x), flush=True)

pair_chunk = 2048
posts_flat = []
for lo in range(0, len(all_x), pair_chunk):
    cx, cy = all_x[lo : lo + pair_chunk], all_y[lo : lo + pair_chunk]
    npad = 0
    if len(cx) < pair_chunk and lo > 0:
        npad = pair_chunk - len(cx)
        cx = cx + [""] * npad
        cy = cy + [""] * npad
    res = batch_posteriors(cx, cy)
    posts_flat.extend(res[: len(res) - npad] if npad else res)
t0 = tick("pair-HMM posteriors", t0)

dists_ea = []
for seqs, (lo, hi) in zip(clusters, spans):
    n = len(seqs)
    d = np.zeros((n, n))
    for p, (i, j) in enumerate(cluster_pairs(n)):
        ea = mea_score(posts_flat[lo + p]) / min(len(seqs[i]), len(seqs[j]))
        d[i, j] = d[j, i] = 1.0 - min(max(ea, 0.0), 1.0)
    dists_ea.append(d)
t0 = tick("EA distances (host mea_score)", t0)

transformed = consistency_clusters([posts_flat[lo:hi] for lo, hi in spans])
t0 = tick("consistency (device)", t0)

aligned = []
for seqs, posts, d in zip(clusters, transformed, dists_ea):
    aligned.append(align(seqs, pair_posts=posts, pair_dists=d, consistency_iters=0))
t0 = tick("progressive+refine (host)", t0)

# counting
from dna_ldpc_tpu.pipeline.llr import _count_llr, Q_HIGH
from dna_ldpc_tpu.utils import dna
for (strand, _, subq), rows_out in zip(jobs, aligned):
    rows, rq, error_q = [], [], []
    for ordinal, aseq in rows_out:
        if len(aseq) != 136:
            error_q.append((subq[ordinal], aseq[-1]))
        else:
            rows.append(aseq)
            rq.append(subq[ordinal])
    if not rows:
        llr = np.zeros(PAYLOAD_BITS, dtype=np.float64)
        c0 = c1 = 0
        for qq_, ch in error_q:
            if qq_ > Q_HIGH:
                lsb = dna.dna_to_bits(dna.seq_to_bytes(ch))[1]
                c0, c1 = (c0 + 1, c1) if lsb == 0 else (c0, c1 + 1)
        llr[PAYLOAD_BITS - 1] = (c0 - c1) * mag
        out[strand] = llr
    else:
        out[strand] = _count_llr(rows, rq, mag)
t0 = tick("counting", t0)

soft = out.T.copy()
graph = deployed_graph()
phase = {}
dec, ff, fl, ni = anneal_decode(graph, soft, codewords, TrialConfig(), phase)
t0 = tick(f"decode (first={phase['first_decode']:.2f}s anneal={phase['second_decode']:.2f}s)", t0)
errs = (dec != codewords).any(axis=1).sum()
print("codeword failures:", errs, "fail_first:", ff, flush=True)
print(f"TOTAL (excl simulate+load): {time.time()-t_all:.2f} s", flush=True)
