"""Device-batched consistency transform for the MPC pipeline.

The reference applies two consistency iterations per cluster with an
OpenMP loop over pairs of sparse matrix triple-products
(``MUSCLE/src/consflat.cpp:5-23``, ``conspairflat.cpp``,
``relaxflat.cpp:4-91``):

    P'_XY = (2 P_XY + sum_{Z != X,Y} P_XZ @ P_ZY) / n

restricted to P_XY's existing support (MySparseMx::UpdateFromPost).

Here the transform is ONE batched einsum per cluster-size group: clusters
of the same sequence count n are stacked into a block tensor
A[c, i, j, a, b] (A[c,i,i] = 0, A[c,j,i] = A[c,i,j]^T), for which

    sum_z A[i,z] @ A[z,j]  ==  the reference's sum over Z != X,Y

because the diagonal blocks are zero — so both iterations are plain
[n*L, n*L] block matmuls, an MXU-shaped operation, batched over every
cluster of a trial at once instead of a Python dict-loop per pair
(the round-2 bottleneck at align.py:379-396).

Results return to host via the same lossless top-k sparse transport as
the pair-HMM posteriors (support after masking is bounded by the
original <= top_k-entry rows, ops/msa/pairhmm.py batch_posteriors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pairhmm import MIN_SPARSE_PROB


@functools.partial(jax.jit, static_argnums=(1, 2))
def _consistency_device(pair_mats, n, iters):
    """pair_mats: [C, n*(n-1)/2, L, L] stacked i<j pair posteriors (zero
    padded). Returns the transformed pairs in the same layout."""
    C, npair, L, _ = pair_mats.shape
    ii, jj = np.triu_indices(n, k=1)

    # scatter pairs into the block tensor A[c, i, j, a, b]
    A = jnp.zeros((C, n, n, L, L), pair_mats.dtype)
    A = A.at[:, ii, jj].set(pair_mats)
    A = A.at[:, jj, ii].set(jnp.swapaxes(pair_mats, -1, -2))

    for _ in range(iters):
        # sum_z A[i,z] @ A[z,j]; the z == i and z == j terms vanish
        # because the diagonal blocks are zero
        S = jnp.einsum(
            "cizab,czjbd->cijad", A, A, preferred_element_type=jnp.float32
        )
        A = jnp.where(A < MIN_SPARSE_PROB, 0.0, (2.0 * A + S) / n)

    return A[:, ii, jj]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _consistency_device_sparse(pair_mats, n, iters, top_k):
    """Consistency + on-device top-k row sparsification (f32 values —
    full precision, unlike the raw-posterior transport's bf16, so the
    batched path matches align()'s host loop bit-for-bit — with 1-based
    uint8 column indices, 0 = pruned)."""
    out = _consistency_device(pair_mats, n, iters)
    vals, idx = jax.lax.top_k(out, top_k)
    keep = vals > 0.0
    vals = jnp.where(keep, vals, 0.0)
    idx1 = jnp.where(keep, idx + 1, 0).astype(jnp.uint8)
    return vals, idx1


def consistency_clusters(
    cluster_posts: list[list[np.ndarray]],
    iters: int = 2,
    chunk_elems: int = 1 << 26,
    top_k: int = 8,
) -> list[list[np.ndarray]]:
    """Apply ``iters`` consistency iterations to every cluster's pair
    posteriors on device.

    ``cluster_posts[c]`` holds cluster c's C(n_c, 2) posteriors in
    cluster_pairs order, with per-pair shapes [len_i, len_j]. Clusters
    with fewer than 3 sequences pass through unchanged (mpcflat.cpp:185).
    Clusters are grouped by n and padded to a shared L per group;
    ``chunk_elems`` bounds each device tensor's element count.
    """
    out: list[list[np.ndarray] | None] = [None] * len(cluster_posts)

    groups: dict[int, list[int]] = {}
    for c, posts in enumerate(cluster_posts):
        npair = len(posts)
        if npair < 3:  # n < 3: consistency skipped
            out[c] = posts
            continue
        n = int(round((1 + np.sqrt(1 + 8 * npair)) / 2))
        groups.setdefault(n, []).append(c)

    for n, members in groups.items():
        npair = n * (n - 1) // 2
        L = max(max(max(p.shape) for p in cluster_posts[c]) for c in members)
        L = max(32, -(-L // 32) * 32)
        # output support is bounded by the input support per row
        # (UpdateFromPost masking), so top-(max input row support) keeps
        # the sparse transport lossless
        max_sup = max(
            (int((mat > 0).sum(axis=1).max(initial=0)) for c in members
             for mat in cluster_posts[c]),
            default=0,
        )
        k = min(L, max(top_k, max_sup))
        use_sparse = L <= 255
        chunk = max(1, chunk_elems // (npair * L * L))
        for lo in range(0, len(members), chunk):
            batch = members[lo : lo + chunk]
            C = len(batch)
            stacked = np.zeros((C, npair, L, L), np.float32)
            for bi, c in enumerate(batch):
                for p, mat in enumerate(cluster_posts[c]):
                    stacked[bi, p, : mat.shape[0], : mat.shape[1]] = mat
            if use_sparse:
                vals, idx = _consistency_device_sparse(
                    jnp.asarray(stacked), n, iters, k
                )
                vals = np.asarray(vals, np.float32)  # [C, npair, L, K]
                idx = np.asarray(idx).astype(np.int64)
                rows = np.arange(L)[:, None]
                for bi, c in enumerate(batch):
                    res = []
                    for p, mat in enumerate(cluster_posts[c]):
                        dense = np.zeros((L, L + 1), np.float32)
                        dense[rows, idx[bi, p]] = vals[bi, p]
                        res.append(dense[: mat.shape[0], 1 : mat.shape[1] + 1])
                    out[c] = res
            else:
                trans = np.asarray(_consistency_device(jnp.asarray(stacked), n, iters))
                for bi, c in enumerate(batch):
                    out[c] = [
                        trans[bi, p, : mat.shape[0], : mat.shape[1]]
                        for p, mat in enumerate(cluster_posts[c])
                    ]
    return out
