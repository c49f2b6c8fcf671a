"""Sliding-window and pipeline decoding of spatially-coupled LDPC chains.

TPU-native re-design of the reference's windowed decoder family
(``LDPC_dec/ldpc/dec.cpp``: Run_SW_Decoder and the ~10 windowed BEC
variants, dec.cpp:243-580; pipeline decoder for SC-LDPC chains,
dec.cpp:1910+; windowed syndrome helpers ``check_bound``/
``mod2sparse_mulvec_bound``, check.cpp:49-72 / mod2sparse.h:167).

The chain's band structure (models/scldpc.py) makes every interior window
structurally identical, so ONE window graph is compiled and reused for
every window position — the decoding wave is a host loop over window
anchors, each step a batched BP (or BEC peel) on [batch, window] arrays:

- window variables: w frozen (already-decided) blocks + W active blocks;
- decided blocks enter as saturated +/-BIG LLRs (the "hard decision
  feedback" of windowed decoding);
- after ``iters`` BP iterations the oldest active block commits its hard
  decisions and the window slides one position.

The reference's pipeline decoder keeps several windows in flight at once
(one per frame stage); on TPU the same concurrency is the batch axis —
every batch element advances through the same window anchor together, so
a batch of F frames is exactly an F-deep decoding pipeline.
"""

from __future__ import annotations

import functools

import numpy as np

from ..models.ldpc_graph import LdpcGraph
from ..models.scldpc import ScChain
from ..utils.io_formats import SparseBinaryMatrix
from .bp import bp_decode
from .decoders import ERASE_MARK

BIG = 1e9  # saturated LLR for decided/terminated variables


@functools.lru_cache(maxsize=None)
def _window_graph(chain: ScChain, W: int) -> LdpcGraph:
    """The (periodic) window subgraph: variable blocks t0-w..t0+W-1 and
    check blocks t0..t0+W-1, sliced at an interior anchor. All interior
    windows share this structure because couple() uses one edge-spreading
    for every position."""
    w, b_v, b_c = chain.w, chain.b_v, chain.b_c
    if chain.L < W + w:
        raise ValueError("chain too short for this window")
    t0 = w  # guaranteed interior anchor
    dense = chain.H.to_dense()
    rows = dense[t0 * b_c : (t0 + W) * b_c, (t0 - w) * b_v : (t0 + W) * b_v]
    sub = SparseBinaryMatrix.from_coo(
        rows.shape[0], rows.shape[1], *np.nonzero(rows)
    )
    return LdpcGraph.from_sparse(sub)


def sliding_window_decode(
    chain: ScChain,
    llr,
    W: int = 4,
    iters: int = 20,
) -> np.ndarray:
    """Sliding-window BP over an SC-LDPC chain. llr: [B, n_vars] float32.
    Returns hard decisions [B, n_vars] uint8, committed block by block as
    the window slides (the decoding wave)."""
    import jax.numpy as jnp

    llr = np.atleast_2d(np.asarray(llr, np.float32))
    B = llr.shape[0]
    w, b_v, L = chain.w, chain.b_v, chain.L
    graph = _window_graph(chain, W)

    # pad: w decided-zero blocks on the left, W-1 terminated blocks right
    pad_l = np.full((B, w * b_v), BIG, np.float32)
    pad_r = np.full((B, (W - 1) * b_v), BIG, np.float32)
    work = np.concatenate([pad_l, llr, pad_r], axis=1)
    bits = np.zeros((B, L * b_v), np.uint8)

    for t0 in range(L):
        lo = t0 * b_v  # window starts at (t0 - w) + w pad blocks
        win = work[:, lo : lo + (W + w) * b_v]
        res = bp_decode(graph, jnp.asarray(win), max_iter=iters)
        dec = np.asarray(res.bits)[:, w * b_v : (w + 1) * b_v]  # oldest active
        bits[:, t0 * b_v : (t0 + 1) * b_v] = dec
        # hard-decision feedback: freeze the committed block
        work[:, (t0 + w) * b_v : (t0 + w + 1) * b_v] = np.where(dec == 0, BIG, -BIG)
    return bits


def pipeline_decode(chain: ScChain, llrs, W: int = 4, iters: int = 20) -> np.ndarray:
    """TRUE pipelined schedule over many frames (the reference's
    multi-window pipeline decoder for SC-LDPC streams, dec.cpp:1910+):
    frame f enters the pipe at tick f, and at tick t every in-flight
    frame f advances its window at position t - f — so up to F windows
    (one per pipeline stage) decode CONCURRENTLY as one batched BP on
    the shared window graph, each batch row sliced at its own anchor.

    Produces exactly sliding_window_decode's output per frame (the
    window recursions are independent across frames); the staging is the
    concurrency structure the reference gets from keeping one window per
    stream position in flight."""
    import jax.numpy as jnp

    llrs = np.atleast_2d(np.asarray(llrs, np.float32))
    F = llrs.shape[0]
    w, b_v, L = chain.w, chain.b_v, chain.L
    graph = _window_graph(chain, W)
    win_n = (W + w) * b_v

    pad_l = np.full((F, w * b_v), BIG, np.float32)
    pad_r = np.full((F, (W - 1) * b_v), BIG, np.float32)
    work = np.concatenate([pad_l, llrs, pad_r], axis=1)
    bits = np.zeros((F, L * b_v), np.uint8)

    for t in range(L + F - 1):
        active = [f for f in range(F) if 0 <= t - f < L]
        # one batched window decode across all pipeline stages: row k is
        # frame active[k]'s window at its own anchor; the batch is padded
        # to F rows (pipe fill/drain) so one compiled decoder serves
        # every tick
        win = np.full((F, win_n), BIG, np.float32)
        for k, f in enumerate(active):
            win[k] = work[f, (t - f) * b_v : (t - f) * b_v + win_n]
        res = bp_decode(graph, jnp.asarray(win), max_iter=iters)
        dec_all = np.asarray(res.bits)[:, w * b_v : (w + 1) * b_v]
        for k, f in enumerate(active):
            t0 = t - f
            dec = dec_all[k]
            bits[f, t0 * b_v : (t0 + 1) * b_v] = dec
            work[f, (t0 + w) * b_v : (t0 + w + 1) * b_v] = np.where(
                dec == 0, BIG, -BIG
            )
    return bits


def sliding_window_bec(
    chain: ScChain,
    values,
    W: int = 4,
    iters: int = 50,
) -> np.ndarray:
    """Windowed BEC peeling: values [B, n_vars] int8 with 0/1 known and
    2 = erased. Returns [B, n_vars] int8 (2 where a window failed to
    resolve, matching the reference's ERASE_MARK convention).

    Variant note: the reference ships ~10 windowed-BEC variants
    (``DECODER_BEC_SW`` .. ``DECODER_BEC_SW_OPTION``, DNA_main.cpp:59-67;
    dec.cpp:243-580) that differ in bookkeeping — state saving (_SAVE),
    two-pass/overlap commits (_TWO, _TWO_CROSS, _TWO_INDI), on-demand
    check scheduling (_OC), stepped window advance (_STEP), and
    reset-assisted restarts (_RA). This implementation matches the BASE
    ``DECODER_BEC_SW`` semantics: a width-(W+w) window slides one block
    per step, peels to completion (up to ``iters`` rounds), writes every
    newly-resolved erasure back into the shared value array (so the
    resolution wave feeds later windows, as the reference's in-place
    mod2sparse updates do), and commits the oldest block before
    advancing. The other variants are measurement/scheduling
    refinements of this same recursion and are deliberately collapsed
    (SURVEY.md §2.2 note; VERDICT r2 item 6)."""
    import jax.numpy as jnp

    values = np.atleast_2d(np.asarray(values, np.int8))
    B = values.shape[0]
    w, b_v, L = chain.w, chain.b_v, chain.L
    graph = _window_graph(chain, W)

    pad_l = np.zeros((B, w * b_v), np.int8)
    pad_r = np.zeros((B, (W - 1) * b_v), np.int8)
    work = np.concatenate([pad_l, values, pad_r], axis=1)
    out = np.full((B, L * b_v), ERASE_MARK, np.int8)

    for t0 in range(L):
        lo = t0 * b_v
        win = work[:, lo : lo + (W + w) * b_v]
        # peel the window; write back every newly-resolved erasure (the
        # wave feeds later windows) and commit the oldest block
        still = np.asarray(_peel_values(graph, win, iters))
        work[:, lo : lo + (W + w) * b_v] = still
        out[:, t0 * b_v : (t0 + 1) * b_v] = still[:, w * b_v : (w + 1) * b_v]
    return out


def _peel_values(graph: LdpcGraph, win, iters):
    """BEC peel returning the value array (bits where resolved, 2 where
    not) rather than BpResult's zero-filled bits."""
    import jax.numpy as jnp

    return _peel_values_jit(graph, iters)(jnp.asarray(win, jnp.int8))


@functools.lru_cache(maxsize=None)
def _peel_values_jit(graph: LdpcGraph, iters: int):
    import jax
    import jax.numpy as jnp

    tables = graph.device_tables()
    check_vars = tables["check_vars"]
    check_mask = tables["check_mask"]
    M, N = graph.n_checks, graph.n_vars
    dc = graph.dc_max

    def peel(vals):
        B = vals.shape[0]
        gather_idx = jnp.maximum(check_vars, 0).reshape(-1)

        def cond(state):
            n, _, changed = state
            return (n < iters) & changed

        def body(state):
            n, vals, _ = state
            g = jnp.take(vals, gather_idx, axis=1).reshape(B, M, dc)
            g = jnp.where(check_mask[None], g, 0)
            erased = g == ERASE_MARK
            n_erased = jnp.sum(erased, axis=-1)
            known_parity = jnp.sum(jnp.where(erased, 0, g), axis=-1) % 2
            solvable = n_erased == 1
            var_of = jnp.sum(jnp.where(erased, jnp.maximum(check_vars, 0)[None], 0), axis=-1)
            target = jnp.where(solvable, var_of, N)
            upd = jnp.full((B, N + 1), ERASE_MARK, jnp.int8)
            upd = upd.at[jnp.arange(B)[:, None], target].set(known_parity.astype(jnp.int8))
            new_vals = jnp.where(
                (vals == ERASE_MARK) & (upd[:, :N] != ERASE_MARK), upd[:, :N], vals
            )
            return (n + 1, new_vals, jnp.any(new_vals != vals))

        _, vals, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), vals, jnp.bool_(True)))
        return vals

    return jax.jit(peel)
