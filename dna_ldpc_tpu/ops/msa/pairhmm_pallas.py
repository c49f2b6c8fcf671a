"""VMEM-resident Pallas kernel for the batched 5-state pair-HMM.

Replaces the XLA antidiagonal formulation of ``pairhmm.py`` on TPU. The
XLA path launches ~2L tiny sequential steps per sweep, each round-tripping
its [P, 6, W] slab through HBM with gather/dynamic-update kernels in
between — measured ~1.2 ms/pair at Lmax=160 (the end-to-end pipeline's
dominant cost, 98% of a trial). Here the ENTIRE DP — forward sweep,
backward sweep, and posterior assembly — runs inside one kernel whose
state never leaves VMEM; HBM sees only the sequence codes in and the
posterior slabs out.

Matches ``MUSCLE/src/fwdflat3.cpp:11-60`` / ``bwdflat3.cpp`` /
``calcposteriorflat.cpp:4-27`` semantics via the same recurrences as
``pairhmm._posteriors_device`` (the XLA path remains the oracle).

Design notes (why this shape):

- Layout [P_tile, W'] per antidiagonal slab: pairs on SUBLANES (8/tile),
  the DP row coordinate i on LANES (W' = 256 for Lmax <= 255). Shifts
  between antidiagonals are 1-lane rolls; every op is a full-width VPU
  op. Per-pair state is ~20 slabs x 8 KB — trivially VMEM-resident.
- The BACKWARD sweep runs in natural (i, j) coordinates as an
  anti-causal DP (diag d descending, cell (i,j) fed from d+1/d+2):

      Bwd[s](i,j) = lse_{s'} trans[s][s'] + emit_{s'}(next chars)
                            + Bwd[s'](cell moved by s')
      Bwd[s](lx,ly) = start[s]                  (end factor)

  which is EXACTLY bwdflat3's definition (own emission excluded) — no
  reversed sequences, no per-pair coordinate flip, and the slab at diag
  d aligns 1:1 with the forward M-plane slab at the same d. The per-pair
  terminal condition is a masked injection at (lane == lx) & (d == lx+ly),
  a uniform vector op.
- total = lse_s(Fwd[s](lx,ly) + start[s]) is captured DURING the forward
  sweep by a masked lane-reduction at the per-pair corner, so the
  backward sweep can fuse posterior assembly:
      post(i,j) = exp(Fwd_M + Bwd_M - total), zeroed < MIN_SPARSE_PROB
  and write finished diagonal slabs straight to the output.
- The forward M-plane ([2L+1, P_tile, W'] f32, ~2.6 MB at Lmax=160) is
  the only large buffer; with the double-buffered output block the
  kernel sits at ~8 MB of VMEM.
- The moving emission operand y[d - i] is maintained incrementally: one
  1-lane roll plus a masked insert of the single newly-needed character
  per step (the insert value comes from a lane-select + sum reduction —
  no dynamic-lane addressing).

A THIRD phase then sweeps the just-written posterior plane with the MEA
max-DP (CalcAlnScoreFlat) over bf16-rounded values, so per-pair EA
alignment scores leave the chip as [P] scalars, bitwise-equal to host
mea_score() on the sparse-transport posteriors — the EA distance matrix
costs no posterior download at all.

Output is the posterior in diagonal layout [2L+1, P, W'] (cell (i, j) at
[i+j, p, i]); a cheap XLA gather re-packs it to [P, Lmax, Lmax] compact
form identical to ``pairhmm._posteriors_device``'s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairhmm import (
    LOG_ZERO,
    MIN_SPARSE_PROB,
    M,
    IX,
    IY,
    JX,
    JY,
    START,
    _ENCODE_TABLE,
    nucleo_params,
)

P_TILE = 8  # pairs per grid program (sublane tile)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _consts():
    """Scalar transition/emission constants pulled from the SAME tables
    as the XLA path (bit-identical parameterization)."""
    start, trans6, match, ins = nucleo_params()
    c = {
        "tMM": trans6[M, M], "tMIS": trans6[M, IX], "tMIL": trans6[M, JX],
        "tISM": trans6[IX, M], "tISIS": trans6[IX, IX],
        "tILM": trans6[JX, M], "tILIL": trans6[JX, JX],
        "sM": start[M], "sIS": start[IX], "sIL": start[JX],
        "eDIAG": match[0, 0], "eOTH": match[0, 1], "eW16": match[4, 4],
        "eMARG": ins[0], "eW4": ins[4],
    }
    return {k: float(v) for k, v in c.items()}


def _lse(*ts):
    m = ts[0]
    for t in ts[1:]:
        m = jnp.maximum(m, t)
    s = ts[0] - ts[0]
    for t in ts:
        s = s + jnp.exp(t - m)
    return m + jnp.log(s)


def _kernel(xc_ref, yc_ref, yb_ref, lx_ref, ly_ref, out_ref, ea_ref, fmp_ref, *,
            Lmax, Wp):
    C = _consts()
    D = 2 * Lmax
    P = xc_ref.shape[0]
    NEG = jnp.float32(LOG_ZERO)
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (P, Wp), 1)

    xc = xc_ref[:]            # [P, Wp] codes, lane w = x char at 1-based pos w
    yc = yc_ref[:]
    # [P, 1] lengths broadcast to full slabs up front: Mosaic relayouts of
    # lane-reduced [P, 1] vectors into broadcast operands are fragile
    lx = jnp.broadcast_to(lx_ref[:], (P, Wp))
    ly = jnp.broadcast_to(ly_ref[:], (P, Wp))
    lsum = lx + ly

    def shr(a):  # a at lane w-1  (cell (i-1, ...))
        return jnp.where(lane == 0, NEG, pltpu.roll(a, 1, 1))

    def shl(a):  # a at lane w+1  (cell (i+1, ...))
        return jnp.where(lane == Wp - 1, NEG, pltpu.roll(a, Wp - 1, 1))

    def shl_code(a):  # codes at lane w+1 (wildcard past the edge)
        return jnp.where(lane == Wp - 1, 4, pltpu.roll(a, Wp - 1, 1))

    def m_emit_of(xi, yj):
        wild = (xi == 4) | (yj == 4)
        return jnp.where(
            wild, f32(C["eW16"]),
            jnp.where(xi == yj, f32(C["eDIAG"]), f32(C["eOTH"])),
        )

    def ins_emit_of(ci):
        return jnp.where(ci == 4, f32(C["eW4"]), f32(C["eMARG"]))

    # NOT jnp.full (and not iota-derived either): splat constants carry a
    # replicated Mosaic layout ({*,*}; iota-derived ones {*,0}), and a
    # fori_loop whose carry mixes replicated inits with the body's
    # concrete {0,0} outputs trips "Invalid relayout: ... replicated in
    # destination but not in source"; derive the init slabs from a real
    # VMEM load to pin the fully concrete layout
    neg_slab = xc.astype(f32) * f32(0.0) + NEG

    # ---------------- phase 1: forward sweep (diag d ascending) ----------
    def fwd_body(d, carry):
        prev2, prev1, yd, corner = carry
        # yd[w] = y[d - w]: 1-lane right roll + insert y[d] at lane 0
        dc = jnp.minimum(d, Lmax)
        ynew = jnp.broadcast_to(
            jnp.sum(jnp.where(lane == dc, yc, 0), axis=1, keepdims=True), (P, Wp)
        )
        yd = jnp.where(lane == 0, ynew, pltpu.roll(yd, 1, 1))

        m_emit = m_emit_of(xc, yd)
        x_emit = ins_emit_of(xc)
        y_emit = ins_emit_of(yd)

        p2s = tuple(shr(prev2[s]) for s in range(6))
        cM = _lse(
            p2s[M] + f32(C["tMM"]),
            p2s[IX] + f32(C["tISM"]), p2s[IY] + f32(C["tISM"]),
            p2s[JX] + f32(C["tILM"]), p2s[JY] + f32(C["tILM"]),
            p2s[START] + f32(C["sM"]),
        ) + m_emit
        p1sM, p1sIX, p1sJX, p1sS = (
            shr(prev1[M]), shr(prev1[IX]), shr(prev1[JX]), shr(prev1[START])
        )
        cIX = _lse(p1sM + f32(C["tMIS"]), p1sIX + f32(C["tISIS"]),
                   p1sS + f32(C["sIS"])) + x_emit
        cJX = _lse(p1sM + f32(C["tMIL"]), p1sJX + f32(C["tILIL"]),
                   p1sS + f32(C["sIL"])) + x_emit
        cIY = _lse(prev1[M] + f32(C["tMIS"]), prev1[IY] + f32(C["tISIS"]),
                   prev1[START] + f32(C["sIS"])) + y_emit
        cJY = _lse(prev1[M] + f32(C["tMIL"]), prev1[JY] + f32(C["tILIL"]),
                   prev1[START] + f32(C["sIL"])) + y_emit

        j = d - lane
        valid = (lane <= Lmax) & (j >= 0) & (j <= Lmax)
        cM = jnp.where(valid & (lane >= 1) & (j >= 1), cM, NEG)
        cIX = jnp.where(valid & (lane >= 1), cIX, NEG)
        cJX = jnp.where(valid & (lane >= 1), cJX, NEG)
        cIY = jnp.where(valid & (j >= 1), cIY, NEG)
        cJY = jnp.where(valid & (j >= 1), cJY, NEG)
        cur = (cM, cIX, cIY, cJX, cJY, neg_slab)

        fmp_ref[pl.ds(d, 1)] = cM[None]

        # per-pair corner (lx, ly) capture for the total probability
        # (corner carried as full [P, Wp] slabs, max-reduced lane-wise at
        # the end — avoids [P, 1] intermediates inside the loop)
        cmask = (lane == lx) & (lsum == d)
        corner = tuple(
            jnp.maximum(corner[s], jnp.where(cmask, cur[s], NEG))
            for s in range(5)
        )
        return prev1, cur, yd, corner

    start_slab = jnp.where(lane == 0, f32(0.0), NEG)  # START at (0,0), diag 0
    init_prev1 = (neg_slab,) * 5 + (start_slab,)
    init_prev2 = (neg_slab,) * 6
    init_corner = (neg_slab,) * 5
    yd0 = xc * 0 + 4
    _, _, _, corner = jax.lax.fori_loop(
        1, D + 1, fwd_body, (init_prev2, init_prev1, yd0, init_corner)
    )
    total = _lse(
        corner[M] + f32(C["sM"]),
        corner[IX] + f32(C["sIS"]), corner[IY] + f32(C["sIS"]),
        corner[JX] + f32(C["sIL"]), corner[JY] + f32(C["sIL"]),
    )
    total = jnp.broadcast_to(
        jnp.max(total, axis=1, keepdims=True), (P, Wp)
    )  # the corner slab is NEG except at (lx, ly)

    # ---------------- phase 2: backward sweep + fused posterior ----------
    xn = shl_code(xc)  # x char at i+1

    def bwd_body(k, carry):
        prev2, prev1, ydp1 = carry
        d = D - k
        # ydp1[w] = y[d + 1 - w]: 1-lane left roll + insert at lane Wp-1
        c2 = jnp.clip(d - (Wp - 2), 0, Lmax)
        ynew = jnp.broadcast_to(
            jnp.sum(jnp.where(lane == c2, yc, 0), axis=1, keepdims=True), (P, Wp)
        )
        ydp1 = jnp.where(lane == Wp - 1, ynew, pltpu.roll(ydp1, Wp - 1, 1))

        em_m = m_emit_of(xn, ydp1)
        em_x = ins_emit_of(xn)
        em_y = ins_emit_of(ydp1)

        A_M = em_m + shl(prev2[0])
        A_IX = em_x + shl(prev1[1])
        A_JX = em_x + shl(prev1[3])
        A_IY = em_y + prev1[2]
        A_JY = em_y + prev1[4]

        bM = _lse(A_M + f32(C["tMM"]),
                  A_IX + f32(C["tMIS"]), A_IY + f32(C["tMIS"]),
                  A_JX + f32(C["tMIL"]), A_JY + f32(C["tMIL"]))
        bIX = _lse(A_M + f32(C["tISM"]), A_IX + f32(C["tISIS"]))
        bIY = _lse(A_M + f32(C["tISM"]), A_IY + f32(C["tISIS"]))
        bJX = _lse(A_M + f32(C["tILM"]), A_JX + f32(C["tILIL"]))
        bJY = _lse(A_M + f32(C["tILM"]), A_JY + f32(C["tILIL"]))

        # terminal condition Bwd[s](lx, ly) = start[s] (end factor)
        smask = (lane == lx) & (lsum == d)
        bM = jnp.where(smask, f32(C["sM"]), bM)
        bIX = jnp.where(smask, f32(C["sIS"]), bIX)
        bIY = jnp.where(smask, f32(C["sIS"]), bIY)
        bJX = jnp.where(smask, f32(C["sIL"]), bJX)
        bJY = jnp.where(smask, f32(C["sIL"]), bJY)

        fm = fmp_ref[pl.ds(d, 1)][0]
        post = jnp.exp(jnp.minimum(fm + bM - total, 0.0))
        j = d - lane
        pvalid = (lane >= 1) & (lane <= lx) & (j >= 1) & (j <= ly)
        post = jnp.where(pvalid & (post >= MIN_SPARSE_PROB), post, 0.0)
        out_ref[pl.ds(d, 1)] = post[None]

        return prev1, (bM, bIX, bIY, bJX, bJY), ydp1

    init_b = (neg_slab,) * 5
    yb0 = yb_ref[:]  # ydp1 state at d = D + 1: yb[w] = y[D + 2 - w]
    jax.lax.fori_loop(0, D + 1, bwd_body, (init_b, init_b, yb0))

    # ------------- phase 3: MEA alignment score (EA distances) -----------
    # CalcAlnScoreFlat's max-DP over the match posteriors —
    #   S[i,j] = max(S[i-1,j-1] + post(i,j), S[i-1,j], S[i,j-1]),
    #   S[i,0] = S[0,j] = 0 — swept over the SAME antidiagonal slabs,
    # reading the posterior back from the just-written output plane. The
    # posterior is rounded through bf16 first so the score equals, bit
    # for bit, the host mea_score() applied to the bf16 sparse-transport
    # values (f32 additions along identical DP paths; UPGMA tie-breaks
    # depend on exact equality here).
    def mea_body(d, carry):
        prev2, prev1, best = carry
        pq = out_ref[pl.ds(d, 1)][0]
        pq = pq.astype(jnp.bfloat16).astype(f32)
        cur = jnp.maximum(
            jnp.maximum(shr(prev2) + pq, shr(prev1)), prev1
        )
        j = d - lane
        valid = (lane <= Lmax) & (j >= 0) & (j <= Lmax)
        cur = jnp.where(valid & ((lane == 0) | (j == 0)), f32(0.0), cur)
        cur = jnp.where(valid, cur, NEG)
        cmask = (lane == lx) & (lsum == d)
        best = jnp.maximum(best, jnp.where(cmask, cur, NEG))
        return prev1, cur, best

    s0 = jnp.where(lane == 0, f32(0.0), NEG) + neg_slab * 0  # S at d=0
    # carry = (diag d-2, diag d-1, best): at d=1 these are (-1: none, 0: s0)
    _, _, best = jax.lax.fori_loop(1, D + 1, mea_body, (neg_slab, s0, s0))
    # pairs with lx + ly <= 0 never hit the capture mask inside the loop;
    # their score is 0 (empty alignment)
    ea = jnp.max(best, axis=1, keepdims=True)
    ea_ref[:] = jnp.where(lsum[:, :1] >= 1, ea, f32(0.0))


@functools.partial(jax.jit, static_argnums=(5, 6))
def _post_pallas(Xc, Yc, Yb, lx, ly, Lmax, interpret):
    """Diagonal-layout kernel call + compact re-pack.

    Returns (post [P, Lmax, Lmax] f32 — identical in layout and semantics
    to pairhmm._posteriors_device's first return value — and ea [P] f32
    MEA alignment scores over the bf16-rounded posteriors)."""
    P, Wp = Xc.shape
    D = 2 * Lmax
    grid = (P // P_TILE,)
    seq_spec = pl.BlockSpec((P_TILE, Wp), lambda g: (g, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((P_TILE, 1), lambda g: (g, 0), memory_space=pltpu.VMEM)
    out, ea = pl.pallas_call(
        functools.partial(_kernel, Lmax=Lmax, Wp=Wp),
        grid=grid,
        in_specs=[seq_spec, seq_spec, seq_spec, len_spec, len_spec],
        out_specs=[
            pl.BlockSpec(
                (D + 1, P_TILE, Wp), lambda g: (0, g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((P_TILE, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D + 1, P, Wp), jnp.float32),
            jax.ShapeDtypeStruct((P, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((D + 1, P_TILE, Wp), jnp.float32)],
        interpret=interpret,
    )(Xc, Yc, Yb, lx, ly)
    ii = jnp.arange(1, Lmax + 1)
    post = out[ii[:, None] + ii[None, :], :, ii[:, None]]  # [Lmax, Lmax, P]
    return jnp.moveaxis(post, -1, 0), ea[:, 0]


def encode_batch_pallas(seqs_x, seqs_y, Lmax: int | None = None):
    """Host-side packing for the kernel: 1-based code arrays, the
    backward sweep's initial y operand, and per-pair lengths."""
    P = len(seqs_x)
    lx = np.array([len(s) for s in seqs_x], np.int32)
    ly = np.array([len(s) for s in seqs_y], np.int32)
    if Lmax is None:
        Lmax = int(max(lx.max(initial=1), ly.max(initial=1)))
        Lmax = max(32, _round_up(Lmax, 32))
    Wp = max(128, _round_up(Lmax + 1, 128))
    Pb = max(P_TILE, _round_up(P, P_TILE))
    D = 2 * Lmax

    # vectorized 1-based code packing: byte matrix -> code table lookup,
    # pad cells already map to wildcard 4
    from ...utils.dna import seqs_to_matrix

    Xc = np.full((Pb, Wp), 4, np.int32)
    Yc = np.full((Pb, Wp), 4, np.int32)
    if P:
        mx = seqs_to_matrix(seqs_x, pad=Lmax)
        my = seqs_to_matrix(seqs_y, pad=Lmax)
        Xc[:P, 1 : Lmax + 1] = _ENCODE_TABLE[mx]
        Yc[:P, 1 : Lmax + 1] = _ENCODE_TABLE[my]

    # yb[w] = y[D + 2 - w] (wildcard where out of range)
    Yb = np.full((Pb, Wp), 4, np.int32)
    k = D + 2 - np.arange(Wp)
    sel = (k >= 1) & (k <= Lmax)
    Yb[:, sel] = Yc[:, k[sel]]

    lxp = np.zeros((Pb, 1), np.int32)
    lyp = np.zeros((Pb, 1), np.int32)
    lxp[:P, 0] = lx
    lyp[:P, 0] = ly
    return Xc, Yc, Yb, lxp, lyp, lx, ly, Lmax


def batch_post_pallas(seqs_x, seqs_y, Lmax: int | None = None, interpret=None):
    """post [Pb, Lmax, Lmax] f32 device array + (lx, ly, Lmax)."""
    post, _ea, lx, ly, Lmax = batch_post_ea_pallas(seqs_x, seqs_y, Lmax, interpret)
    return post, lx, ly, Lmax


def batch_post_ea_pallas(seqs_x, seqs_y, Lmax: int | None = None, interpret=None):
    """(post [Pb, Lmax, Lmax] f32 device, ea [Pb] f32 device MEA scores,
    lx, ly, Lmax). The posteriors stay on device — the fused LLR pipeline
    gathers them for the consistency transform without a host round
    trip."""
    Xc, Yc, Yb, lxp, lyp, lx, ly, Lmax = encode_batch_pallas(seqs_x, seqs_y, Lmax)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    post, ea = _post_pallas(
        jnp.asarray(Xc), jnp.asarray(Yc), jnp.asarray(Yb),
        jnp.asarray(lxp), jnp.asarray(lyp), Lmax, bool(interpret),
    )
    return post, ea, lx, ly, Lmax
