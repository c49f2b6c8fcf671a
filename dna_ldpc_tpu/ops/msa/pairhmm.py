"""Batched 5-state pair-HMM forward/backward and match posteriors.

TPU-native replacement for MUSCLE v5's per-pair flat DP
(``MUSCLE/src/fwdflat3.cpp``, ``bwdflat3.cpp``, ``calcposteriorflat.cpp``,
``totalprobflat.cpp``): where MUSCLE walks one (LX+1)x(LY+1)x5 lattice per
OpenMP thread, here a whole batch of pairs is swept together by
ANTIDIAGONALS — every state's dependencies reach only the previous two
diagonals, so each of the ~2L steps is one vectorized slab update over
[n_pairs, L+1] cells, which is how this sequential-looking DP maps onto
the VPU.

Model (pairhmm.h:11-19): states M, IX, IY (short inserts), JX, JY (long
inserts); parameters are MUSCLE's default nucleotide HMM
(defaulthmmparams.cpp:243-279 — START_M=0.6, START_IS=0.02, START_IL=0.18,
M_M=0.96, M_IS=0.012, M_IL=0.008, IS_IS=0.35, IL_IL=0.90; match emissions
0.12 diagonal / 0.044 off-diagonal, insert emissions = row marginals;
wildcard emissions 1/4 and 1/16, hmmparams.cpp:281-...). The model pays
the START score of the final state as an end factor (bwdflat3.cpp's
(LX, LY) special case), and the total probability is the logsumexp over
states at (LX, LY) (totalprobflat.cpp).

Backward pass without a second kernel: Bwd[s][i][j] (suffix probability
given state s at (i,j), emissions of (i,j) excluded — bwdflat3.cpp's
definition) is computed from an auxiliary W-DP on REVERSED sequences.
With a = LX-i, b = LY-j,

    W[s][a][b] := emit_s(rev chars at (a,b)) *
                  sum_s'' trans[s][s''] * W[s''][prev_a,b cell of s]
    W base:       virtual START row with trans[START][s] = start[s]

which is EXACTLY the forward recurrence with the transposed transition
matrix — so one antidiagonal kernel serves both sweeps — and then

    Bwd[s][i][j] = logsumexp_s' ( trans[s][s'] + W[s'][a][b] ),
    Bwd[s][LX][LY] = start[s].

Posterior(i~j) = exp(Fwd_M[i,j] + Bwd_M[i,j] - total), zeroed below 0.01
(MIN_SPARSE_PROB, mysparsemx.h:3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LOG_ZERO = -1e30
MIN_SPARSE_PROB = 0.01

# state indices (pairhmm.h HMMSTATE order: M, IX, IY, JX, JY)
M, IX, IY, JX, JY = 0, 1, 2, 3, 4
N_STATE = 5
START = 5  # virtual start state (row 5 of the 6x5 transition tables)

_X_STATES = (IX, JX)
_Y_STATES = (IY, JY)


@functools.lru_cache(maxsize=None)
def nucleo_params():
    """(start[5], trans6[6,5], match[5,5], ins[5]) log-space float32;
    symbol 4 is the wildcard (non-ACGT). trans6[START] = start scores."""
    t = {
        ("M", "M"): 0.96, ("M", "IS"): 0.012, ("M", "IL"): 0.008,
        ("IS", "IS"): 0.35, ("IS", "M"): 0.65,
        ("IL", "IL"): 0.90, ("IL", "M"): 0.10,
    }
    diag, other = 0.12, 0.044

    start = np.full(N_STATE, LOG_ZERO, np.float64)
    start[M] = np.log(0.6)
    start[IX] = start[IY] = np.log(0.02)
    start[JX] = start[JY] = np.log(0.18)

    trans = np.full((N_STATE + 1, N_STATE), LOG_ZERO, np.float64)
    trans[M, M] = np.log(t[("M", "M")])
    for s in (IX, IY):
        trans[M, s] = np.log(t[("M", "IS")])
        trans[s, s] = np.log(t[("IS", "IS")])
        trans[s, M] = np.log(t[("IS", "M")])
    for s in (JX, JY):
        trans[M, s] = np.log(t[("M", "IL")])
        trans[s, s] = np.log(t[("IL", "IL")])
        trans[s, M] = np.log(t[("IL", "M")])
    trans[START] = start

    emit = np.full((4, 4), other, np.float64)
    np.fill_diagonal(emit, diag)
    match = np.full((5, 5), np.log(1.0 / 16), np.float64)
    match[:4, :4] = np.log(emit)
    ins = np.full(5, np.log(0.25), np.float64)
    ins[:4] = np.log(emit.sum(axis=1))

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return f32(start), f32(trans), f32(match), f32(ins)


@functools.lru_cache(maxsize=None)
def _trans_reversed():
    """6x5 transition table for the W-DP: real rows transposed, START row
    unchanged (= start scores)."""
    _, trans6, _, _ = nucleo_params()
    t = np.asarray(trans6)
    out = np.full_like(t, LOG_ZERO)
    out[:N_STATE, :] = t[:N_STATE, :].T
    out[START] = t[START]
    return jnp.asarray(out)


_ENCODE_TABLE = np.full(256, 4, np.int8)
for _i, _c in enumerate("ACGT"):
    _ENCODE_TABLE[ord(_c)] = _i
    _ENCODE_TABLE[ord(_c.lower())] = _i


def encode_seq(seq: str) -> np.ndarray:
    """ACGT -> 0..3, everything else -> wildcard 4."""
    return _ENCODE_TABLE[np.frombuffer(seq.encode("latin1"), np.uint8)]


def _logsumexp(stack, axis):
    m = jnp.max(stack, axis=axis)
    return m + jnp.log(jnp.sum(jnp.exp(stack - jnp.expand_dims(m, axis)), axis=axis))


@functools.partial(jax.jit, static_argnums=(3,))
def _diag_dp(X, Y, trans6, Lmax):
    """Uniform antidiagonal DP (forward or W sweep, set by trans6).

    X, Y: [P, Lmax] int8 symbol codes. Cells within a pair's (lx, ly) box
    never read pad symbols, so per-pair lengths need no masking here.
    Returns diags [2*Lmax+1, P, 5, Lmax+1]: V[s][i][j] = diags[i+j, :, s, i].
    """
    _, _, match, ins = nucleo_params()
    P = X.shape[0]
    W = Lmax + 1
    D = 2 * Lmax
    rows = jnp.arange(W)

    def step(d, carry):
        prev2, prev1, out = carry
        j = d - rows
        xi = jnp.take(X, jnp.clip(rows - 1, 0, Lmax - 1), axis=1)      # [P, W]
        yj = jnp.take(Y, jnp.clip(j - 1, 0, Lmax - 1), axis=1)          # [P, W]
        m_emit = match[xi, yj]
        x_emit = ins[xi]
        y_emit = ins[yj]

        shift = lambda a: jnp.concatenate(
            [jnp.full(a.shape[:-1] + (1,), LOG_ZERO, a.dtype), a[..., :-1]], axis=-1
        )
        p2s = shift(prev2)  # (i-1, j-1)
        p1s = shift(prev1)  # (i-1, j)
        p1 = prev1          # (i, j-1)

        cM = _logsumexp(p2s + trans6[:, M][None, :, None], axis=1) + m_emit
        def ins_state(src_vals, s, emit):
            terms = jnp.stack(
                [src_vals[:, M] + trans6[M, s],
                 src_vals[:, s] + trans6[s, s],
                 src_vals[:, START] + trans6[START, s]],
                axis=1,
            )
            return _logsumexp(terms, 1) + emit

        cIX = ins_state(p1s, IX, x_emit)
        cJX = ins_state(p1s, JX, x_emit)
        cIY = ins_state(p1, IY, y_emit)
        cJY = ins_state(p1, JY, y_emit)

        j_ok = (j >= 0) & (j <= Lmax)
        valid = (rows <= jnp.minimum(d, Lmax)) & j_ok
        mask_m = (rows >= 1) & (j >= 1) & valid
        mask_x = (rows >= 1) & valid
        mask_y = (j >= 1) & valid

        neg = jnp.float32(LOG_ZERO)
        cur = jnp.stack(
            [
                jnp.where(mask_m[None, :], cM, neg),
                jnp.where(mask_x[None, :], cIX, neg),
                jnp.where(mask_y[None, :], cIY, neg),
                jnp.where(mask_x[None, :], cJX, neg),
                jnp.where(mask_y[None, :], cJY, neg),
                jnp.full((P, W), neg),  # START lives only at (0,0)
            ],
            axis=1,
        )
        out = jax.lax.dynamic_update_slice(out, cur[None, :, :N_STATE, :], (d, 0, 0, 0))
        return (prev1, cur, out)

    init0 = jnp.full((P, N_STATE + 1, W), LOG_ZERO, jnp.float32)
    init0 = init0.at[:, START, 0].set(0.0)
    out = jnp.full((D + 1, P, N_STATE, W), LOG_ZERO, jnp.float32)
    prevm1 = jnp.full((P, N_STATE + 1, W), LOG_ZERO, jnp.float32)
    _, _, out = jax.lax.fori_loop(1, D + 1, step, (prevm1, init0, out))
    return out


def _rev_pad(codes: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    out = np.full_like(codes, 4)
    for p in range(codes.shape[0]):
        L = int(lengths[p])
        out[p, :L] = codes[p, :L][::-1]
    return out


def _np_logsumexp(v, axis=None):
    m = np.max(v, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(v - m), axis=axis, keepdims=True))
    return np.squeeze(out, axis=axis) if axis is not None else float(out.reshape(()))


def pair_fwd_bwd(seqs_x: list[str], seqs_y: list[str], Lmax: int | None = None):
    """Run both sweeps for a batch of pairs. Returns (fwd_diags, w_diags,
    lx, ly) as numpy arrays; see posterior helpers below.

    Shapes are bucketed (P to the next power of two, Lmax to a multiple of
    32) so repeated cluster alignments reuse the jitted kernels instead of
    recompiling per exact size."""
    P = len(seqs_x)
    lx = np.array([len(s) for s in seqs_x])
    ly = np.array([len(s) for s in seqs_y])
    if Lmax is None:
        Lmax = int(max(lx.max(initial=1), ly.max(initial=1)))
        Lmax = ((Lmax + 31) // 32) * 32
    Pb = 1 << (P - 1).bit_length() if P > 1 else 1
    X = np.full((Pb, Lmax), 4, np.int8)
    Y = np.full((Pb, Lmax), 4, np.int8)
    for p in range(P):
        X[p, : lx[p]] = encode_seq(seqs_x[p])
        Y[p, : ly[p]] = encode_seq(seqs_y[p])
    lxp = np.concatenate([lx, np.zeros(Pb - P, lx.dtype)])
    lyp = np.concatenate([ly, np.zeros(Pb - P, ly.dtype)])

    _, trans6, _, _ = nucleo_params()
    fwd = np.asarray(_diag_dp(jnp.asarray(X), jnp.asarray(Y), trans6, Lmax))
    w = np.asarray(
        _diag_dp(
            jnp.asarray(_rev_pad(X, lxp)), jnp.asarray(_rev_pad(Y, lyp)),
            _trans_reversed(), Lmax,
        )
    )
    return fwd, w, lx, ly


def posterior_from_sweeps(fwd, w, lx: int, ly: int, p: int) -> tuple[np.ndarray, float]:
    """Dense [lx, ly] match posterior (sparsified at 0.01) and total log
    probability for pair p of a batch from pair_fwd_bwd."""
    start, trans6, _, _ = nucleo_params()
    startv = np.asarray(start)
    trans = np.asarray(trans6)

    iidx = np.arange(1, lx + 1)
    jidx = np.arange(1, ly + 1)
    FM = fwd[iidx[:, None] + jidx[None, :], p, M, iidx[:, None]]

    a = lx - iidx  # [lx]
    b = ly - jidx  # [ly]
    # Bwd_M(i,j) = logsumexp_s'(trans[M][s'] + W[s'][a][b]); (0,0)->start[M]
    Wall = w[a[:, None] + b[None, :], p, :, a[:, None]]  # [lx, ly, 5]
    BM = _np_logsumexp(Wall + trans[M][None, None, :], axis=2)
    BM[-1, -1] = startv[M]  # (a, b) == (0, 0)

    Fend = fwd[lx + ly, p, :, lx]
    total = _np_logsumexp(Fend + startv)

    post = np.exp(np.minimum(FM + BM - total, 0.0))
    post[post < MIN_SPARSE_PROB] = 0.0
    return post.astype(np.float32), total


def pair_posteriors(seqs_x: list[str], seqs_y: list[str]) -> list[np.ndarray]:
    """Match posterior matrices for a batch of sequence pairs."""
    fwd, w, lx, ly = pair_fwd_bwd(seqs_x, seqs_y)
    return [
        posterior_from_sweeps(fwd, w, int(lx[p]), int(ly[p]), p)[0]
        for p in range(len(seqs_x))
    ]
