"""Scalar float64 pair-HMM forward/backward oracle following the reference
recurrences (MUSCLE/src/fwdflat3.cpp, bwdflat3.cpp, totalprobflat.cpp,
calcposteriorflat.cpp) literally, for validating the batched antidiagonal
implementation."""

import numpy as np

M, IX, IY, JX, JY = 0, 1, 2, 3, 4
LOG_ZERO = -1e30


def _params():
    start = np.full(5, LOG_ZERO)
    start[M] = np.log(0.6)
    start[IX] = start[IY] = np.log(0.02)
    start[JX] = start[JY] = np.log(0.18)
    trans = np.full((5, 5), LOG_ZERO)
    trans[M, M] = np.log(0.96)
    for s in (IX, IY):
        trans[M, s] = np.log(0.012)
        trans[s, s] = np.log(0.35)
        trans[s, M] = np.log(0.65)
    for s in (JX, JY):
        trans[M, s] = np.log(0.008)
        trans[s, s] = np.log(0.90)
        trans[s, M] = np.log(0.10)
    emit = np.full((4, 4), 0.044)
    np.fill_diagonal(emit, 0.12)
    match = np.full((5, 5), np.log(1 / 16))
    match[:4, :4] = np.log(emit)
    ins = np.full(5, np.log(0.25))
    ins[:4] = np.log(emit.sum(1))
    return start, trans, match, ins


def _lse(*vals):
    v = np.array(vals)
    m = v.max()
    if m <= LOG_ZERO / 2:
        return LOG_ZERO
    return m + np.log(np.exp(v - m).sum())


def _enc(s):
    return np.array(["ACGT".index(c) if c in "ACGT" else 4 for c in s])


def oracle_fwd(xs, ys):
    start, trans, match, ins = _params()
    X, Y = _enc(xs), _enc(ys)
    LX, LY = len(X), len(Y)
    F = np.full((LX + 1, LY + 1, 5), LOG_ZERO)
    for i in range(LX + 1):
        for j in range(LY + 1):
            if i == 0 and j == 0:
                continue
            if i >= 1 and j >= 1:
                if i == 1 and j == 1:
                    F[1, 1, M] = start[M] + match[X[0], Y[0]]
                else:
                    F[i, j, M] = (
                        _lse(*[F[i - 1, j - 1, s] + trans[s, M] for s in range(5)])
                        + match[X[i - 1], Y[j - 1]]
                    )
            if i >= 1:
                for s in (IX, JX):
                    prev = _lse(F[i - 1, j, M] + trans[M, s], F[i - 1, j, s] + trans[s, s])
                    if i == 1 and j == 0:
                        prev = start[s]
                    F[i, j, s] = prev + ins[X[i - 1]]
            if j >= 1:
                for s in (IY, JY):
                    prev = _lse(F[i, j - 1, M] + trans[M, s], F[i, j - 1, s] + trans[s, s])
                    if i == 0 and j == 1:
                        prev = start[s]
                    F[i, j, s] = prev + ins[Y[j - 1]]
    return F


def oracle_bwd(xs, ys):
    start, trans, match, ins = _params()
    X, Y = _enc(xs), _enc(ys)
    LX, LY = len(X), len(Y)
    B = np.full((LX + 1, LY + 1, 5), LOG_ZERO)
    B[LX, LY, :] = start
    for i in range(LX, -1, -1):
        for j in range(LY, -1, -1):
            if i == LX and j == LY:
                continue
            for s in range(5):
                terms = []
                if i < LX and j < LY:
                    terms.append(trans[s, M] + match[X[i], Y[j]] + B[i + 1, j + 1, M])
                if i < LX:
                    for t in (IX, JX):
                        terms.append(trans[s, t] + ins[X[i]] + B[i + 1, j, t])
                if j < LY:
                    for t in (IY, JY):
                        terms.append(trans[s, t] + ins[Y[j]] + B[i, j + 1, t])
                B[i, j, s] = _lse(*terms) if terms else LOG_ZERO
    return B


def oracle_posterior(xs, ys):
    start, _, _, _ = _params()
    F = oracle_fwd(xs, ys)
    B = oracle_bwd(xs, ys)
    LX, LY = len(xs), len(ys)
    total = _lse(*[F[LX, LY, s] + B[LX, LY, s] - start[s] + start[s] for s in range(5)])
    # NB: per totalprobflat.cpp total = lse_s(F + B) at (LX, LY); B there is
    # the start/end factor itself.
    total = _lse(*[F[LX, LY, s] + B[LX, LY, s] for s in range(5)])
    post = np.exp(F[1:, 1:, M] + B[1:, 1:, M] - total)
    post[post < 0.01] = 0.0
    return post, total
