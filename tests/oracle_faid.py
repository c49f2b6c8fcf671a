"""Scalar re-expression of the reference's LUT FAID
(``LDPC_dec/ldpc/dec.cpp:837-1171``) used as a fuzz oracle: literal
per-edge loops over a dense H, including the decision rule's sign(0)=+1
and the tie branch (decoded[j] = recv[j], which check()'s ``if (u[j])``
reads as a set bit either way -> effective bit 1)."""

import numpy as np


def lut_apply(table, s, m1, m2, y):
    # Variable_FAID_LUT (dec.cpp:1135-1171): odd symmetry around y
    if y >= 0:
        m1, m2 = -m1, -m2
    v = table[int(m1) + s][int(m2) + s]
    if y >= 0:
        v = -v
    return v


def faid_decode_oracle(H, recv, max_iter, table, C, weights=None):
    """H: [M, N] dense 0/1 (dv=3); recv: [N] +/-1 ints.

    Returns (bits [N] effective 0/1, success, iterations)."""
    H = np.asarray(H)
    M, N = H.shape
    s = (len(table) - 1) // 2
    if weights is None:
        weights = [1.0] * (s + 1)
    rows_of_col = [np.nonzero(H[:, j])[0] for j in range(N)]
    cols_of_row = [np.nonzero(H[i])[0] for i in range(M)]

    # Init_FAID
    v2c = {}
    decoded = np.where(np.asarray(recv) >= 0, 0, 1).astype(int)
    for j in range(N):
        for i in rows_of_col[j]:
            v2c[(i, j)] = 1 if recv[j] >= 0 else -1

    c2v = {}
    n = 0
    while True:
        c = int(((H @ (decoded % 2)) % 2).sum())
        if n == max_iter or c == 0:
            break
        # Check_Update_FAID: exclusive sign x min (sign(0) = +1)
        for i in range(M):
            for j in cols_of_row[i]:
                sign, mag = 1, 999
                for j2 in cols_of_row[i]:
                    if j2 == j:
                        continue
                    sign *= 1 if v2c[(i, j2)] >= 0 else -1
                    mag = min(mag, abs(v2c[(i, j2)]))
                c2v[(i, j)] = sign * mag
        # Variable_Update_FAID: LUT over the other two incoming messages
        for j in range(N):
            for i in rows_of_col[j]:
                others = [c2v[(i2, j)] for i2 in rows_of_col[j] if i2 != i]
                assert len(others) == 2, "LUT FAID requires dv = 3"
                v2c[(i, j)] = lut_apply(table, s, others[0], others[1], recv[j])
        # Decision_FAID
        for j in range(N):
            total = float(recv[j]) * C
            for i in rows_of_col[j]:
                m = c2v[(i, j)]
                total += (1.0 if m >= 0 else -1.0) * weights[abs(int(m))]
            if total > 0:
                decoded[j] = 0
            elif total < 0:
                decoded[j] = 1
            else:
                # literal: decoded[j] = recv[j] (+/-1) -> check() sees 1
                decoded[j] = 1
        n += 1
    return decoded % 2, c == 0, n
