"""Literal re-expression of the reference's per-cluster LLR rules
(ex_decoder/decoder.py:155-324) used as a fuzz oracle: plain strings and
loops, following the reference control flow statement by statement."""

import math


def dna2binary_str(s):
    # def_func.py:97-117: per base "b b " pairs, '2 2' for non-ACGT
    out = ""
    for ch in s:
        out += {"A": "0 0", "C": "0 1", "G": "1 0", "T": "1 1"}.get(ch, "2 2") + " "
    return out


def edit_dist(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        dp[i][0] = i
    for j in range(1, len(b) + 1):
        dp[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                dp[i][j] = dp[i - 1][j - 1]
            else:
                dp[i][j] = min(dp[i - 1][j - 1], dp[i - 1][j], dp[i][j - 1]) + 1
    return dp[-1][-1]


def oracle_cluster_llr(DNA_cand, q_272, epsil, aligner):
    """Returns list of 272 LLRs, or None for an erasure strand.

    ``aligner(seqs)`` -> list of (ordinal, aligned_row) like the pipeline's.
    """
    mag = math.log((1 - epsil) / epsil)
    DNA_LLR = [0 for _ in range(272)]
    r_q_272, r_DNA_cand, q_272_2 = [], [], []
    aligned_DNA = []
    error_q = []
    LLR_cand = []

    if len(DNA_cand) != 1:
        test_len = sum(1 for r in DNA_cand if len(r) == 136)
        if test_len == len(DNA_cand):
            r_DNA_cand = DNA_cand
            r_q_272 = q_272
            LLR_cand = [dna2binary_str(r) for r in r_DNA_cand]
        else:
            same_seq = []
            for i in range(len(DNA_cand)):
                for k in range(i + 1, len(DNA_cand)):
                    if edit_dist(DNA_cand[i], DNA_cand[k]) < 15:
                        same_seq.append(i)
                        same_seq.append(k)
            for i in sorted(set(same_seq)):
                r_DNA_cand.append(DNA_cand[i])
                q_272_2.append(q_272[i])
            if len(r_DNA_cand) == 0:
                return None
            for ordinal, row in aligner(r_DNA_cand):
                if len(row) != 136:
                    error_q.append([q_272_2[ordinal], row[len(row) - 1]])
                    continue
                r_q_272.append(q_272_2[ordinal])
                aligned_DNA.append(row)
            LLR_cand = [dna2binary_str(r) for r in aligned_DNA]
    else:
        r_DNA_cand = DNA_cand
        r_q_272 = q_272
        if len(r_DNA_cand[0]) < 136:
            s = dna2binary_str(r_DNA_cand[0]).replace(" ", "")
            if r_q_272[0] > 63:
                if s[len(s) - 1] == "0":
                    DNA_LLR[271] = mag
                else:
                    DNA_LLR[271] = -mag
            return DNA_LLR
        else:
            LLR_cand = [dna2binary_str(r) for r in r_DNA_cand]

    count_0 = count_1 = 0
    q_count_0 = q_count_1 = 0
    for i in range(272):
        if len(LLR_cand) == 0:
            for e in range(len(error_q)):
                if error_q[e][0] > 63:
                    t2 = dna2binary_str(error_q[e][1]).replace(" ", "")
                    if t2[1] == "0":
                        count_0 += 1
                    else:
                        count_1 += 1
            DNA_LLR[271] = (count_0 - count_1) * mag
            break
        for j in range(len(LLR_cand)):
            s = LLR_cand[j].replace(" ", "")
            if (i == 271) and (r_q_272[j] < 53):
                continue
            if s[i] == "0":
                count_0 += 1
                q_count_0 += r_q_272[j]
            else:
                count_1 += 1
                q_count_1 += r_q_272[j]
        if (i == 271) and (count_0 == 1) and (count_1 == 1):
            if (q_count_0 < 53) and (q_count_1 >= 63):
                DNA_LLR[i] = -2 * mag
            elif (q_count_0 >= 63) and (q_count_1 < 53):
                DNA_LLR[i] = 2 * mag
            else:
                DNA_LLR[i] = 0
        else:
            DNA_LLR[i] = (count_0 - count_1) * mag
        q_count_0 = q_count_1 = 0
        count_0 = count_1 = 0
    return DNA_LLR
