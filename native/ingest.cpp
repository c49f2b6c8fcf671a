// Host-side ingest kernels for the DNA-storage decoding pipeline.
//
// The reference delegated its hot loops to native executables (ldpc.exe,
// MUSCLE.exe, rs_dec.exe); in this framework the device-side compute moved
// to TPU kernels, and this library is the native half that remains on the
// host: per-cluster LLR vote counting over raw read buffers and batched
// Levenshtein edit distance for the cluster pre-filter
// (ex_decoder/decoder.py:163-324 counting rules; def_func.py:10-26 DP).
// Exposed via a C ABI for ctypes; the Python layer keeps a pure-numpy
// fallback with identical semantics.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// Bit value of payload byte: A->0/0, C->0/1, G->1/0, T->1/1, other->2/2.
// (def_func.py:97-117). hi = bit 2k, lo = bit 2k+1.
static inline void base_bits(uint8_t b, int* hi, int* lo) {
    switch (b) {
        case 'A': *hi = 0; *lo = 0; break;
        case 'C': *hi = 0; *lo = 1; break;
        case 'G': *hi = 1; *lo = 0; break;
        case 'T': *hi = 1; *lo = 1; break;
        default:  *hi = 2; *lo = 2; break;
    }
}

// Count per-bit votes for one "countable" cluster (all reads exactly 136nt
// with >1 read, or a single read >= 136nt) and write its 272 LLRs.
// Implements the counting rules of decoder.py:266-324: '0' votes zero,
// anything else (including gap symbol 2) votes one; bit 271 excludes
// reads with quality < 53 and applies the literal two-vote quality rule
// (dead +/-2 branches preserved).
static void count_cluster(const uint8_t* bytes, const int64_t* offs,
                          const int32_t* lens, const int64_t* quals,
                          int64_t lo, int64_t hi, double mag, double* out272) {
    int c0[272] = {0}, c1[272] = {0};
    int c0_last = 0, c1_last = 0;
    long q0_last = 0, q1_last = 0;
    for (int64_t r = lo; r < hi; ++r) {
        const uint8_t* s = bytes + offs[r];
        const int L = lens[r] < 136 ? lens[r] : 136;
        for (int k = 0; k < L; ++k) {
            int hib, lob;
            base_bits(s[k], &hib, &lob);
            int i0 = 2 * k, i1 = 2 * k + 1;
            if (i0 < 271) { if (hib == 0) c0[i0]++; else c1[i0]++; }
            if (i1 < 271) { if (lob == 0) c0[i1]++; else c1[i1]++; }
            // bit 271 handled below with the quality filter
            if (i1 == 271 || i0 == 271) {
                int v = (i1 == 271) ? lob : hib;
                if (quals[r] >= 53) {
                    if (v == 0) { c0_last++; q0_last += quals[r]; }
                    else        { c1_last++; q1_last += quals[r]; }
                }
            }
        }
    }
    for (int i = 0; i < 271; ++i) out272[i] = (c0[i] - c1[i]) * mag;
    if (c0_last == 1 && c1_last == 1) {
        if (q0_last < 53 && q1_last >= 63)       out272[271] = -2 * mag;  // dead
        else if (q0_last >= 63 && q1_last < 53)  out272[271] = 2 * mag;   // dead
        else                                     out272[271] = 0.0;
    } else {
        out272[271] = (c0_last - c1_last) * mag;
    }
}

// Process all clusters of a trial that don't need MSA.
//   reads sorted by strand; cluster c spans [starts[c], ends[c]).
//   status[c]: 0 = handled here, 1 = needs the Python/MSA path.
// Handled cases: multi-read all-136; single read >= 136; single read < 136
// (bit-271-only rule, decoder.py:237-261).
void count_trial_llrs(const uint8_t* bytes, const int64_t* offs,
                      const int32_t* lens, const int64_t* quals,
                      const int64_t* starts, const int64_t* ends,
                      const int32_t* strand_of_cluster, int64_t n_clusters,
                      double mag, double* llr_out /* [18432*272] */,
                      int32_t* status) {
    for (int64_t c = 0; c < n_clusters; ++c) {
        int64_t lo = starts[c], hi = ends[c];
        int64_t k = hi - lo;
        double* out = llr_out + (int64_t)strand_of_cluster[c] * 272;
        if (k == 1) {
            if (lens[lo] < 136) {
                // single short read: bit 271 from the read's last bit if q>63
                std::memset(out, 0, 272 * sizeof(double));
                if (quals[lo] > 63 && lens[lo] > 0) {
                    int hib, lob;
                    base_bits(bytes[offs[lo] + lens[lo] - 1], &hib, &lob);
                    out[271] = (lob == 0) ? mag : -mag;
                }
                status[c] = 0;
            } else {
                count_cluster(bytes, offs, lens, quals, lo, hi, mag, out);
                status[c] = 0;
            }
            continue;
        }
        bool all136 = true;
        for (int64_t r = lo; r < hi; ++r)
            if (lens[r] != 136) { all136 = false; break; }
        if (all136) {
            count_cluster(bytes, offs, lens, quals, lo, hi, mag, out);
            status[c] = 0;
        } else {
            status[c] = 1;  // mixed-length: edit filter + MSA in Python/TPU
        }
    }
}

// Batched exact Levenshtein distance (unit costs), one row-DP per pair.
void edit_distance_batch(const uint8_t* bytes, const int64_t* offs,
                         const int32_t* lens, const int32_t* pa,
                         const int32_t* pb, int64_t n_pairs, int32_t* out) {
    std::vector<int32_t> prev, cur;
    for (int64_t p = 0; p < n_pairs; ++p) {
        const uint8_t* A = bytes + offs[pa[p]];
        const uint8_t* B = bytes + offs[pb[p]];
        const int la = lens[pa[p]], lb = lens[pb[p]];
        prev.assign(lb + 1, 0);
        cur.assign(lb + 1, 0);
        for (int j = 0; j <= lb; ++j) prev[j] = j;
        for (int i = 1; i <= la; ++i) {
            cur[0] = i;
            const uint8_t a = A[i - 1];
            for (int j = 1; j <= lb; ++j) {
                int sub = prev[j - 1] + (a != B[j - 1]);
                int del = prev[j] + 1;
                int ins = cur[j - 1] + 1;
                cur[j] = std::min(sub, std::min(del, ins));
            }
            std::swap(prev, cur);
        }
        out[p] = prev[lb];
    }
}

// Paired-end overlap scoring (pipeline/ingest.py merge_pairs hot loop):
// for each pair, try every overlap length o in [min_o, min(l1,l2)] of
// R1's suffix vs rc(R2)'s prefix; keep the lowest mismatch density
// (ties -> longer overlap). 'N' positions are uninformative. m1/m2 are
// [n, L] right-padded byte matrices (m2 already reverse-complemented).
void merge_overlap_batch(const uint8_t* m1, const uint8_t* m2,
                         const int64_t* l1, const int64_t* l2,
                         int64_t n, int64_t L, int32_t min_o,
                         int64_t* best_o, int64_t* best_mm) {
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* a_row = m1 + i * L;
        const uint8_t* b_row = m2 + i * L;
        const int64_t max_o = l1[i] < l2[i] ? l1[i] : l2[i];
        double best_den = 1e300;
        int64_t bo = 0, bm = 0;
        for (int64_t o = min_o; o <= max_o; ++o) {
            const uint8_t* a = a_row + (l1[i] - o);
            int64_t mm = 0;
            for (int64_t p = 0; p < o; ++p) {
                const uint8_t x = a[p], y = b_row[p];
                mm += (x != y) & (x != 'N') & (y != 'N');
            }
            const double den = (double)mm / (double)o;
            // same tolerance rule as the numpy path: strictly better, or
            // within 1e-12 (tie) -> the later (longer) overlap wins
            if (den < best_den - 1e-12 || (den <= best_den + 1e-12 && den >= best_den - 1e-12)) {
                best_den = den;
                bo = o;
                bm = mm;
            }
        }
        best_o[i] = bo;
        best_mm[i] = bm;
    }
}

// Maximum-expected-accuracy alignment DP over a posterior matrix
// (MUSCLE calcalnflat.cpp / tracebackflat.cpp): score recurrence
// best(diag + post, up, left) with tie preference B >= X >= Y (best3.h),
// traceback path written as 'B'/'X'/'Y' chars (caller allocates
// LX+LY chars; *path_len receives the actual length). tb_buf must hold
// (LX+1)*(LY+1) bytes of scratch.
void mea_align(const float* post, int32_t LX, int32_t LY, char* tb_buf,
               char* path_out, int32_t* path_len, float* score_out) {
    const int W = LY + 1;
    std::vector<float> prev(W), cur(W);
    for (int j = 0; j <= LY; ++j) { prev[j] = 0.0f; tb_buf[j] = 'Y'; }
    for (int i = 1; i <= LX; ++i) {
        cur[0] = 0.0f;
        tb_buf[i * W] = 'X';
        const float* prow = post + (int64_t)(i - 1) * LY;
        for (int j = 1; j <= LY; ++j) {
            float B = prev[j - 1] + prow[j - 1];
            float X = prev[j];
            float Y = cur[j - 1];
            float best;
            char c;
            if (B >= X) {
                if (B >= Y) { best = B; c = 'B'; }
                else        { best = Y; c = 'Y'; }
            } else if (X >= Y) { best = X; c = 'X'; }
            else               { best = Y; c = 'Y'; }
            cur[j] = best;
            tb_buf[i * W + j] = c;
        }
        std::swap(prev, cur);
    }
    *score_out = prev[LY];
    int i = LX, j = LY, n = 0;
    char* rev = path_out;
    while (i > 0 || j > 0) {
        char c = tb_buf[i * W + j];
        rev[n++] = c;
        if (c == 'B') { --i; --j; }
        else if (c == 'X') --i;
        else --j;
    }
    for (int k = 0; k < n / 2; ++k) std::swap(rev[k], rev[n - 1 - k]);
    *path_len = n;
}

// Score-only variant (CalcAlnScoreFlat) for EA distances.
void mea_score(const float* post, int32_t LX, int32_t LY, float* score_out) {
    const int W = LY + 1;
    std::vector<float> prev(W, 0.0f), cur(W, 0.0f);
    for (int i = 1; i <= LX; ++i) {
        cur[0] = 0.0f;
        const float* prow = post + (int64_t)(i - 1) * LY;
        for (int j = 1; j <= LY; ++j) {
            float B = prev[j - 1] + prow[j - 1];
            float X = prev[j];
            float Y = cur[j - 1];
            cur[j] = B >= X ? (B >= Y ? B : Y) : (X >= Y ? X : Y);
        }
        std::swap(prev, cur);
    }
    *score_out = prev[LY];
}

}  // extern "C"
