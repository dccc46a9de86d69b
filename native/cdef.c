/* CDEF direction search, strength-candidate MSE search, and filter apply.
 *
 * Host-native counterpart of cdef.c / enc_cdef.c, operating on the same
 * full-grid padded-plane layout as ops/cdef.py and device/cdef.py
 * (border 2px of CDEF_VERY_LARGE outside the coded area, nv8p x nh8p
 * 8x8-unit grid padded to whole 64x64 filter blocks, per-unit mask).
 * Arithmetic is integer-exact vs the numpy reference (dirs/var/filter);
 * the luma distortion uses the same double formula as dist_8x8_luma.
 */
#include <stdint.h>
#include <string.h>
#include <math.h>

#define VERY_LARGE 30000

/* Cdef_Directions (dy, dx) for k = 0, 1 (cdef.c:99-120) */
static const int DY[8][2] = {
    {-1,-2},{0,-1},{0,0},{0,1},{1,2},{1,2},{1,2},{1,2}};
static const int DX[8][2] = {
    {1,2},{1,2},{1,2},{1,2},{1,2},{0,1},{0,0},{0,-1}};

static inline int msb32(uint32_t v) { return 31 - __builtin_clz(v); }

static inline int constrain(int diff, int strength, int damping) {
    if (!strength) return 0;
    int shift = damping - msb32((uint32_t)strength);
    if (shift < 0) shift = 0;
    int ad = diff < 0 ? -diff : diff;
    int m = strength - (ad >> shift);
    if (m < 0) m = 0;
    int v = ad < m ? ad : m;
    return diff < 0 ? -v : v;
}

static inline int adjust_strength(int strength, int32_t var) {
    if (!var) return 0;
    int v6 = var >> 6;
    int i = v6 > 0 ? (msb32((uint32_t)v6) < 12 ? msb32((uint32_t)v6) : 12) : 0;
    return (strength * (4 + i) + 8) >> 4;
}

/* integer-exact direction + variance for one 8x8 block */
static void find_dir(const int32_t *p, int stride, int cs,
                     int32_t *out_dir, int32_t *out_var) {
    static const int div_table[9] = {0, 840, 420, 280, 210, 168, 140, 120, 105};
    int64_t partial[8][15];
    memset(partial, 0, sizeof(partial));
    for (int i = 0; i < 8; i++) {
        for (int j = 0; j < 8; j++) {
            int64_t x = (p[i * stride + j] >> cs) - 128;
            partial[0][i + j] += x;
            partial[1][i + j / 2] += x;
            partial[2][i] += x;
            partial[3][3 + i - j / 2] += x;
            partial[4][7 + i - j] += x;
            partial[5][3 - i / 2 + j] += x;
            partial[6][j] += x;
            partial[7][i / 2 + j] += x;
        }
    }
    int64_t cost[8];
    for (int d = 0; d < 8; d++) cost[d] = 0;
    for (int d = 2; d < 8; d += 4)
        for (int i = 0; i < 8; i++)
            cost[d] += partial[d][i] * partial[d][i] * div_table[8];
    for (int d = 0; d < 8; d += 4) {
        cost[d] = partial[d][7] * partial[d][7] * div_table[8];
        for (int i = 0; i < 7; i++)
            cost[d] += (partial[d][i] * partial[d][i] +
                        partial[d][14 - i] * partial[d][14 - i]) *
                       div_table[i + 1];
    }
    for (int d = 1; d < 8; d += 2) {
        for (int i = 3; i < 8; i++)
            cost[d] += partial[d][i] * partial[d][i] * div_table[8];
        for (int j = 0; j < 3; j++)
            cost[d] += (partial[d][j] * partial[d][j] +
                        partial[d][10 - j] * partial[d][10 - j]) *
                       div_table[2 * j + 2];
    }
    int best = 0;
    int64_t best_cost = 0;
    for (int d = 0; d < 8; d++)
        if (cost[d] > best_cost) { best_cost = cost[d]; best = d; }
    *out_dir = best;
    *out_var = (int32_t)((best_cost - cost[(best + 4) & 7]) >> 10);
}

void svt_cdef_dirs(const int32_t *pad_y, int stride, int nv8p, int nh8p,
                   int cs, int32_t *dirs, int32_t *var) {
    for (int by = 0; by < nv8p; by++)
        for (int bx = 0; bx < nh8p; bx++) {
            const int32_t *p = pad_y + (size_t)(2 + by * 8) * stride + 2 + bx * 8;
            find_dir(p, stride, cs, &dirs[by * nh8p + bx],
                     &var[by * nh8p + bx]);
        }
}

static const int PRI_TAPS[2][2] = {{4, 2}, {3, 3}};
static const int SEC_TAPS[2] = {2, 1};

/* filter one bs x bs block (svt_cdef_filter_block_c) */
static void filter_block(const int32_t *p, int stride, int bs, int dir,
                         int pri, int sec, int pri_damp, int sec_damp,
                         int cs, int32_t *out /* bs*bs */) {
    if (!pri && !sec) { /* identity: sum 0, clamp window contains x */
        for (int r = 0; r < bs; r++)
            for (int c = 0; c < bs; c++)
                out[r * bs + c] = p[r * stride + c];
        return;
    }
    const int *pt = PRI_TAPS[(pri >> cs) & 1];
    for (int r = 0; r < bs; r++) {
        for (int c = 0; c < bs; c++) {
            int x = p[r * stride + c];
            int mn = x, mx = x, sum = 0;
            for (int k = 0; k < 2; k++) {
                int dy = DY[dir][k], dx = DX[dir][k];
                int p0 = p[(r + dy) * stride + c + dx];
                int p1 = p[(r - dy) * stride + c - dx];
                if (pri) {
                    sum += pt[k] * constrain(p0 - x, pri, pri_damp);
                    sum += pt[k] * constrain(p1 - x, pri, pri_damp);
                }
                if (p0 != VERY_LARGE && p0 > mx) mx = p0;
                if (p1 != VERY_LARGE && p1 > mx) mx = p1;
                if (p0 < mn) mn = p0;
                if (p1 < mn) mn = p1;
                for (int s = 0; s < 2; s++) {
                    int dd = s == 0 ? (dir + 2) & 7 : (dir - 2) & 7;
                    int sy = DY[dd][k], sx = DX[dd][k];
                    int s0 = p[(r + sy) * stride + c + sx];
                    int s1 = p[(r - sy) * stride + c - sx];
                    if (sec) {
                        sum += SEC_TAPS[k] * constrain(s0 - x, sec, sec_damp);
                        sum += SEC_TAPS[k] * constrain(s1 - x, sec, sec_damp);
                    }
                    if (s0 != VERY_LARGE && s0 > mx) mx = s0;
                    if (s1 != VERY_LARGE && s1 > mx) mx = s1;
                    if (s0 < mn) mn = s0;
                    if (s1 < mn) mn = s1;
                }
            }
            int y = x + ((8 + sum - (sum < 0)) >> 4);
            if (y < mn) y = mn;
            if (y > mx) y = mx;
            out[r * bs + c] = y;
        }
    }
}

/* dist_8xn (enc_cdef.c:76-100) */
static int64_t dist_8x8(const int32_t *s, int sstride, const int32_t *d,
                        int cs) {
    int64_t sum_s = 0, sum_d = 0, sum_s2 = 0, sum_d2 = 0, sum_sd = 0;
    for (int r = 0; r < 8; r++)
        for (int c = 0; c < 8; c++) {
            int64_t a = s[r * sstride + c], b = d[r * 8 + c];
            sum_s += a; sum_d += b;
            sum_s2 += a * a; sum_d2 += b * b; sum_sd += a * b;
        }
    double svar = (double)(sum_s2 - (sum_s * sum_s + 32) / 64);
    double dvar = (double)(sum_d2 - (sum_d * sum_d + 32) / 64);
    double num = (double)(sum_d2 + sum_s2 - 2 * sum_sd) * 0.5 *
                 (svar + dvar + (double)(400 << (2 * cs)));
    double den = sqrt((double)((int64_t)20000 << (4 * cs)) + svar * dvar);
    return (int64_t)floor(0.5 + num / den);
}

/* search: accumulate per-fb MSE for every candidate strength */
void svt_cdef_search(const int32_t *pad_y, int ystride,
                     const int32_t *pad_u, const int32_t *pad_v, int cstride,
                     const int32_t *src_y, int systride,
                     const int32_t *src_u, const int32_t *src_v, int scstride,
                     const uint8_t *mask, int nv8p, int nh8p, int nhfb,
                     const int32_t *dirs, const int32_t *var,
                     const int32_t *cands, int n_cand,
                     int ydamp, int cdamp, int cs, int chroma,
                     int64_t *mse0, int64_t *mse1 /* (nfb, n_cand) */) {
    int32_t buf[64];
    for (int by = 0; by < nv8p; by++) {
        for (int bx = 0; bx < nh8p; bx++) {
            int bi = by * nh8p + bx;
            if (!mask[bi]) continue;
            int fb = (by / 8) * nhfb + bx / 8;
            int d = dirs[bi];
            int32_t v = var[bi];
            const int32_t *py = pad_y + (size_t)(2 + by * 8) * ystride + 2 + bx * 8;
            const int32_t *sy = src_y + (size_t)(by * 8) * systride + bx * 8;
            for (int ci = 0; ci < n_cand; ci++) {
                int gi = cands[ci];
                int pri = gi / 4, sec = gi % 4;
                sec += sec == 3;
                int t = adjust_strength(pri << cs, v);
                filter_block(py, ystride, 8, pri ? d : 0, t, sec << cs,
                             ydamp, ydamp, cs, buf);
                mse0[(size_t)fb * n_cand + ci] += dist_8x8(sy, systride, buf, cs);
            }
            if (chroma) {
                const int32_t *pu = pad_u + (size_t)(2 + by * 4) * cstride + 2 + bx * 4;
                const int32_t *pv = pad_v + (size_t)(2 + by * 4) * cstride + 2 + bx * 4;
                const int32_t *su = src_u + (size_t)(by * 4) * scstride + bx * 4;
                const int32_t *sv = src_v + (size_t)(by * 4) * scstride + bx * 4;
                for (int ci = 0; ci < n_cand; ci++) {
                    int gi = cands[ci];
                    int pri = gi / 4, sec = gi % 4;
                    sec += sec == 3;
                    int64_t acc = 0;
                    const int32_t *pp[2] = {pu, pv};
                    const int32_t *ss[2] = {su, sv};
                    for (int pl = 0; pl < 2; pl++) {
                        filter_block(pp[pl], cstride, 4, pri ? d : 0,
                                     pri << cs, sec << cs, cdamp, cdamp,
                                     cs, buf);
                        for (int r = 0; r < 4; r++)
                            for (int c = 0; c < 4; c++) {
                                int64_t e = buf[r * 4 + c] -
                                            ss[pl][r * scstride + c];
                                acc += e * e;
                            }
                    }
                    mse1[(size_t)fb * n_cand + ci] += acc >> (2 * cs);
                }
            }
        }
    }
}

/* apply chosen per-block strengths in place on the UNPADDED recon planes */
void svt_cdef_apply(const int32_t *pad_y, int ystride,
                    const int32_t *pad_u, const int32_t *pad_v, int cstride,
                    int32_t *rec_y, int rystride, int h, int w,
                    int32_t *rec_u, int32_t *rec_v, int rcstride,
                    int hc, int wc,
                    const uint8_t *mask, int nv8p, int nh8p,
                    const int32_t *dirs, const int32_t *var,
                    const int32_t *y_gi, const int32_t *uv_gi,
                    int ydamp, int cdamp, int cs, int chroma) {
    int32_t buf[64];
    for (int by = 0; by < nv8p; by++) {
        for (int bx = 0; bx < nh8p; bx++) {
            int bi = by * nh8p + bx;
            if (!mask[bi]) continue;
            int d = dirs[bi];
            int gi = y_gi[bi];
            if (gi) {
                int pri = gi / 4, sec = gi % 4;
                sec += sec == 3;
                int t = adjust_strength(pri << cs, var[bi]);
                const int32_t *py = pad_y + (size_t)(2 + by * 8) * ystride +
                                    2 + bx * 8;
                filter_block(py, ystride, 8, pri ? d : 0, t, sec << cs,
                             ydamp, ydamp, cs, buf);
                for (int r = 0; r < 8 && by * 8 + r < h; r++)
                    for (int c = 0; c < 8 && bx * 8 + c < w; c++)
                        rec_y[(size_t)(by * 8 + r) * rystride + bx * 8 + c] =
                            buf[r * 8 + c];
            }
            if (chroma && uv_gi[bi]) {
                int gic = uv_gi[bi];
                int pri = gic / 4, sec = gic % 4;
                sec += sec == 3;
                int32_t *rr[2] = {rec_u, rec_v};
                const int32_t *pp[2] = {
                    pad_u + (size_t)(2 + by * 4) * cstride + 2 + bx * 4,
                    pad_v + (size_t)(2 + by * 4) * cstride + 2 + bx * 4};
                for (int pl = 0; pl < 2; pl++) {
                    filter_block(pp[pl], cstride, 4, pri ? d : 0,
                                 pri << cs, sec << cs, cdamp, cdamp, cs, buf);
                    for (int r = 0; r < 4 && by * 4 + r < hc; r++)
                        for (int c = 0; c < 4 && bx * 4 + c < wc; c++)
                            rr[pl][(size_t)(by * 4 + r) * rcstride +
                                   bx * 4 + c] = buf[r * 4 + c];
                }
            }
        }
    }
}
