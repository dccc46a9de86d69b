/* rdoq.c — rate-distortion optimized quantization (coefficient trellis).
 *
 * Counterpart: svt_av1_optimize_b + update_coeff_{general,eob,simple} +
 * update_skip (reference full_loop.c:1127-1342, 847-1060).  Greedy
 * reverse-scan pass over one transform block's quantized coefficients:
 * each coefficient may keep its level, drop by one, become the new eob,
 * or the whole block may turn into a skip — whichever minimizes
 * rate*lambda + distortion under the frame-initial CDF cost tables.
 *
 * The cost tables are built in Python (codec/rdoq.py) from the same
 * frame CDF snapshot the RateCounter uses and registered per frame via
 * svt_rdoq_frame(); both the host MD path (ctypes, per txb) and the
 * native whole-frame commit pass (ecenc.c svt_txb_commit) call
 * svt_rdoq_txb().  Everything here is encoder-side decision making —
 * the written syntax stays conformant for any level choice.
 */

#include <stdint.h>
#include <string.h>

#define NUM_BASE_LEVELS 2
#define COEFF_BASE_RANGE 12
#define MAX_NZ_NUM 4
#define LV_STRIDE_PAD 4 /* TX_PAD_HOR */

/* ---- per-frame registry ------------------------------------------------ */

typedef struct {
    /* cost tables, 1/512-bit units, fixed layouts (see codec/rdoq.py):
     * base      (5,2,42,4)   base_eob (5,2,4,3)   lps (5,2,21,13)
     * eob_pt    (7,2,2,11)   eob_extra (5,2,22,2)
     * txb_skip  (5,13,2)     dc_sign  (2,3,2)                      */
    const int32_t *base, *base_eob, *lps, *eob_pt, *eob_extra;
    const int32_t *txb_skip, *dc_sign;
    int64_t lambda;     /* frame rdmult (codec.rd.compute_rdmult) */
    int sharpness_val;  /* CLIP3(0,7, cfg sharpness) */
    int sharp_tx;       /* PSYEX --sharp-tx */
    int use_sharpness;  /* vq sharpness ctrl (tune 0/3) */
    int base_q;
    int enabled;
} RdoqFrame;

static RdoqFrame g_rdoq;

void svt_rdoq_frame(const int32_t *base, const int32_t *base_eob,
                    const int32_t *lps, const int32_t *eob_pt,
                    const int32_t *eob_extra, const int32_t *txb_skip,
                    const int32_t *dc_sign, int64_t lambda,
                    int sharpness_val, int sharp_tx, int use_sharpness,
                    int base_q, int enabled) {
    g_rdoq.base = base;
    g_rdoq.base_eob = base_eob;
    g_rdoq.lps = lps;
    g_rdoq.eob_pt = eob_pt;
    g_rdoq.eob_extra = eob_extra;
    g_rdoq.txb_skip = txb_skip;
    g_rdoq.dc_sign = dc_sign;
    g_rdoq.lambda = lambda;
    g_rdoq.sharpness_val = sharpness_val;
    g_rdoq.sharp_tx = sharp_tx;
    g_rdoq.use_sharpness = use_sharpness;
    g_rdoq.base_q = base_q;
    g_rdoq.enabled = enabled;
}

int svt_rdoq_enabled(void) { return g_rdoq.enabled; }

void svt_rdoq_off(void) { g_rdoq.enabled = 0; }

/* per-tx-size metadata for the whole-frame commit pass (set once per
 * process from codec/rdoq.py): 2D-class nz-map ctx offsets + entropy
 * tx-size context */
static const int32_t *g_nz_off2d[19];
static int g_tsc[19];

void svt_rdoq_tx_meta(int tx, int txs_ctx, const int32_t *nz_off) {
    if (tx >= 0 && tx < 19) {
        g_tsc[tx] = txs_ctx;
        g_nz_off2d[tx] = nz_off;
    }
}

int32_t svt_rdoq_txb(int txs_ctx, int ptype, int is_inter, int tx_class,
                     const int32_t *tcoeff, int32_t *qcoeff,
                     int32_t *dqcoeff, int32_t eob, const int32_t *scan,
                     int cw, int ch, const int32_t *nz_off, int shift,
                     int32_t dqv_dc, int32_t dqv_ac, const int32_t *iqm,
                     int txb_skip_ctx, int dc_sign_ctx, int qindex,
                     int eob_multi_size);

/* commit-pass entry: DCT_DCT (class 2D), neutral skip/dc-sign contexts */
int32_t svt_rdoq_commit_txb(int tx_enum, int plane, int is_inter,
                            int qindex, const int32_t *tcoeff,
                            int32_t *qcoeff, int32_t *dqcoeff, int32_t eob,
                            const int32_t *scan, int cw, int ch, int shift,
                            int32_t dqv_dc, int32_t dqv_ac) {
    if (!g_rdoq.enabled || !g_nz_off2d[tx_enum]) return eob;
    int ems = 0, v = cw * ch;
    while ((16 << ems) < v) ems++;
    return svt_rdoq_txb(g_tsc[tx_enum], plane ? 1 : 0, is_inter, 0, tcoeff,
                        qcoeff, dqcoeff, eob, scan, cw, ch,
                        g_nz_off2d[tx_enum], shift, dqv_dc, dqv_ac, 0, 0,
                        0, qindex, ems);
}

/* ---- cost helpers ------------------------------------------------------ */

/* RDCOST shape (rd_cost.h:37): rate in 1/512 bits, dist in SSE units */
static inline int64_t rdc(int64_t rm, int64_t rate, int64_t dist) {
    return (((rate * rm) + 256) >> 9) + (dist << 7);
}

static inline int64_t cdist(int64_t t, int64_t dq, int shift) {
    const int64_t d = (t - dq) << shift;
    return d * d;
}

static inline int msb32(uint32_t v) {
    int n = 0;
    while (v > 1) { v >>= 1; n++; }
    return n;
}

static inline int golomb_cost(int level) {
    if (level >= 1 + NUM_BASE_LEVELS + COEFF_BASE_RANGE) {
        const int r = level - COEFF_BASE_RANGE - NUM_BASE_LEVELS;
        return (2 * (msb32((uint32_t)r) + 1) - 1) << 9;
    }
    return 0;
}

static inline int br_cost(int level, const int32_t *lps_row) {
    int br = level - 1 - NUM_BASE_LEVELS;
    if (br > COEFF_BASE_RANGE) br = COEFF_BASE_RANGE;
    return lps_row[br] + golomb_cost(level);
}

/* spec eob position token tables (coeff_writer.py:35-39) */
static const uint8_t EOB_SMALL[33] = {0, 1, 2, 3, 3, 4, 4, 4, 4,
                                      5, 5, 5, 5, 5, 5, 5, 5,
                                      6, 6, 6, 6, 6, 6, 6, 6,
                                      6, 6, 6, 6, 6, 6, 6, 6};
static const uint8_t EOB_LARGE[17] = {6, 7, 8, 8, 9, 9, 9, 9, 10, 10,
                                      10, 10, 10, 10, 10, 10, 11};
static const uint16_t EOB_GROUP_START[12] = {0, 1, 2, 3, 5, 9, 17, 33,
                                             65, 129, 257, 513};
static const uint8_t EOB_OFF_BITS[12] = {0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9};

typedef struct { /* per-txb table slices + geometry */
    const int32_t *base;      /* (42,4) */
    const int32_t *base_eob;  /* (4,3) */
    const int32_t *lps;       /* (21,13) */
    const int32_t *eob_pt;    /* (11,) */
    const int32_t *eob_extra; /* (22,2) */
    const int32_t *nz_off;    /* per raster pos */
    const int32_t *dcs;       /* (2,) dc sign costs for this ctx */
    int bwl, cw, ch, stride, tx_class, shift;
    int64_t rdmult;
    int sharp;
} TxbCtx;

static int eob_cost_of(const TxbCtx *t, int eob) {
    int pt, extra;
    if (eob < 33) pt = EOB_SMALL[eob];
    else {
        int e = (eob - 1) >> 5;
        if (e > 16) e = 16;
        pt = EOB_LARGE[e];
    }
    extra = eob - EOB_GROUP_START[pt];
    int cost = t->eob_pt[pt - 1];
    const int ob = EOB_OFF_BITS[pt];
    if (ob > 0) {
        const int bit = (extra >> (ob - 1)) & 1;
        cost += t->eob_extra[pt * 2 + bit];
        if (ob > 1) cost += (ob - 1) << 9;
    }
    return cost;
}

#define C3(x) ((x) < 3 ? (x) : 3)

static int base_ctx(const TxbCtx *t, const uint8_t *levels, int pos) {
    const int row = pos >> t->bwl, col = pos - (row << t->bwl);
    const uint8_t *l = levels + row * t->stride + col;
    const int s = t->stride;
    int mag;
    if (t->tx_class == 0)
        mag = C3(l[1]) + C3(l[s]) + C3(l[s + 1]) + C3(l[2]) + C3(l[2 * s]);
    else if (t->tx_class == 1) /* HORIZ */
        mag = C3(l[1]) + C3(l[s]) + C3(l[2]) + C3(l[3]) + C3(l[4]);
    else /* VERT */
        mag = C3(l[1]) + C3(l[s]) + C3(l[2 * s]) + C3(l[3 * s]) +
              C3(l[4 * s]);
    mag = (mag + 1) >> 1;
    if (mag > 4) mag = 4;
    if (t->tx_class == 0 && pos == 0) return 0;
    return mag + t->nz_off[pos];
}

static int base_ctx_eob(const TxbCtx *t, int si) {
    const int n8 = (t->ch << t->bwl) >> 3;
    if (si == 0) return 0;
    if (si <= n8) return 1;
    if (si <= 2 * n8) return 2;
    return 3;
}

static int br_ctx_of(const TxbCtx *t, const uint8_t *levels, int pos) {
    const int row = pos >> t->bwl, col = pos - (row << t->bwl);
    const uint8_t *l = levels + row * t->stride + col;
    const int s = t->stride;
    int mag = l[1] + l[s];
    if (t->tx_class == 0) mag += l[s + 1];
    else if (t->tx_class == 1) mag += l[2];
    else mag += l[2 * s];
    mag = (mag + 1) >> 1;
    if (mag > 6) mag = 6;
    if (pos == 0) return mag;
    if ((t->tx_class == 0 && row < 2 && col < 2) ||
        (t->tx_class == 1 && col == 0) || (t->tx_class == 2 && row == 0))
        return mag + 7;
    return mag + 14;
}

static int br_ctx_eob_of(const TxbCtx *t, int pos) {
    const int row = pos >> t->bwl, col = pos - (row << t->bwl);
    if (pos == 0) return 0;
    if ((t->tx_class == 0 && row < 2 && col < 2) ||
        (t->tx_class == 1 && col == 0) || (t->tx_class == 2 && row == 0))
        return 7;
    return 14;
}

/* full cost of coding abs_qc at pos (general form: eob or not) */
static int coeff_cost(const TxbCtx *t, const uint8_t *levels, int is_last,
                      int pos, int abs_qc, int sign, int cctx) {
    int cost;
    if (is_last) {
        const int v = abs_qc < 3 ? abs_qc : 3;
        cost = t->base_eob[cctx * 3 + (v - 1)];
    } else {
        const int v = abs_qc < 3 ? abs_qc : 3;
        cost = t->base[cctx * 4 + v];
    }
    if (abs_qc != 0) {
        if (pos == 0) cost += t->dcs[sign];
        else cost += 1 << 9;
        if (abs_qc > NUM_BASE_LEVELS) {
            const int bc = is_last ? br_ctx_eob_of(t, pos)
                                   : br_ctx_of(t, levels, pos);
            cost += br_cost(abs_qc, t->lps + bc * 13);
        }
    }
    return cost;
}

static inline void lower_qc(int abs_qc, int sign, int dqv, int shift,
                            int32_t *qc_low, int32_t *dqc_low) {
    const int a = abs_qc - 1;
    const int ad = (int)(((int64_t)a * dqv) >> shift);
    *qc_low = sign ? -a : a;
    *dqc_low = sign ? -ad : ad;
}

/* ---- the per-txb trellis ----------------------------------------------
 * tcoeff/qcoeff/dqcoeff: raster (ch*cw); eob in scan order; iqm NULL or
 * raster int32 inverse-QM weights; returns the new eob.  txs_ctx, ptype,
 * is_inter select the table slices; qindex drives the sharpness gate. */
int32_t svt_rdoq_txb(int txs_ctx, int ptype, int is_inter, int tx_class,
                     const int32_t *tcoeff, int32_t *qcoeff,
                     int32_t *dqcoeff, int32_t eob, const int32_t *scan,
                     int cw, int ch, const int32_t *nz_off, int shift,
                     int32_t dqv_dc, int32_t dqv_ac, const int32_t *iqm,
                     int txb_skip_ctx, int dc_sign_ctx, int qindex,
                     int eob_multi_size) {
    static const int PLANE_RD_MULT[2][2] = {{17, 13}, {16, 10}};
    if (!g_rdoq.enabled || eob <= 0) return eob;

    int rweight = 100, sharp = 0;
    int rshift = g_rdoq.sharpness_val > 2 ? g_rdoq.sharpness_val : 2;
    if (g_rdoq.use_sharpness && ptype == 0 &&
        (qindex < g_rdoq.base_q || g_rdoq.sharp_tx)) {
        sharp = 1;
        rweight = 0;
    }
    const int64_t rdmult =
        ((((g_rdoq.lambda * PLANE_RD_MULT[is_inter][ptype]) * rweight) /
          100) + 2) >> rshift;

    TxbCtx t;
    t.cw = cw; t.ch = ch;
    t.bwl = 0;
    while ((1 << t.bwl) < cw) t.bwl++;
    t.stride = cw + LV_STRIDE_PAD;
    t.tx_class = tx_class;
    t.shift = shift;
    t.rdmult = rdmult;
    t.sharp = sharp;
    t.nz_off = nz_off;
    const int tsc_br = txs_ctx < 3 ? txs_ctx : 3;
    t.base = g_rdoq.base + ((txs_ctx * 2 + ptype) * 42) * 4;
    t.base_eob = g_rdoq.base_eob + ((txs_ctx * 2 + ptype) * 4) * 3;
    t.lps = g_rdoq.lps + ((tsc_br * 2 + ptype) * 21) * 13;
    const int emc = tx_class == 0 ? 0 : 1;
    t.eob_pt = g_rdoq.eob_pt + ((eob_multi_size * 2 + ptype) * 2 + emc) * 11;
    t.eob_extra = g_rdoq.eob_extra + ((txs_ctx * 2 + ptype) * 22) * 2;
    t.dcs = g_rdoq.dc_sign + (ptype * 3 + dc_sign_ctx) * 2;
    const int32_t *skip_costs = g_rdoq.txb_skip + (txs_ctx * 13 + txb_skip_ctx) * 2;
    const int non_skip_cost = skip_costs[0], skip_cost = skip_costs[1];

    static uint8_t levels[(32 + LV_STRIDE_PAD) * (32 + LV_STRIDE_PAD)];
    memset(levels, 0, (size_t)(ch + 4) * t.stride);
    for (int r = 0; r < ch; r++)
        for (int c = 0; c < cw; c++) {
            int v = qcoeff[r * cw + c];
            if (v < 0) v = -v;
            levels[r * t.stride + c] = v > 127 ? 127 : (uint8_t)v;
        }

#define DQV(pos) (iqm ? (int32_t)(((int64_t)iqm[pos] * ((pos) ? dqv_ac : dqv_dc) + 16) >> 5) \
                      : ((pos) ? dqv_ac : dqv_dc))
#define PUT_LEVEL(pos, v) levels[((pos) >> t.bwl) * t.stride + ((pos) & (cw - 1))] = \
        (uint8_t)((v) > 127 ? 127 : (v))

    int64_t accu_rate = eob_cost_of(&t, eob);
    int64_t accu_dist = 0;
    int si = eob - 1;
    int nz_num = 1;
    int nz_ci[MAX_NZ_NUM + 1];
    nz_ci[0] = scan[si];

    /* ---- the eob coefficient -------------------------------------- */
    {
        const int ci = scan[si];
        const int32_t qc = qcoeff[ci];
        const int abs_qc = qc < 0 ? -qc : qc;
        const int sign = qc < 0;
        const int cctx = base_ctx_eob(&t, si);
        if (abs_qc >= 2) {
            /* general update at the eob position */
            const int dqv = DQV(ci);
            const int64_t tqc = tcoeff[ci];
            const int64_t dist = cdist(tqc, dqcoeff[ci], shift);
            const int rate = coeff_cost(&t, levels, 1, ci, abs_qc, sign, cctx);
            const int64_t rd = rdc(rdmult, rate, dist);
            int32_t qlo, dlo;
            lower_qc(abs_qc, sign, dqv, shift, &qlo, &dlo);
            const int64_t dist_lo = cdist(tqc, dlo, shift);
            const int rate_lo =
                coeff_cost(&t, levels, 1, ci, abs_qc - 1, sign, cctx);
            if (rdc(rdmult, rate_lo, dist_lo) < rd) {
                qcoeff[ci] = qlo;
                dqcoeff[ci] = dlo;
                PUT_LEVEL(ci, abs_qc - 1);
                accu_rate += rate_lo;
                accu_dist += dist_lo - cdist(tqc, 0, shift);
            } else {
                accu_rate += rate;
                accu_dist += dist - cdist(tqc, 0, shift);
            }
        } else {
            accu_rate += coeff_cost(&t, levels, 1, ci, abs_qc, sign, cctx);
            const int64_t tqc = tcoeff[ci];
            accu_dist += cdist(tqc, dqcoeff[ci], shift) - cdist(tqc, 0, shift);
        }
        --si;
    }

    /* ---- eob-move zone: until 4 nonzeros seen --------------------- */
    int eob_cur = eob;
    for (; si >= 0 && nz_num <= MAX_NZ_NUM; --si) {
        const int ci = scan[si];
        const int32_t qc = qcoeff[ci];
        const int cctx = base_ctx(&t, levels, ci);
        if (qc == 0) {
            accu_rate += t.base[cctx * 4];
            continue;
        }
        const int abs_qc = qc < 0 ? -qc : qc;
        const int sign = qc < 0;
        const int dqv = DQV(ci);
        const int64_t tqc = tcoeff[ci];
        const int64_t dist0 = cdist(tqc, 0, shift);
        int64_t dist = cdist(tqc, dqcoeff[ci], shift) - dist0;
        int rate = coeff_cost(&t, levels, 0, ci, abs_qc, sign, cctx);
        int64_t rd = rdc(rdmult, accu_rate + rate, accu_dist + dist);

        int32_t qlo, dlo;
        int abs_lo;
        int64_t dist_lo, rd_lo;
        int rate_lo;
        if (abs_qc == 1) {
            abs_lo = 0; qlo = 0; dlo = 0;
            dist_lo = 0;
            rate_lo = t.base[cctx * 4];
            rd_lo = rdc(rdmult, accu_rate + rate_lo, accu_dist);
        } else {
            lower_qc(abs_qc, sign, dqv, shift, &qlo, &dlo);
            abs_lo = abs_qc - 1;
            dist_lo = cdist(tqc, dlo, shift) - dist0;
            rate_lo = coeff_cost(&t, levels, 0, ci, abs_lo, sign, cctx);
            rd_lo = rdc(rdmult, accu_rate + rate_lo, accu_dist + dist_lo);
        }

        /* candidate: make this position the new eob */
        const int cctx_eob = base_ctx_eob(&t, si);
        const int new_eob_cost = eob_cost_of(&t, si + 1);
        int rate_eob = new_eob_cost +
            coeff_cost(&t, levels, 1, ci, abs_qc, sign, cctx_eob);
        int64_t dist_eob = dist;
        int64_t rd_eob = rdc(rdmult, rate_eob, dist_eob);
        int lower_at_eob = 0;
        if (abs_lo > 0) {
            const int rate_eob_lo = new_eob_cost +
                coeff_cost(&t, levels, 1, ci, abs_lo, sign, cctx_eob);
            const int64_t rd_eob_lo = rdc(rdmult, rate_eob_lo, dist_lo);
            if (rd_eob_lo < rd_eob) {
                lower_at_eob = 1;
                rd_eob = rd_eob_lo;
                rate_eob = rate_eob_lo;
                dist_eob = dist_lo;
            }
        }

        int lower = 0;
        if (rd_lo < rd) {
            lower = 1;
            rd = rd_lo;
            rate = rate_lo;
            dist = dist_lo;
        }

        if (!sharp && rd_eob < rd) {
            /* zero everything after this position; restart accounting */
            for (int ni = 0; ni < nz_num; ni++) {
                const int lc = nz_ci[ni];
                PUT_LEVEL(lc, 0);
                qcoeff[lc] = 0;
                dqcoeff[lc] = 0;
            }
            eob_cur = si + 1;
            nz_num = 0;
            accu_rate = rate_eob;
            accu_dist = dist_eob;
            lower = lower_at_eob;
        } else {
            accu_rate += rate;
            accu_dist += dist;
        }

        if (lower) {
            qcoeff[ci] = qlo;
            dqcoeff[ci] = dlo;
            PUT_LEVEL(ci, abs_lo);
        }
        if (qcoeff[ci]) {
            nz_ci[nz_num] = ci;
            ++nz_num;
        }
    }

    /* ---- whole-block skip ------------------------------------------ */
    if (si == -1 && nz_num <= MAX_NZ_NUM && !sharp) {
        const int64_t rd_keep =
            rdc(rdmult, accu_rate + non_skip_cost, accu_dist);
        const int64_t rd_skip = rdc(rdmult, skip_cost, 0);
        if (rd_skip < rd_keep) {
            for (int i = 0; i < nz_num; i++) {
                qcoeff[nz_ci[i]] = 0;
                dqcoeff[nz_ci[i]] = 0;
            }
            return 0;
        }
    }

    /* ---- simple zone: level-only decisions ------------------------- */
    for (; si >= 1; --si) {
        const int ci = scan[si];
        const int32_t qc = qcoeff[ci];
        if (qc == 0) continue;
        const int abs_qc = qc < 0 ? -qc : qc;
        const int64_t abs_tqc = tcoeff[ci] < 0 ? -(int64_t)tcoeff[ci]
                                               : (int64_t)tcoeff[ci];
        const int64_t abs_dqc = dqcoeff[ci] < 0 ? -(int64_t)dqcoeff[ci]
                                                : (int64_t)dqcoeff[ci];
        if (abs_dqc < abs_tqc) continue; /* undershoot: lowering only hurts */
        const int cctx = base_ctx(&t, levels, ci);
        const int sign = qc < 0;
        const int rate = coeff_cost(&t, levels, 0, ci, abs_qc, sign, cctx);
        const int64_t rd = rdc(rdmult, rate, cdist(abs_tqc, abs_dqc, shift));
        const int dqv = DQV(ci);
        const int abs_lo = abs_qc - 1;
        const int64_t abs_dlo = ((int64_t)abs_lo * dqv) >> shift;
        const int rate_lo = coeff_cost(&t, levels, 0, ci, abs_lo, sign, cctx);
        if (rdc(rdmult, rate_lo, cdist(abs_tqc, abs_dlo, shift)) < rd) {
            qcoeff[ci] = sign ? -abs_lo : abs_lo;
            dqcoeff[ci] = sign ? -(int32_t)abs_dlo : (int32_t)abs_dlo;
            PUT_LEVEL(ci, abs_lo);
        }
    }

    /* ---- DC (reached only when DC is not the eob coefficient) ------- */
    if (si == 0) {
        const int ci = scan[0];
        const int32_t qc = qcoeff[ci];
        if (qc != 0) {
            const int cctx = base_ctx(&t, levels, ci);
            const int abs_qc = qc < 0 ? -qc : qc;
            const int sign = qc < 0;
            const int dqv = DQV(ci);
            const int64_t tqc = tcoeff[ci];
            const int64_t dist = cdist(tqc, dqcoeff[ci], shift);
            const int rate =
                coeff_cost(&t, levels, 0, ci, abs_qc, sign, cctx);
            const int64_t rd = rdc(rdmult, rate, dist);
            int32_t qlo, dlo;
            int abs_lo, rate_lo;
            int64_t dist_lo;
            if (abs_qc == 1) {
                abs_lo = 0; qlo = 0; dlo = 0;
                dist_lo = cdist(tqc, 0, shift);
                rate_lo = t.base[cctx * 4];
            } else {
                lower_qc(abs_qc, sign, dqv, shift, &qlo, &dlo);
                abs_lo = abs_qc - 1;
                dist_lo = cdist(tqc, dlo, shift);
                rate_lo =
                    coeff_cost(&t, levels, 0, ci, abs_lo, sign, cctx);
            }
            if (rdc(rdmult, rate_lo, dist_lo) < rd) {
                qcoeff[ci] = qlo;
                dqcoeff[ci] = dlo;
                PUT_LEVEL(ci, abs_lo);
            }
        }
    }

    /* recompute eob over the (possibly shortened) scan prefix */
    {
        int e = 0;
        for (int k = 0; k < eob_cur; k++)
            if (qcoeff[scan[k]]) e = k + 1;
        eob_cur = e;
    }
#undef DQV
#undef PUT_LEVEL
    return eob_cur;
}
