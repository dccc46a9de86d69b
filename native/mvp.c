/* MVP stack derivation (spec 7.10.2 find_mv_stack) in C.
 *
 * Port of codec/mvp.py find_mv_stack (the Python implementation remains
 * the oracle; tests/test_native_mvp.py fuzzes the two for equality).
 * Counterpart of the reference's setup_ref_mv_list
 * (Source/Lib/Codec/adaptive_mv_pred.c:637) — same normative derivation,
 * shared-grid data layout designed for this framework's flat numpy
 * MiState arrays.  Single and compound reference paths, plus the MFMV
 * temporal scan (add_tpl_ref_mv, adaptive_mv_pred.c:340) over the
 * projected 8x8 motion field built by codec/mfmv.py.
 */

#include <stdint.h>
#include <string.h>

#define MAX_STACK 8
#define MAX_CAND 2
#define REF_CAT_LEVEL 640
#define MVREF_ROWS 3
#define MV_BORDER (16 << 3)

/* block geometry (constants.py BLOCK_W/H >> 2) */
#define N_BSIZES 22
static const uint8_t BW4[N_BSIZES] = {1, 1, 2, 2,  2,  4, 4, 4, 8, 8, 8,
                                      16, 16, 16, 32, 32, 1, 4, 2, 8, 4, 16};
static const uint8_t BH4[N_BSIZES] = {1, 2, 1, 2,  4,  2, 4, 8, 4, 8, 16,
                                      8, 16, 32, 16, 32, 4, 1, 8, 2, 16, 4};

typedef struct {
    const int8_t *ref_frame, *ref_frame1, *is_newmv, *is_gmv, *bsize;
    const int16_t *mv_row, *mv_col, *mv_row1, *mv_col1;
    const uint8_t *sign_bias; /* [8] */
    int mi_rows, mi_cols;
} MiGrids;

typedef struct { int16_t y0, x0, y1, x1; } Entry;

typedef struct {
    MiGrids g;
    int mi_row, mi_col;
    int n8_w, n8_h;
    int rf0, rf1, is_comp;
    Entry stack[MAX_STACK];
    int weights[MAX_STACK];
    int n;
    int row_match, col_match, newmv_cnt;
    int proc_rows, proc_cols;
    int max_row_off, max_col_off;
    int gm_warp;                  /* GmType[rf0] > TRANSLATION */
    int16_t gm_row0, gm_col0, gm_row1, gm_col1;
} Ctx;

#define AT(grid, r, c) ((grid)[(int64_t)(r) * s->g.mi_cols + (c)])

static void push(Ctx *s, Entry e, int weight) {
    for (int i = 0; i < s->n; i++)
        if (s->stack[i].y0 == e.y0 && s->stack[i].x0 == e.x0 &&
            s->stack[i].y1 == e.y1 && s->stack[i].x1 == e.x1) {
            s->weights[i] += weight;
            return;
        }
    if (s->n < MAX_STACK) {
        s->stack[s->n] = e;
        s->weights[s->n] = weight;
        s->n++;
    }
}

static void add_candidate(Ctx *s, int rr, int cc, int length, int weight,
                          int is_row, int count_newmv) {
    if (AT(s->g.ref_frame, rr, cc) < 0) return;
    /* is_global_mv_block: GLOBAL-mode neighbors >= 8x8 contribute the
       CURRENT block's GlobalMvs when GmType[rf0] > TRANSLATION */
    int cb_ = AT(s->g.bsize, rr, cc);
    int mind_ = BW4[cb_] < BH4[cb_] ? BW4[cb_] : BH4[cb_];
    int sub_ = s->gm_warp && AT(s->g.is_gmv, rr, cc) && mind_ >= 2;
    int matched = 0;
    if (s->is_comp) {
        if (AT(s->g.ref_frame, rr, cc) == s->rf0 &&
            AT(s->g.ref_frame1, rr, cc) == s->rf1) {
            Entry e;
            if (sub_) {
                e.y0 = s->gm_row0; e.x0 = s->gm_col0;
                e.y1 = s->gm_row1; e.x1 = s->gm_col1;
            } else {
                e.y0 = AT(s->g.mv_row, rr, cc);
                e.x0 = AT(s->g.mv_col, rr, cc);
                e.y1 = AT(s->g.mv_row1, rr, cc);
                e.x1 = AT(s->g.mv_col1, rr, cc);
            }
            push(s, e, weight * length);
            matched = 1;
        }
    } else {
        int r0 = AT(s->g.ref_frame, rr, cc);
        if (r0 >= 1 && r0 == s->rf0) {
            Entry e = {sub_ ? s->gm_row0 : AT(s->g.mv_row, rr, cc),
                       sub_ ? s->gm_col0 : AT(s->g.mv_col, rr, cc), 0, 0};
            push(s, e, weight * length);
            matched = 1;
        }
        int r1 = AT(s->g.ref_frame1, rr, cc);
        if (r1 >= 1 && r1 == s->rf0) {
            Entry e = {sub_ ? s->gm_row0 : AT(s->g.mv_row1, rr, cc),
                       sub_ ? s->gm_col0 : AT(s->g.mv_col1, rr, cc), 0, 0};
            push(s, e, weight * length);
            matched = 1;
        }
    }
    if (matched) {
        if (count_newmv && AT(s->g.is_newmv, rr, cc)) s->newmv_cnt++;
        if (is_row) s->row_match++; else s->col_match++;
    }
}

static void scan_row(Ctx *s, int row_offset, int count_newmv) {
    int end_mi = s->n8_w;
    if (s->g.mi_cols - s->mi_col < end_mi) end_mi = s->g.mi_cols - s->mi_col;
    if (end_mi > 16) end_mi = 16;
    int col_off = (row_offset < -1 || row_offset > 1) ? 1 : 0;
    if (col_off && (s->mi_col & 1) && s->n8_w < 2) col_off = 0;
    const int use_step_16 = s->n8_w >= 16;
    const int rr = s->mi_row + row_offset;
    int i = 0;
    while (i < end_mi) {
        int cc = s->mi_col + col_off + i;
        if (cc >= s->g.mi_cols) break;
        int cand_bsize = AT(s->g.bsize, rr, cc);
        int cand_w = BW4[cand_bsize];
        int length = cand_w < s->n8_w ? cand_w : s->n8_w;
        if (use_step_16) { if (length < 4) length = 4; }
        else if (row_offset < -1 || row_offset > 1) {
            if (length < 2) length = 2;
        }
        int weight = 2;
        if (2 <= s->n8_w && s->n8_w <= cand_w) {
            int inc = -s->max_row_off + row_offset + 1;
            int ch = BH4[cand_bsize];
            if (ch < inc) inc = ch;
            if (inc > weight) weight = inc;
            s->proc_rows = inc - row_offset - 1;
        }
        add_candidate(s, rr, cc, length, weight, 1, count_newmv);
        i += length;
    }
}

static void scan_col(Ctx *s, int col_offset, int count_newmv) {
    int end_mi = s->n8_h;
    if (s->g.mi_rows - s->mi_row < end_mi) end_mi = s->g.mi_rows - s->mi_row;
    if (end_mi > 16) end_mi = 16;
    int row_off = (col_offset < -1 || col_offset > 1) ? 1 : 0;
    if (row_off && (s->mi_row & 1) && s->n8_h < 2) row_off = 0;
    const int use_step_16 = s->n8_h >= 16;
    const int cc = s->mi_col + col_offset;
    int i = 0;
    while (i < end_mi) {
        int rr = s->mi_row + row_off + i;
        if (rr >= s->g.mi_rows) break;
        int cand_bsize = AT(s->g.bsize, rr, cc);
        int cand_h = BH4[cand_bsize];
        int length = cand_h < s->n8_h ? cand_h : s->n8_h;
        if (use_step_16) { if (length < 4) length = 4; }
        else if (col_offset < -1 || col_offset > 1) {
            if (length < 2) length = 2;
        }
        int weight = 2;
        if (2 <= s->n8_h && s->n8_h <= cand_h) {
            int inc = -s->max_col_off + col_offset + 1;
            int cw = BW4[cand_bsize];
            if (cw < inc) inc = cw;
            if (inc > weight) weight = inc;
            s->proc_cols = inc - col_offset - 1;
        }
        add_candidate(s, rr, cc, length, weight, 0, count_newmv);
        i += length;
    }
}

static void scan_blk(Ctx *s, int row_offset, int col_offset, int is_row,
                     int count_newmv) {
    int rr = s->mi_row + row_offset, cc = s->mi_col + col_offset;
    if (rr < 0 || cc < 0 || rr >= s->g.mi_rows || cc >= s->g.mi_cols) return;
    add_candidate(s, rr, cc, 2, 2, is_row, count_newmv);
}

static int has_top_right(int mi_row, int mi_col, int bs, int n8_w, int n8_h) {
    const int sb_mi = 16;
    if (bs > 16) return 0;
    if (n8_w != n8_h) {
        int is_sec_rect = 0;
        if (n8_w < n8_h && !((mi_col + n8_w) & (n8_h - 1))) is_sec_rect = 1;
        if (n8_w > n8_h && (mi_row & (n8_w - 1))) is_sec_rect = 1;
        if (n8_w > n8_h && is_sec_rect) return 0;
        if (n8_w < n8_h && !is_sec_rect) return 1;
    }
    const int mask_row = mi_row & (sb_mi - 1);
    const int mask_col = mi_col & (sb_mi - 1);
    int has_tr = !((mask_row & bs) && (mask_col & bs));
    while (bs < sb_mi) {
        if (mask_col & bs) {
            if ((mask_col & (2 * bs)) && (mask_row & (2 * bs))) {
                has_tr = 0;
                break;
            }
        } else
            break;
        bs <<= 1;
    }
    return has_tr;
}

static inline int16_t clampi16(int v, int lo, int hi) {
    return (int16_t)(v < lo ? lo : (v > hi ? hi : v));
}

/* ---- MFMV temporal scan (spec 7.9 / add_tpl_ref_mv) ------------------- */

static const int32_t div_mult_lut[32] = {
    0,    16384, 8192, 5461, 4096, 3276, 2730, 2340, 2048, 1820, 1638,
    1489, 1365,  1260, 1170, 1092, 1024, 963,  910,  862,  819,  780,
    744,  712,   682,  655,  630,  606,  585,  564,  546,  528};

typedef struct {
    const uint8_t *valid;
    const int16_t *row, *col, *off;
    int h8, w8;
    int cur_off0, cur_off1;
} TplGrid;

static void mv_proj(int *out_r, int *out_c, int mr, int mc, int num,
                    int den) {
    if (den > 31) den = 31;
    num = num > 31 ? 31 : (num < -31 ? -31 : num);
    int64_t xr = (int64_t)mr * num * div_mult_lut[den];
    int64_t xc = (int64_t)mc * num * div_mult_lut[den];
    int r = xr >= 0 ? (int)((xr + (1 << 13)) >> 14)
                    : -(int)((-xr + (1 << 13)) >> 14);
    int c = xc >= 0 ? (int)((xc + (1 << 13)) >> 14)
                    : -(int)((-xc + (1 << 13)) >> 14);
    const int lim = (1 << 14) - 1; /* MV_UPP - 1 (MV_IN_USE_BITS = 14) */
    r = r < -lim ? -lim : (r > lim ? lim : r);
    c = c < -lim ? -lim : (c > lim ? lim : c);
    /* lower_mv_precision, allow_high_precision_mv = 0 */
    if (r & 1) r += r > 0 ? -1 : 1;
    if (c & 1) c += c > 0 ? -1 : 1;
    *out_r = r;
    *out_c = c;
}

/* returns 1 if a projected MV existed at the sample position */
static int add_tpl_ref_mv(Ctx *s, const TplGrid *t, int blk_row,
                          int blk_col, int *gm_ctx_bit) {
    const int pos_r = (s->mi_row & 1) ? blk_row : blk_row + 1;
    const int pos_c = (s->mi_col & 1) ? blk_col : blk_col + 1;
    const int rr = s->mi_row + pos_r, cc = s->mi_col + pos_c;
    if (rr < 0 || cc < 0 || rr >= s->g.mi_rows || cc >= s->g.mi_cols)
        return 0;
    const int ti = (rr >> 1) * t->w8 + (cc >> 1);
    if (!t->valid[ti]) return 0;
    int tr, tc;
    mv_proj(&tr, &tc, t->row[ti], t->col[ti], t->cur_off0, t->off[ti]);
    if (!s->is_comp) {
        if (blk_row == 0 && blk_col == 0) {
            int dr = tr - s->gm_row0, dc = tc - s->gm_col0;
            if (dr < 0) dr = -dr;
            if (dc < 0) dc = -dc;
            if (dr >= 16 || dc >= 16) *gm_ctx_bit = 1;
        }
        Entry e = {(int16_t)tr, (int16_t)tc, 0, 0};
        push(s, e, 2);
    } else {
        int cr, cc2;
        mv_proj(&cr, &cc2, t->row[ti], t->col[ti], t->cur_off1, t->off[ti]);
        if (blk_row == 0 && blk_col == 0) {
            int d[4] = {tr - s->gm_row0, tc - s->gm_col0, cr - s->gm_row1,
                        cc2 - s->gm_col1};
            for (int k = 0; k < 4; k++) {
                int a = d[k] < 0 ? -d[k] : d[k];
                if (a >= 16) { *gm_ctx_bit = 1; break; }
            }
        }
        Entry e = {(int16_t)tr, (int16_t)tc, (int16_t)cr, (int16_t)cc2};
        push(s, e, 2);
    }
    return 1;
}

static int tpl_scan(Ctx *s, const TplGrid *t) {
    /* returns the GLOBALMV context bit */
    int gm_ctx_bit = 0;
    const int n8_w = s->n8_w, n8_h = s->n8_h;
    const int blk_row_end = n8_h < 16 ? n8_h : 16;
    const int blk_col_end = n8_w < 16 ? n8_w : 16;
    const int step_h = n8_h >= 16 ? 4 : 2;
    const int step_w = n8_w >= 16 ? 4 : 2;
    int is_available = 0;
    for (int br = 0; br < blk_row_end; br += step_h)
        for (int bc = 0; bc < blk_col_end; bc += step_w) {
            int ret = add_tpl_ref_mv(s, t, br, bc, &gm_ctx_bit);
            if (br == 0 && bc == 0) is_available = ret;
        }
    if (!is_available) gm_ctx_bit = 1;
    if (n8_h >= 2 && n8_h < 16 && n8_w >= 2 && n8_w < 16) {
        const int voff = n8_h > 2 ? n8_h : 2;
        const int hoff = n8_w > 2 ? n8_w : 2;
        const int pos[3][2] = {{voff, -2}, {voff, hoff}, {voff - 2, hoff}};
        for (int i = 0; i < 3; i++) {
            /* check_sb_border (64x64 SB bounds) */
            int row = (s->mi_row & 15) + pos[i][0];
            int col = (s->mi_col & 15) + pos[i][1];
            if (row < 0 || row >= 16 || col < 0 || col >= 16) continue;
            add_tpl_ref_mv(s, t, pos[i][0], pos[i][1], &gm_ctx_bit);
        }
    }
    return gm_ctx_bit;
}

/* out (int32): [count, mode_ctx,
 *   then MAX_STACK x (mv0y, mv0x, mv1y, mv1x, weight)] = 42 words */
void svt_find_mv_stack(const int8_t *ref_frame, const int8_t *ref_frame1,
                       const int16_t *mv_row, const int16_t *mv_col,
                       const int16_t *mv_row1, const int16_t *mv_col1,
                       const int8_t *is_newmv, const int8_t *is_gmv,
                       const int8_t *bsize_g,
                       const uint8_t *sign_bias, int mi_rows, int mi_cols,
                       int mi_row, int mi_col, int bsize, int rf0, int rf1,
                       int gm_row0, int gm_col0, int gm_row1, int gm_col1,
                       int gm_warp,
                       const uint8_t *tpl_valid, const int16_t *tpl_row,
                       const int16_t *tpl_col, const int16_t *tpl_off,
                       int cur_off0, int cur_off1, int32_t *out) {
    Ctx ctx;
    Ctx *s = &ctx;
    memset(s, 0, sizeof(*s));
    s->g.ref_frame = ref_frame;
    s->g.ref_frame1 = ref_frame1;
    s->g.mv_row = mv_row;
    s->g.mv_col = mv_col;
    s->g.mv_row1 = mv_row1;
    s->g.mv_col1 = mv_col1;
    s->g.is_newmv = is_newmv;
    s->g.is_gmv = is_gmv;
    s->gm_warp = gm_warp;
    s->gm_row0 = (int16_t)gm_row0; s->gm_col0 = (int16_t)gm_col0;
    s->gm_row1 = (int16_t)gm_row1; s->gm_col1 = (int16_t)gm_col1;
    s->g.bsize = bsize_g;
    s->g.sign_bias = sign_bias;
    s->g.mi_rows = mi_rows;
    s->g.mi_cols = mi_cols;
    s->mi_row = mi_row;
    s->mi_col = mi_col;
    s->n8_w = BW4[bsize];
    s->n8_h = BH4[bsize];
    s->rf0 = rf0;
    s->rf1 = rf1;
    s->is_comp = rf1 >= 1;
    const int n8_w = s->n8_w, n8_h = s->n8_h;
    const int bs = n8_w > n8_h ? n8_w : n8_h;

    const int up_avail = mi_row > 0;
    const int left_avail = mi_col > 0;
    const int row_adj = (n8_h < 2 && (mi_row & 1)) ? 1 : 0;
    const int col_adj = (n8_w < 2 && (mi_col & 1)) ? 1 : 0;
    if (up_avail) {
        s->max_row_off = -(MVREF_ROWS << 1) + row_adj;
        if (n8_h < 2) s->max_row_off = -(2 << 1) + row_adj;
        if (s->max_row_off < -mi_row) s->max_row_off = -mi_row;
    }
    if (left_avail) {
        s->max_col_off = -(MVREF_ROWS << 1) + col_adj;
        if (n8_w < 2) s->max_col_off = -(2 << 1) + col_adj;
        if (s->max_col_off < -mi_col) s->max_col_off = -mi_col;
    }

    if (s->max_row_off <= -1) scan_row(s, -1, 1);
    if (s->max_col_off <= -1) scan_col(s, -1, 1);
    if (has_top_right(mi_row, mi_col, bs, n8_w, n8_h))
        scan_blk(s, -1, n8_w, 1, 1);

    const int nearest_match = (s->row_match > 0) + (s->col_match > 0);
    const int newmv_count = s->newmv_cnt;
    for (int i = 0; i < s->n; i++) s->weights[i] += REF_CAT_LEVEL;

    /* MFMV temporal scan between the REF_CAT_LEVEL boost and the outer
       spatial scans (setup_ref_mv_list order) */
    int gm_ctx_bit = 0;
    if (tpl_valid) {
        TplGrid t;
        t.valid = tpl_valid;
        t.row = tpl_row;
        t.col = tpl_col;
        t.off = tpl_off;
        t.h8 = (mi_rows + 1) >> 1;
        t.w8 = (mi_cols + 1) >> 1;
        t.cur_off0 = cur_off0;
        t.cur_off1 = cur_off1;
        gm_ctx_bit = tpl_scan(s, &t);
    }

    scan_blk(s, -1, -1, 1, 0);
    for (int idx = 2; idx <= MVREF_ROWS; idx++) {
        int row_offset = -(idx << 1) + 1 + row_adj;
        int col_offset = -(idx << 1) + 1 + col_adj;
        int aro = row_offset < 0 ? -row_offset : row_offset;
        int amr = s->max_row_off < 0 ? -s->max_row_off : s->max_row_off;
        int aco = col_offset < 0 ? -col_offset : col_offset;
        int amc = s->max_col_off < 0 ? -s->max_col_off : s->max_col_off;
        if (aro <= amr && aro > s->proc_rows) scan_row(s, row_offset, 0);
        if (aco <= amc && aco > s->proc_cols) scan_col(s, col_offset, 0);
    }

    const int ref_match_count = (s->row_match > 0) + (s->col_match > 0);
    int mode_context = gm_ctx_bit << 3; /* GLOBALMV_OFFSET */
    if (nearest_match == 0) {
        if (ref_match_count >= 1) mode_context |= 1;
        if (ref_match_count == 1) mode_context |= 1 << 4;
        else if (ref_match_count >= 2) mode_context |= 2 << 4;
    } else if (nearest_match == 1) {
        mode_context |= newmv_count > 0 ? 2 : 3;
        if (ref_match_count == 1) mode_context |= 3 << 4;
        else if (ref_match_count >= 2) mode_context |= 4 << 4;
    } else {
        mode_context |= newmv_count >= 1 ? 4 : 5;
        mode_context |= 5 << 4;
    }

    /* bubble sort, stable, identical to sort_mvp_table */
    int length = s->n;
    while (length > 0) {
        int nr_len = 0;
        for (int idx = 1; idx < length; idx++) {
            if (s->weights[idx - 1] < s->weights[idx]) {
                Entry te = s->stack[idx - 1];
                s->stack[idx - 1] = s->stack[idx];
                s->stack[idx] = te;
                int tw = s->weights[idx - 1];
                s->weights[idx - 1] = s->weights[idx];
                s->weights[idx] = tw;
                nr_len = idx;
            }
        }
        length = nr_len;
    }

    int true_count = s->n;
    int mi_width = n8_w;
    if (mi_cols - mi_col < mi_width) mi_width = mi_cols - mi_col;
    if (mi_width > 16) mi_width = 16;
    int mi_height = n8_h;
    if (mi_rows - mi_row < mi_height) mi_height = mi_rows - mi_row;
    if (mi_height > 16) mi_height = 16;
    const int mi_size = mi_width < mi_height ? mi_width : mi_height;

    if (s->is_comp && true_count < MAX_CAND) {
        /* compound relaxed rescan (adaptive_mv_pred.c:470) */
        int16_t ref_id[2][2][2];   /* [cmp][slot][y/x] */
        int n_id[2] = {0, 0};
        int16_t ref_diff[2][2][2];
        int n_diff[2] = {0, 0};
        const int rfc[2] = {s->rf0, s->rf1};

#define COLLECT(rr, cc)                                                       \
        do {                                                                  \
            int refs_[2];                                                     \
            int16_t mvs_[2][2];                                               \
            int nc_ = 0;                                                      \
            int r0_ = AT(s->g.ref_frame, rr, cc);                             \
            if (r0_ >= 1) {                                                   \
                refs_[nc_] = r0_;                                             \
                mvs_[nc_][0] = AT(s->g.mv_row, rr, cc);                       \
                mvs_[nc_][1] = AT(s->g.mv_col, rr, cc);                       \
                nc_++;                                                        \
            }                                                                 \
            int r1_ = AT(s->g.ref_frame1, rr, cc);                            \
            if (r1_ >= 1) {                                                   \
                refs_[nc_] = r1_;                                             \
                mvs_[nc_][0] = AT(s->g.mv_row1, rr, cc);                      \
                mvs_[nc_][1] = AT(s->g.mv_col1, rr, cc);                      \
                nc_++;                                                        \
            }                                                                 \
            for (int k_ = 0; k_ < nc_; k_++)                                  \
                for (int ci_ = 0; ci_ < 2; ci_++) {                           \
                    if (refs_[k_] == rfc[ci_] && n_id[ci_] < 2) {             \
                        ref_id[ci_][n_id[ci_]][0] = mvs_[k_][0];              \
                        ref_id[ci_][n_id[ci_]][1] = mvs_[k_][1];              \
                        n_id[ci_]++;                                          \
                    } else if (n_diff[ci_] < 2) {                             \
                        int flip_ = s->g.sign_bias[refs_[k_]] !=              \
                                    s->g.sign_bias[rfc[ci_]];                 \
                        ref_diff[ci_][n_diff[ci_]][0] =                       \
                            flip_ ? -mvs_[k_][0] : mvs_[k_][0];               \
                        ref_diff[ci_][n_diff[ci_]][1] =                       \
                            flip_ ? -mvs_[k_][1] : mvs_[k_][1];               \
                        n_diff[ci_]++;                                        \
                    }                                                         \
                }                                                             \
        } while (0)

        if (s->max_row_off <= -1) {
            int i = 0;
            while (i < mi_size) {
                int rr = mi_row - 1, cc = mi_col + i;
                COLLECT(rr, cc);
                i += BW4[AT(s->g.bsize, rr, cc)];
            }
        }
        if (s->max_col_off <= -1) {
            int i = 0;
            while (i < mi_size) {
                int rr = mi_row + i, cc = mi_col - 1;
                COLLECT(rr, cc);
                i += BH4[AT(s->g.bsize, rr, cc)];
            }
        }
#undef COLLECT

        int16_t comp_list[MAX_CAND + 1][2][2];
        memset(comp_list, 0, sizeof(comp_list));
        for (int idx = 0; idx < 2; idx++) {
            int ci = 0;
            for (int k = 0; k < n_id[idx] && ci < MAX_CAND; k++, ci++) {
                comp_list[ci][idx][0] = ref_id[idx][k][0];
                comp_list[ci][idx][1] = ref_id[idx][k][1];
            }
            for (int k = 0; k < n_diff[idx] && ci < MAX_CAND; k++, ci++) {
                comp_list[ci][idx][0] = ref_diff[idx][k][0];
                comp_list[ci][idx][1] = ref_diff[idx][k][1];
            }
            /* remaining slots: GlobalMvs[idx] (gm candidates) */
            for (; ci < MAX_CAND; ci++) {
                comp_list[ci][idx][0] = (int16_t)(idx ? gm_row1 : gm_row0);
                comp_list[ci][idx][1] = (int16_t)(idx ? gm_col1 : gm_col0);
            }
        }

        if (true_count == 1) {
            Entry e;
            if (comp_list[0][0][0] == s->stack[0].y0 &&
                comp_list[0][0][1] == s->stack[0].x0 &&
                comp_list[0][1][0] == s->stack[0].y1 &&
                comp_list[0][1][1] == s->stack[0].x1) {
                e.y0 = comp_list[1][0][0]; e.x0 = comp_list[1][0][1];
                e.y1 = comp_list[1][1][0]; e.x1 = comp_list[1][1][1];
            } else {
                e.y0 = comp_list[0][0][0]; e.x0 = comp_list[0][0][1];
                e.y1 = comp_list[0][1][0]; e.x1 = comp_list[0][1][1];
            }
            s->stack[s->n] = e;
            s->weights[s->n] = 2;
            s->n++;
            true_count = 2;
        } else if (true_count == 0) {
            for (int idx = 0; idx < MAX_CAND; idx++) {
                Entry e = {comp_list[idx][0][0], comp_list[idx][0][1],
                           comp_list[idx][1][0], comp_list[idx][1][1]};
                s->stack[s->n] = e;
                s->weights[s->n] = 2;
                s->n++;
            }
            true_count = MAX_CAND;
        }
    } else if (!s->is_comp && true_count < MAX_CAND) {
        /* single-ref relaxed rescan (adaptive_mv_pred.c:570) */
        const int bias_us = s->g.sign_bias[s->rf0] != 0;

#define EXTEND(rr, cc)                                                        \
        do {                                                                  \
            int refs_[2];                                                     \
            int16_t mvs_[2][2];                                               \
            int nc_ = 0;                                                      \
            int r0_ = AT(s->g.ref_frame, rr, cc);                             \
            if (r0_ >= 1) {                                                   \
                refs_[nc_] = r0_;                                             \
                mvs_[nc_][0] = AT(s->g.mv_row, rr, cc);                       \
                mvs_[nc_][1] = AT(s->g.mv_col, rr, cc);                       \
                nc_++;                                                        \
            }                                                                 \
            int r1_ = AT(s->g.ref_frame1, rr, cc);                            \
            if (r1_ >= 1) {                                                   \
                refs_[nc_] = r1_;                                             \
                mvs_[nc_][0] = AT(s->g.mv_row1, rr, cc);                      \
                mvs_[nc_][1] = AT(s->g.mv_col1, rr, cc);                      \
                nc_++;                                                        \
            }                                                                 \
            /* BOTH components append even past 2: the MAX_CAND gate is  \
             * per BLOCK (the outer scan loop), not per component        \
             * (adaptive_mv_pred.c:1007-1037) — count can reach 3, which \
             * the decoder's DRL read depends on (mvp_fuzz.py find)  */  \
            for (int k_ = 0; k_ < nc_; k_++) {                                \
                if (s->n >= MAX_STACK) break;                                 \
                int16_t my_ = mvs_[k_][0], mx_ = mvs_[k_][1];                 \
                if ((s->g.sign_bias[refs_[k_]] != 0) != bias_us) {            \
                    my_ = -my_; mx_ = -mx_;                                   \
                }                                                             \
                Entry e_ = {my_, mx_, 0, 0};                                  \
                int dup_ = 0;                                                 \
                for (int q_ = 0; q_ < s->n; q_++)                             \
                    if (s->stack[q_].y0 == e_.y0 &&                           \
                        s->stack[q_].x0 == e_.x0 &&                           \
                        s->stack[q_].y1 == 0 && s->stack[q_].x1 == 0) {       \
                        dup_ = 1;                                             \
                        break;                                                \
                    }                                                         \
                if (!dup_) {                                                  \
                    s->stack[s->n] = e_;                                      \
                    s->weights[s->n] = 2;                                     \
                    s->n++;                                                   \
                }                                                             \
            }                                                                 \
        } while (0)

        if (s->max_row_off <= -1) {
            int i = 0;
            while (i < mi_size && s->n < MAX_CAND) {
                int rr = mi_row - 1, cc = mi_col + i;
                EXTEND(rr, cc);
                i += BW4[AT(s->g.bsize, rr, cc)];
            }
        }
        if (s->max_col_off <= -1) {
            int i = 0;
            while (i < mi_size && s->n < MAX_CAND) {
                int rr = mi_row + i, cc = mi_col - 1;
                EXTEND(rr, cc);
                i += BH4[AT(s->g.bsize, rr, cc)];
            }
        }
#undef EXTEND
        true_count = s->n;
        while (s->n < MAX_CAND) {
            /* pad with GlobalMvs[0], count NOT incremented (spec 7.10.2.2) */
            Entry z = {(int16_t)gm_row0, (int16_t)gm_col0, 0, 0};
            s->stack[s->n] = z;
            s->weights[s->n] = 0;
            s->n++;
        }
    }

    /* clamp (spec clamp_mv_ref), true-count entries only */
    const int bw_px = n8_w * 4, bh_px = n8_h * 4;
    const int lo_col = -(mi_col * 4 * 8) - bw_px * 8 - MV_BORDER;
    const int hi_col = (mi_cols - n8_w - mi_col) * 4 * 8 + bw_px * 8 + MV_BORDER;
    const int lo_row = -(mi_row * 4 * 8) - bh_px * 8 - MV_BORDER;
    const int hi_row = (mi_rows - n8_h - mi_row) * 4 * 8 + bh_px * 8 + MV_BORDER;
    for (int i = 0; i < true_count; i++) {
        s->stack[i].y0 = clampi16(s->stack[i].y0, lo_row, hi_row);
        s->stack[i].x0 = clampi16(s->stack[i].x0, lo_col, hi_col);
        s->stack[i].y1 = clampi16(s->stack[i].y1, lo_row, hi_row);
        s->stack[i].x1 = clampi16(s->stack[i].x1, lo_col, hi_col);
    }

    out[0] = true_count;
    out[1] = mode_context;
    for (int i = 0; i < MAX_STACK; i++) {
        int32_t *o = out + 2 + i * 5;
        if (i < s->n) {
            o[0] = s->stack[i].y0;
            o[1] = s->stack[i].x0;
            o[2] = s->stack[i].y1;
            o[3] = s->stack[i].x1;
            o[4] = s->weights[i];
        } else {
            o[0] = o[1] = o[2] = o[3] = o[4] = 0;
        }
    }
    out[2 + MAX_STACK * 5] = s->n; /* slots filled (DRL reads past count) */
}
