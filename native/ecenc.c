/* AV1 multi-symbol range encoder — C backend of bitstream/ec.py.
 *
 * This is a direct port of this project's own Python EntropyEncoder
 * (svt_av1_psyex_tpu/bitstream/ec.py), which is a clean-room inverse of
 * the AV1 spec's symbol decoder (spec 8.2). Semantics are pinned by the
 * cross-backend equality tests (tests/test_native_ec.py) and by dav1d
 * conformance of the produced streams.
 *
 * Also hosts the per-txb coefficient emission loop (the hot path of
 * bitstream/coeff_writer.py write_txb: base/base-range symbols, signs,
 * golomb escapes) so Python only prepares vectorized contexts.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define PROB_TOP (1 << 15)
#define EC_PROB_SHIFT 6
#define EC_MIN_PROB 4

typedef struct {
    uint8_t *buf;
    int64_t len, cap;
    uint64_t low; /* window value; low + rng <= 2^wbits */
    uint32_t rng; /* in [2^15, 2^16) */
    int wbits;
} EcEnc;

static int bitlen(uint32_t v) { return v ? 32 - __builtin_clz(v) : 0; }

EcEnc *svt_ec_create(void) {
    EcEnc *e = (EcEnc *)calloc(1, sizeof(EcEnc));
    e->cap = 1 << 16;
    e->buf = (uint8_t *)malloc(e->cap);
    e->rng = PROB_TOP;
    e->wbits = 15;
    return e;
}

void svt_ec_free(EcEnc *e) {
    if (e) {
        free(e->buf);
        free(e);
    }
}

static void ec_push(EcEnc *e, uint8_t b) {
    if (e->len == e->cap) {
        e->cap <<= 1;
        e->buf = (uint8_t *)realloc(e->buf, e->cap);
    }
    e->buf[e->len++] = b;
}

static void propagate_carry(EcEnc *e) {
    int64_t i = e->len - 1;
    while (i >= 0 && e->buf[i] == 0xFF) e->buf[i--] = 0;
    /* encoder invariant: carry never runs off the stream start */
    e->buf[i] += 1;
}

static void add_low(EcEnc *e, uint32_t delta) {
    e->low += delta;
    if (e->low >> e->wbits) {
        e->low &= ((uint64_t)1 << e->wbits) - 1;
        propagate_carry(e);
    }
}

static void normalize(EcEnc *e) {
    int d = 15 - (bitlen(e->rng) - 1);
    if (d > 0) {
        e->rng <<= d;
        e->low <<= d;
        e->wbits += d;
    }
    while (e->wbits >= 24) {
        int shift = e->wbits - 8;
        ec_push(e, (uint8_t)(e->low >> shift));
        e->low &= ((uint64_t)1 << shift) - 1;
        e->wbits -= 8;
    }
}

static uint32_t interval(uint32_t rng, int32_t cdf_k, int nmk1) {
    uint32_t f = PROB_TOP - (uint32_t)cdf_k;
    return (((rng >> 8) * (f >> EC_PROB_SHIFT)) >> 1) + EC_MIN_PROB * (uint32_t)nmk1;
}

static void enc_symbol(EcEnc *e, const int32_t *cdf, int n, int sym) {
    uint32_t r = e->rng;
    uint32_t c_prev = sym == 0 ? r : interval(r, cdf[sym - 1], n - sym);
    uint32_t c_cur = interval(r, cdf[sym], n - sym - 1);
    add_low(e, r - c_prev);
    e->rng = c_prev - c_cur;
    normalize(e);
}

static void cdf_adapt(int32_t *cdf, int n, int sym, int32_t *cnt) {
    int c = *cnt;
    int l2 = bitlen((uint32_t)n) - 1;
    int rate = 3 + (c > 15) + (c > 31) + (l2 < 2 ? l2 : 2);
    for (int i = 0; i < n - 1; i++) {
        int32_t v = cdf[i];
        cdf[i] = i < sym ? v - (v >> rate) : v + ((PROB_TOP - v) >> rate);
    }
    *cnt = c + (c < 32);
}

void svt_ec_symbol(EcEnc *e, int32_t *cdf, int32_t *cnt, int n, int sym,
                   int adapt) {
    enc_symbol(e, cdf, n, sym);
    if (adapt) cdf_adapt(cdf, n, sym, cnt);
}

static const int32_t HALF_CDF[2] = {PROB_TOP >> 1, PROB_TOP};

void svt_ec_literal(EcEnc *e, uint32_t value, int n) {
    for (int i = n - 1; i >= 0; i--)
        enc_symbol(e, HALF_CDF, 2, (value >> i) & 1);
}

static void write_golomb(EcEnc *e, int32_t level) {
    uint32_t x = (uint32_t)level + 1;
    int length = bitlen(x);
    for (int i = 0; i < length - 1; i++) enc_symbol(e, HALF_CDF, 2, 0);
    for (int i = length - 1; i >= 0; i--)
        enc_symbol(e, HALF_CDF, 2, (x >> i) & 1);
}

int64_t svt_ec_done(EcEnc *e, uint8_t *out, int64_t cap) {
    /* non-destructive: computes the terminated stream into out */
    uint64_t low = e->low;
    uint32_t rng = e->rng;
    int wbits = e->wbits;
    uint64_t top = low + rng - 1;
    uint64_t best;
    int carry = 0;
    if (low == top) {
        best = low;
    } else {
        uint64_t x = low ^ top;
        int p = 63 - __builtin_clzll(x);
        best = (top >> p) << p;
    }
    if (best >> wbits) {
        best &= ((uint64_t)1 << wbits) - 1;
        carry = 1;
    }
    int pad = (8 - (wbits % 8)) % 8;
    best <<= pad;
    int nbytes = (wbits + pad) / 8;
    int64_t total = e->len + nbytes;
    if (total == 0) total = 1;
    if (total > cap) return -total;
    memcpy(out, e->buf, e->len);
    if (carry) {
        int64_t i = e->len - 1;
        while (i >= 0 && out[i] == 0xFF) out[i--] = 0;
        out[i] += 1;
    }
    for (int i = nbytes - 1; i >= 0; i--) {
        out[e->len + i] = (uint8_t)(best & 0xFF);
        best >>= 8;
    }
    if (e->len + nbytes == 0) out[0] = 0;
    return total;
}

/* ---- coefficient txb emission (coeff_writer.py write_txb tail) -------- */

#define TX_CLASS_2D 0
#define TX_CLASS_HORIZ 1
#define TX_CLASS_VERT 2
#define NUM_BASE_LEVELS 2
#define COEFF_BASE_RANGE 12
#define BR_CDF_SIZE 4
#define COEFF_CONTEXT_BITS 6
#define COEFF_CONTEXT_MASK ((1 << COEFF_CONTEXT_BITS) - 1)

static int get_br_ctx(const int32_t *levels, int lev_stride, int32_t pos,
                      int bwl, int tx_class) {
    int row = pos >> bwl;
    int col = pos - (row << bwl);
    const int32_t *l = levels + row * lev_stride + col;
    int mag = l[1] + l[lev_stride];
    if (tx_class == TX_CLASS_2D) {
        mag += l[lev_stride + 1];
        mag = (mag + 1) >> 1;
        if (mag > 6) mag = 6;
        if (pos == 0) return mag;
        if (row < 2 && col < 2) return mag + 7;
    } else if (tx_class == TX_CLASS_HORIZ) {
        mag += l[2];
        mag = (mag + 1) >> 1;
        if (mag > 6) mag = 6;
        if (pos == 0) return mag;
        if (col == 0) return mag + 7;
    } else {
        mag += l[2 * lev_stride];
        mag = (mag + 1) >> 1;
        if (mag > 6) mag = 6;
        if (pos == 0) return mag;
        if (row == 0) return mag + 7;
    }
    return mag + 14;
}

/* Emits base/base_eob symbols, base-range symbols, dc sign, sign literals
 * and golomb escapes for one transform block. CDF row group pointers are
 * pre-offset to [ts_ctx][ptype]; row strides are the trailing dims.
 * Returns cul_level (pre dc-sign packing). */
int64_t svt_ec_coeffs(EcEnc *e, const int32_t *scan, const int32_t *flat,
                      const int32_t *coeff_ctx, int eob,
                      const int32_t *levels, int lev_stride, int bwl,
                      int tx_class,
                      int32_t *base_v, int32_t *base_c,
                      int32_t *beob_v, int32_t *beob_c,
                      int32_t *br_v, int32_t *br_c,
                      int32_t *dcs_v, int32_t *dcs_c, int dc_sign_ctx,
                      int adapt) {
    for (int c = eob - 1; c >= 0; c--) {
        int32_t pos = scan[c];
        int32_t v = flat[pos];
        int32_t level = v < 0 ? -v : v;
        int ctx = coeff_ctx[c];
        if (c == eob - 1) {
            int s = (level < 3 ? level : 3) - 1;
            svt_ec_symbol(e, beob_v + ctx * 3, beob_c + ctx, 3, s, adapt);
        } else {
            int s = level < 3 ? level : 3;
            svt_ec_symbol(e, base_v + ctx * 4, base_c + ctx, 4, s, adapt);
        }
        if (level > NUM_BASE_LEVELS) {
            int base_range = level - 1 - NUM_BASE_LEVELS;
            int br_ctx = get_br_ctx(levels, lev_stride, pos, bwl, tx_class);
            int idx = 0;
            while (idx < COEFF_BASE_RANGE) {
                int k = base_range - idx;
                if (k > BR_CDF_SIZE - 1) k = BR_CDF_SIZE - 1;
                svt_ec_symbol(e, br_v + br_ctx * 4, br_c + br_ctx, 4, k, adapt);
                if (k < BR_CDF_SIZE - 1) break;
                idx += BR_CDF_SIZE - 1;
            }
        }
    }
    int64_t cul_level = 0;
    for (int c = 0; c < eob; c++) {
        int32_t pos = scan[c];
        int32_t v = flat[pos];
        int32_t level = v < 0 ? -v : v;
        cul_level += level;
        if (level) {
            if (c == 0)
                svt_ec_symbol(e, dcs_v + dc_sign_ctx * 2, dcs_c + dc_sign_ctx,
                              2, v < 0 ? 1 : 0, adapt);
            else
                enc_symbol(e, HALF_CDF, 2, v < 0 ? 1 : 0);
            if (level > COEFF_BASE_RANGE + NUM_BASE_LEVELS)
                write_golomb(e, level - COEFF_BASE_RANGE - 1 - NUM_BASE_LEVELS);
        }
    }
    if (cul_level > COEFF_CONTEXT_MASK) cul_level = COEFF_CONTEXT_MASK;
    return cul_level;
}

/* ---- transform stage-network executor (ops/txfm.py _Net.run) ----------
 * Butterfly stage networks compiled to flat index/weight arrays; this
 * executes all stages of one 1-D transform pass over a (batch, n) block.
 * Matches the Python executor exactly (int64 lanes, btf rounding,
 * optional clamping). */

void svt_net_run(int64_t *x, int64_t *tmp, int batch, int n,
                 const int32_t *src0, const int64_t *w0,
                 const int32_t *src1, const int64_t *w1,
                 const uint8_t *is_btf, const uint8_t *do_clamp,
                 int nstages, int cos_bit, int clamp_bit) {
    const int64_t rnd = (int64_t)1 << (cos_bit - 1);
    const int64_t lo = clamp_bit > 0 ? -((int64_t)1 << (clamp_bit - 1)) : 0;
    const int64_t hi = clamp_bit > 0 ? ((int64_t)1 << (clamp_bit - 1)) - 1 : 0;
    int64_t *cur = x, *nxt = tmp;
    for (int s = 0; s < nstages; s++) {
        const int32_t *s0 = src0 + (size_t)s * n;
        const int32_t *s1 = src1 + (size_t)s * n;
        const int64_t *a0 = w0 + (size_t)s * n;
        const int64_t *a1 = w1 + (size_t)s * n;
        const uint8_t *bt = is_btf + (size_t)s * n;
        const uint8_t *cl = do_clamp + (size_t)s * n;
        for (int b = 0; b < batch; b++) {
            const int64_t *row = cur + (size_t)b * n;
            int64_t *out = nxt + (size_t)b * n;
            for (int i = 0; i < n; i++) {
                int64_t y = row[s0[i]] * a0[i] + row[s1[i]] * a1[i];
                if (bt[i]) y = (y + rnd) >> cos_bit;
                if (clamp_bit > 0 && cl[i]) {
                    if (y < lo) y = lo;
                    else if (y > hi) y = hi;
                }
                out[i] = y;
            }
        }
        int64_t *t = cur; cur = nxt; nxt = t;
    }
    if (cur != x)
        memcpy(x, cur, (size_t)batch * n * sizeof(int64_t));
}
