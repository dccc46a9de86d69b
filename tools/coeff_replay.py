"""Causal mirror of the coefficient reader: re-decodes a captured frame's
entire adaptive-symbol stream, deriving coefficient contexts from DECODED
data (spec decode order), and diffs the end-of-tile CDF state against the
writer's. Pinpoints encoder/decoder adaptation divergence (the CDF
forwarding conformance debugger)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from svt_av1_psyex_tpu.bitstream import coeff_writer as CW  # noqa: E402
from svt_av1_psyex_tpu.bitstream.ec import EntropyDecoder, update_cdf  # noqa: E402
from svt_av1_psyex_tpu.bitstream.tables import FrameCdfs, scan_table  # noqa: E402
from svt_av1_psyex_tpu.bitstream.tile_writer import TileWriter  # noqa: E402
from svt_av1_psyex_tpu.codec.constants import TX_H, TX_W, TxType  # noqa: E402

HALF = np.array([1 << 14, 1 << 15], np.int32)


def capture(planes, q, w, h, preset=10):
    """Encode a keyframe, logging every adaptive symbol (family, idx, val),
    literals, and per-txb side info markers."""
    from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
    from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
    from svt_av1_psyex_tpu.bitstream import ec as ecmod

    log = []
    orig_sym = TileWriter._sym_at
    orig_lit = ecmod.EntropyEncoder.encode_literal
    orig_txb = CW.CoeffWriter.write_txb

    def famname(self, cdf_pair):
        for k, v in self.cdfs.__dict__.items():
            if isinstance(v, list) and v and (v[0] is cdf_pair[0]):
                return k
            if isinstance(v, dict):
                for kk, vv in v.items():
                    if isinstance(vv, list) and vv[0] is cdf_pair[0]:
                        return (k, kk)
        return None

    def spy_sym(self, symbol, cdf_pair, *idx):
        log.append(("sym", famname(self, cdf_pair), idx, int(symbol)))
        return orig_sym(self, symbol, cdf_pair, *idx)

    def spy_lit(self, value, n):
        log.append(("lit", None, (), (int(value), int(n))))
        return orig_lit(self, value, n)

    def spy_txb(self, plane, plane_bsize, tx_size, tx_type, qcoeff, eob, ux, uy,
                write_tx_type_fn=None):
        if isinstance(self.tw, TileWriter):  # only the real coding pass
            log.append(("txb", (plane, plane_bsize, tx_size, tx_type, ux, uy),
                        (), (np.asarray(qcoeff).copy(), int(eob))))
        return orig_txb(self, plane, plane_bsize, tx_size, tx_type, qcoeff,
                        eob, ux, uy, write_tx_type_fn)

    TileWriter._sym_at = spy_sym
    ecmod.EntropyEncoder.encode_literal = spy_lit
    CW.CoeffWriter.write_txb = spy_txb
    os.environ["SVT_TPU_PY_EC"] = "1"
    try:
        seq = SequenceConfig(width=w, height=h, enable_cdef=False)
        enc = Av1Encoder(seq, preset=preset, enable_dlf=False)
        enc.saved_cdfs = None
        enc.encode_frame(planes, q, force_key=True)
        state = enc.saved_cdfs
    finally:
        TileWriter._sym_at = orig_sym
        ecmod.EntropyEncoder.encode_literal = orig_lit
        CW.CoeffWriter.write_txb = orig_txb
        del os.environ["SVT_TPU_PY_EC"]
    return log, state


class Reader:
    """Replays the schedule; coeff txbs are decoded causally with contexts
    derived from decoded data (not from the writer's log)."""

    def __init__(self, log, q, mi_rows, mi_cols, ss_x=1, ss_y=1):
        self.cdfs = FrameCdfs(q)
        # rebuild the exact bitstream by re-encoding the log (writer state)
        from svt_av1_psyex_tpu.bitstream.ec import EntropyEncoder

        enc = EntropyEncoder()
        cw = FrameCdfs(q)
        for kind, name, idx, val in log:
            if kind == "sym":
                p = self._pair(cw, name)
                row = p[0][idx] if idx else p[0]
                cnt = p[1][idx] if idx else p[1]
                n = int(p[2][idx]) if idx else int(p[2])
                enc.symbol_adapt(val, row, cnt, n, True)
            elif kind == "lit":
                enc.encode_literal(*val)
        self.data = enc.done()
        self.dec = EntropyDecoder(self.data)
        # per-plane cul-level context arrays (decoder side)
        self.above = [np.zeros(mi_cols >> (ss_x if p else 0), np.int32)
                      for p in range(3)]
        self.left = [np.zeros(mi_rows >> (ss_y if p else 0), np.int32)
                     for p in range(3)]
        self.mismatches = []

    @staticmethod
    def _pair(cdfs, name):
        if isinstance(name, tuple):
            return getattr(cdfs, name[0])[name[1]]
        return getattr(cdfs, name)

    def read_sym(self, name, idx):
        p = self._pair(self.cdfs, name)
        row = p[0][idx] if idx else p[0]
        cnt = p[1][idx] if idx else p[1]
        n = int(p[2][idx]) if idx else int(p[2])
        s = self.dec.decode_symbol(row[:n])
        update_cdf(row[:n], s, cnt)
        return s

    def read_lit(self, nbits):
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.dec.decode_symbol(HALF)
        return v

    def run(self, log):
        i = 0
        n = len(log)
        while i < n:
            kind, name, idx, val = log[i]
            if kind == "txb":
                i = self.read_txb(log, i)
                continue
            if kind == "sym":
                s = self.read_sym(name, idx)
                if s != val:
                    self.mismatches.append((i, name, idx, val, s))
                    return
            else:
                v = self.read_lit(val[1])
                if v != val[0]:
                    self.mismatches.append((i, "literal", (), val[0], v))
                    return
            i += 1

    def read_txb(self, log, i):
        _, side, _, (qcoeff, eob_w) = log[i]
        plane, plane_bsize, tx_size, tx_type, ux, uy = side
        i += 1  # the txb's symbols follow in the log; we decode causally
        cw = min(int(TX_W[tx_size]), 32)
        ch = min(int(TX_H[tx_size]), 32)
        full_w, full_h = int(TX_W[tx_size]), int(TX_H[tx_size])
        ts_ctx = CW.txs_ctx(tx_size)
        skip_ctx, dc_sign_ctx = self.txb_ctx(plane, plane_bsize, tx_size, ux, uy)
        ptype = 0 if plane == 0 else 1
        all_zero = self.read_sym("txb_skip", (ts_ctx, skip_ctx))
        exp_skip = 1 if eob_w == 0 else 0
        if all_zero != exp_skip:
            self.mismatches.append((i, "txb_skip", (ts_ctx, skip_ctx), exp_skip, all_zero))
            return i
        # skip matching "sym txb_skip" entry in log
        i = self._skip_log_txb_sym(log, i, "txb_skip")
        if all_zero:
            self.update_ctx(plane, tx_size, ux, uy, 0)
            return i
        # tx_type symbols (luma): replay via log (intra sets; trusted)
        while i < len(log) and log[i][0] == "sym" and log[i][1] in ("intra_ext_tx", "inter_ext_tx"):
            s = self.read_sym(log[i][1], log[i][2])
            if s != log[i][3]:
                self.mismatches.append((i, log[i][1], log[i][2], log[i][3], s))
                return i
            i += 1
        tx_class = CW.TX_TYPE_CLASS[TxType(tx_type)]
        scan = scan_table(tx_size, CW._scan_kind(tx_type))
        # eob coding
        eob_multi_size = int(np.log2(cw)) + int(np.log2(ch)) - 4
        eob_multi_ctx = 0 if tx_class == CW.TX_CLASS_2D else 1
        eob_pt = self.read_sym(("eob_flag", 16 << eob_multi_size),
                               (ptype, eob_multi_ctx)) + 1
        i = self._skip_log_txb_sym(log, i, "eob_flag")
        offset_bits = int(CW.EOB_OFFSET_BITS[eob_pt])
        eob_extra = 0
        if offset_bits > 0:
            bit = self.read_sym("eob_extra", (ts_ctx, ptype, eob_pt))
            i = self._skip_log_txb_sym(log, i, "eob_extra")
            eob_extra |= bit << (offset_bits - 1)
            for k in range(1, offset_bits):
                b = self.read_lit(1)
                eob_extra |= b << (offset_bits - 1 - k)
                i = self._skip_log_txb_sym(log, i, "lit")
        from svt_av1_psyex_tpu.bitstream.coeff_writer import eob_pos_token
        # invert eob_pos_token: eob base for pt
        eob = (1 << (eob_pt - 2)) + 1 + eob_extra if eob_pt >= 3 else eob_pt
        if eob != eob_w:
            self.mismatches.append((i, "eob", (), eob_w, eob))
            return i
        levels = np.zeros((ch + 4, cw + CW.TX_PAD_HOR), np.int32)
        bwl = int(np.log2(cw))
        lv = np.zeros(cw * ch, np.int64)
        for c in range(eob - 1, -1, -1):
            pos = int(scan[c])
            ctx = int(self._nz_ctx_single(levels, pos, c, eob, cw, ch,
                                          full_w, full_h, tx_class))
            if c == eob - 1:
                level = self.read_sym("coeff_base_eob", (ts_ctx, ptype, ctx)) + 1
                i = self._skip_log_txb_sym(log, i, "coeff_base_eob")
            else:
                level = self.read_sym("coeff_base", (ts_ctx, ptype, ctx))
                i = self._skip_log_txb_sym(log, i, "coeff_base")
            if level > CW.NUM_BASE_LEVELS:
                br_ctx = CW._get_br_ctx(levels, pos, bwl, tx_class)
                idxr = 0
                while idxr < CW.COEFF_BASE_RANGE:
                    k = self.read_sym("coeff_br", (min(ts_ctx, 3), ptype, br_ctx))
                    i = self._skip_log_txb_sym(log, i, "coeff_br")
                    level += k
                    if k < CW.BR_CDF_SIZE - 1:
                        break
                    idxr += CW.BR_CDF_SIZE - 1
            lv[pos] = level
            levels[pos >> bwl, pos & (cw - 1)] = min(level, 127)
        # signs + golomb (forward)
        cul = 0
        dc_neg = False
        for c in range(eob):
            pos = int(scan[c])
            level = int(lv[pos])
            if level:
                if c == 0:
                    sgn = self.read_sym("dc_sign", (ptype, dc_sign_ctx))
                    i = self._skip_log_txb_sym(log, i, "dc_sign")
                    dc_neg = bool(sgn)
                else:
                    self.read_lit(1)
                    i = self._skip_log_txb_sym(log, i, "lit")
                if level > CW.COEFF_BASE_RANGE + CW.NUM_BASE_LEVELS:
                    # golomb: count leading zeros then value
                    length = 0
                    while self.read_lit(1) == 0:
                        length += 1
                        i = self._skip_log_txb_sym(log, i, "lit")
                    i = self._skip_log_txb_sym(log, i, "lit")
                    rest = self.read_lit(length) if length else 0
                    for _ in range(length):
                        i = self._skip_log_txb_sym(log, i, "lit")
                    level = ((1 << length) | rest) + CW.COEFF_BASE_RANGE + CW.NUM_BASE_LEVELS
                    lv[pos] = level
            cul += int(lv[pos])
        # compare coeffs with writer's
        wanted = np.abs(np.asarray(qcoeff).reshape(-1))
        if not np.array_equal(np.minimum(wanted, 1 << 30), lv.astype(wanted.dtype)):
            self.mismatches.append((i, "qcoeff", side, None, None))
            return i
        cul = min(CW.COEFF_CONTEXT_MASK, cul)
        dc = int(np.asarray(qcoeff).reshape(-1)[0])
        if dc_neg:
            cul |= 1 << CW.COEFF_CONTEXT_BITS
        elif dc > 0:
            cul += 2 << CW.COEFF_CONTEXT_BITS
        self.update_ctx(plane, tx_size, ux, uy, cul)
        return i

    def _skip_log_txb_sym(self, log, i, kind):
        # writer logged this symbol too; skip it (already consumed causally)
        while i < len(log) and log[i][0] == "txb":
            return i
        return i + 1

    def _nz_ctx_single(self, levels, pos, c, eob, cw, ch, full_w, full_h, tx_class):
        if c == eob - 1:  # coeff_base_eob class ctx
            n = cw * ch
            if c == 0:
                return 0
            if c <= n // 8:
                return 1
            if c <= n // 4:
                return 2
            return 3
        # duplicate pos so the writer's eob-patch lands on index 1
        ctx = CW.CoeffWriter._nz_map_contexts(levels, np.array([pos, pos]), 2,
                                              cw, ch, full_w, full_h, tx_class)
        return int(ctx[0])

    def txb_ctx(self, plane, plane_bsize, tx_size, ux, uy):
        cwri = CW.CoeffWriter.__new__(CW.CoeffWriter)
        cwri.above = self.above
        cwri.left = self.left
        return CW.CoeffWriter._txb_ctx(cwri, plane, plane_bsize, tx_size, ux, uy)

    def update_ctx(self, plane, tx_size, ux, uy, cul):
        tw_units = int(TX_W[tx_size]) >> 2
        th_units = int(TX_H[tx_size]) >> 2
        self.above[plane][ux : ux + tw_units] = cul
        self.left[plane][uy : uy + th_units] = cul


def compare_states(a, b):
    bad = []
    for name, va in a.__dict__.items():
        vb = b.__dict__[name]
        if isinstance(va, list) and va and isinstance(va[0], np.ndarray):
            if not np.array_equal(va[0], vb[0]):
                bad.append((name, np.argwhere(va[0] != vb[0])[:4]))
        elif isinstance(va, dict):
            for k in va:
                if not np.array_equal(va[k][0], vb[k][0]):
                    bad.append(((name, k), np.argwhere(va[k][0] != vb[k][0])[:4]))
    return bad
