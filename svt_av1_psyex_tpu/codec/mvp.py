"""Motion vector predictor stack (spec 7.10.2 find_mv_stack) — single
reference path, no temporal MVs (seq.enable_ref_frame_mvs = 0).

Mirrors the normative derivation the decoder performs
(adaptive_mv_pred.c setup_ref_mv_list:637): row/col scans with weights,
top-right/top-left block scans, REF_CAT_LEVEL promotion, mode-context
derivation, bubble sort, relaxed rescan, MV clamping. Any divergence
desynchronizes NEWMV coding — validated by dav1d e2e.

The mi-state view is a dict of numpy grids maintained by mode decision:
  ref_frame (int8, -1 intra/none), mv_row/mv_col (int16, 1/8 pel),
  mode (int8, inter modes >= NEWMV flag via is_newmv), bsize (int8).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .constants import BLOCK_H, BLOCK_W

MAX_REF_MV_STACK_SIZE = 8
MAX_MV_REF_CANDIDATES = 2
REF_CAT_LEVEL = 640
MVREF_ROWS = 3
MV_BORDER = 16 << 3

# mode context bit layout
GLOBALMV_OFFSET = 3
REFMV_OFFSET = 4
NEWMV_CTX_MASK = (1 << GLOBALMV_OFFSET) - 1
GLOBALMV_CTX_MASK = (1 << (REFMV_OFFSET - GLOBALMV_OFFSET)) - 1
REFMV_CTX_MASK = (1 << (8 - REFMV_OFFSET)) - 1


@dataclass
class MvStack:
    mvs: list = field(default_factory=list)  # [(row, col)] in 1/8 pel
    weights: list = field(default_factory=list)
    mode_context: int = 0
    # true refmv_count: the single-ref gm padding fills stack slots WITHOUT
    # incrementing the count (scan_row_col_light tail), and DRL coding
    # depends on the true count
    count: int = 0

    def drl_ctx(self, idx: int) -> int:
        """av1_drl_ctx: context for the drl bit between idx and idx+1."""
        if self.weights[idx] >= REF_CAT_LEVEL and self.weights[idx + 1] >= REF_CAT_LEVEL:
            return 0
        if self.weights[idx] >= REF_CAT_LEVEL and self.weights[idx + 1] < REF_CAT_LEVEL:
            return 1
        return 2


class MiState:
    """Per-4x4 inter mode info grids (MD-local and writer-local copies)."""

    def __init__(self, mi_rows: int, mi_cols: int):
        self.mi_rows = mi_rows
        self.mi_cols = mi_cols
        self.ref_frame = np.full((mi_rows, mi_cols), -1, np.int8)  # -1 = intra
        self.mv_row = np.zeros((mi_rows, mi_cols), np.int16)
        self.mv_col = np.zeros((mi_rows, mi_cols), np.int16)
        self.is_newmv = np.zeros((mi_rows, mi_cols), np.int8)
        self.bsize = np.zeros((mi_rows, mi_cols), np.int8)
        # RefFrameSignBias per named ref (spec 5.9.2 set_frame_refs /
        # 7.8: bias = ref order hint after the current frame); used by the
        # relaxed rescan to flip opposite-direction candidate MVs
        self.sign_bias = np.zeros(8, bool)

    def set_block(self, r: int, c: int, bsize: int, ref_frame: int,
                  mv: tuple[int, int], is_newmv: bool) -> None:
        bw4 = int(BLOCK_W[bsize]) >> 2
        bh4 = int(BLOCK_H[bsize]) >> 2
        r1 = min(r + bh4, self.mi_rows)
        c1 = min(c + bw4, self.mi_cols)
        self.ref_frame[r:r1, c:c1] = ref_frame
        self.mv_row[r:r1, c:c1] = mv[0]
        self.mv_col[r:r1, c:c1] = mv[1]
        self.is_newmv[r:r1, c:c1] = 1 if is_newmv else 0
        self.bsize[r:r1, c:c1] = bsize

    def save(self, r, c, bsize):
        bw4 = int(BLOCK_W[bsize]) >> 2
        bh4 = int(BLOCK_H[bsize]) >> 2
        r1 = min(r + bh4, self.mi_rows)
        c1 = min(c + bw4, self.mi_cols)
        return tuple(a[r:r1, c:c1].copy() for a in
                     (self.ref_frame, self.mv_row, self.mv_col, self.is_newmv, self.bsize))

    def restore(self, r, c, bsize, st):
        bw4 = int(BLOCK_W[bsize]) >> 2
        bh4 = int(BLOCK_H[bsize]) >> 2
        r1 = min(r + bh4, self.mi_rows)
        c1 = min(c + bw4, self.mi_cols)
        for a, s in zip((self.ref_frame, self.mv_row, self.mv_col, self.is_newmv, self.bsize), st):
            a[r:r1, c:c1] = s


def _mvp_has_top_right(mi_row: int, mi_col: int, bs: int, n8_w: int, n8_h: int,
                       sb_mi: int = 16) -> bool:
    """MVP-specific has_top_right (adaptive_mv_pred.c:266)."""
    if bs > 16:  # mi_size_wide[BLOCK_64X64]
        return False
    # is_sec_rect: the later-coded rect of a HORZ/VERT pair (libaom rule:
    # derived from position within the enclosing square)
    if n8_w != n8_h:
        is_sec_rect = False
        if n8_w < n8_h and (mi_col & (n8_h - 1)):
            is_sec_rect = True
        if n8_w > n8_h and (mi_row & (n8_w - 1)):
            is_sec_rect = True
        if n8_w > n8_h and is_sec_rect:
            return False  # bottom of two horizontal rects: no TR
        if n8_w < n8_h and not is_sec_rect:
            return True  # left of two vertical rects: always TR
    mask_row = mi_row & (sb_mi - 1)
    mask_col = mi_col & (sb_mi - 1)
    has_tr = not ((mask_row & bs) and (mask_col & bs))
    while bs < sb_mi:
        if mask_col & bs:
            if (mask_col & (2 * bs)) and (mask_row & (2 * bs)):
                has_tr = False
                break
        else:
            break
        bs <<= 1
    return has_tr


def find_mv_stack(mi: MiState, mi_row: int, mi_col: int, bsize: int,
                  ref_frame: int) -> MvStack:
    """Single-ref MVP stack. GLOBALMV candidates are (0,0) (IDENTITY gm)."""
    n8_w = int(BLOCK_W[bsize]) >> 2
    n8_h = int(BLOCK_H[bsize]) >> 2
    bs = max(n8_w, n8_h)
    gm_mv = (0, 0)

    stack_mvs: list[tuple[int, int]] = []
    weights: list[int] = []

    up_avail = mi_row > 0
    left_avail = mi_col > 0
    max_row_offset = 0
    max_col_offset = 0
    row_adj = 0  # blocks are >= 8x8
    col_adj = 0
    if up_avail:
        max_row_offset = max(-(MVREF_ROWS << 1) + row_adj, -mi_row)
    if left_avail:
        max_col_offset = max(-(MVREF_ROWS << 1) + col_adj, -mi_col)

    counts = {"row_match": 0, "col_match": 0, "newmv": 0}
    processed = {"rows": 0, "cols": 0}

    def add_candidate(rr: int, cc: int, length: int, weight: int, newmv_key: str,
                      count_newmv: bool = True):
        if mi.ref_frame[rr, cc] < 0:
            return
        if int(mi.ref_frame[rr, cc]) != ref_frame:
            return
        this_mv = (int(mi.mv_row[rr, cc]), int(mi.mv_col[rr, cc]))
        # GLOBALMV candidate blocks >= 8x8 use gm mv; IDENTITY type => not
        # a "global mv block" (is_global_mv_block false for IDENTITY/TRANSLATION)
        for i, mvv in enumerate(stack_mvs):
            if mvv == this_mv:
                weights[i] += weight * length
                break
        else:
            if len(stack_mvs) < MAX_REF_MV_STACK_SIZE:
                stack_mvs.append(this_mv)
                weights.append(weight * length)
        if count_newmv and mi.is_newmv[rr, cc]:
            counts["newmv"] += 1
        counts[newmv_key] += 1

    def scan_row(row_offset: int, count_newmv: bool = True):
        end_mi = min(n8_w, mi.mi_cols - mi_col, 16)
        col_off = 1 if abs(row_offset) > 1 else 0
        use_step_16 = n8_w >= 16
        i = 0
        rr = mi_row + row_offset
        while i < end_mi:
            cc = mi_col + col_off + i
            cand_bsize = int(mi.bsize[rr, cc])
            cand_w = int(BLOCK_W[cand_bsize]) >> 2
            length = min(n8_w, cand_w)
            if use_step_16:
                length = max(4, length)
            elif abs(row_offset) > 1:
                length = max(length, 2)
            weight = 2
            if 2 <= n8_w <= cand_w:
                inc = min(-max_row_offset + row_offset + 1,
                          int(BLOCK_H[cand_bsize]) >> 2)
                weight = max(weight, inc)
                processed["rows"] = inc - row_offset - 1
            add_candidate(rr, cc, length, weight, "row_match", count_newmv)
            i += length

    def scan_col(col_offset: int, count_newmv: bool = True):
        end_mi = min(n8_h, mi.mi_rows - mi_row, 16)
        row_off = 1 if abs(col_offset) > 1 else 0
        use_step_16 = n8_h >= 16
        i = 0
        cc = mi_col + col_offset
        while i < end_mi:
            rr = mi_row + row_off + i
            cand_bsize = int(mi.bsize[rr, cc])
            cand_h = int(BLOCK_H[cand_bsize]) >> 2
            length = min(n8_h, cand_h)
            if use_step_16:
                length = max(4, length)
            elif abs(col_offset) > 1:
                length = max(length, 2)
            weight = 2
            if 2 <= n8_h <= cand_h:
                inc = min(-max_col_offset + col_offset + 1,
                          int(BLOCK_W[cand_bsize]) >> 2)
                weight = max(weight, inc)
                processed["cols"] = inc - col_offset - 1
            add_candidate(rr, cc, length, weight, "col_match", count_newmv)
            i += length

    def scan_blk(row_offset: int, col_offset: int, key: str, count_newmv: bool = True):
        rr, cc = mi_row + row_offset, mi_col + col_offset
        if rr < 0 or cc < 0 or rr >= mi.mi_rows or cc >= mi.mi_cols:
            return
        add_candidate(rr, cc, 2, 2, key, count_newmv)  # len = 8x8 mi width

    if abs(max_row_offset) >= 1:
        scan_row(-1)
    if abs(max_col_offset) >= 1:
        scan_col(-1)
    if _mvp_has_top_right(mi_row, mi_col, bs, n8_w, n8_h):
        scan_blk(-1, n8_w, "row_match")

    nearest_match = (counts["row_match"] > 0) + (counts["col_match"] > 0)
    nearest_row_match = counts["row_match"]
    nearest_col_match = counts["col_match"]
    newmv_count = counts["newmv"]
    for i in range(len(weights)):
        weights[i] += REF_CAT_LEVEL

    # (temporal MV scan skipped: use_ref_frame_mvs = 0)

    # top-left + outer scans use a dummy newmv counter (setup_ref_mv_list:841)
    scan_blk(-1, -1, "row_match", count_newmv=False)
    for idx in range(2, MVREF_ROWS + 1):
        row_offset = -(idx << 1) + 1 + row_adj
        col_offset = -(idx << 1) + 1 + col_adj
        if abs(row_offset) <= abs(max_row_offset) and abs(row_offset) > processed["rows"]:
            scan_row(row_offset, count_newmv=False)
        if abs(col_offset) <= abs(max_col_offset) and abs(col_offset) > processed["cols"]:
            scan_col(col_offset, count_newmv=False)

    ref_match_count = (counts["row_match"] > 0) + (counts["col_match"] > 0)
    mode_context = 0
    if nearest_match == 0:
        if ref_match_count >= 1:
            mode_context |= 1
        if ref_match_count == 1:
            mode_context |= 1 << REFMV_OFFSET
        elif ref_match_count >= 2:
            mode_context |= 2 << REFMV_OFFSET
    elif nearest_match == 1:
        mode_context |= 2 if newmv_count > 0 else 3
        if ref_match_count == 1:
            mode_context |= 3 << REFMV_OFFSET
        elif ref_match_count >= 2:
            mode_context |= 4 << REFMV_OFFSET
    else:
        mode_context |= 4 if newmv_count >= 1 else 5
        mode_context |= 5 << REFMV_OFFSET

    # bubble-sort by weight (stable order identical to sort_mvp_table)
    length = len(stack_mvs)
    while length > 0:
        nr_len = 0
        for idx in range(1, length):
            if weights[idx - 1] < weights[idx]:
                stack_mvs[idx - 1], stack_mvs[idx] = stack_mvs[idx], stack_mvs[idx - 1]
                weights[idx - 1], weights[idx] = weights[idx], weights[idx - 1]
                nr_len = idx
        length = nr_len

    # relaxed rescan of ROW-1/COL-1 (single-ref path of scan_row_col_light)
    true_count = len(stack_mvs)
    if len(stack_mvs) < MAX_MV_REF_CANDIDATES:
        mi_width = min(16, n8_w, mi.mi_cols - mi_col)
        mi_height = min(16, n8_h, mi.mi_rows - mi_row)
        mi_size = min(mi_width, mi_height)
        bias_us = bool(mi.sign_bias[ref_frame])
        if abs(max_row_offset) >= 1:
            i = 0
            while i < mi_size and len(stack_mvs) < MAX_MV_REF_CANDIDATES:
                rr, cc = mi_row - 1, mi_col + i
                cand_ref = int(mi.ref_frame[rr, cc])
                if cand_ref >= 1:
                    this_mv = (int(mi.mv_row[rr, cc]), int(mi.mv_col[rr, cc]))
                    if bool(mi.sign_bias[cand_ref]) != bias_us:
                        this_mv = (-this_mv[0], -this_mv[1])
                    if this_mv not in stack_mvs:
                        stack_mvs.append(this_mv)
                        weights.append(2)
                i += int(BLOCK_W[int(mi.bsize[rr, cc])]) >> 2
        if abs(max_col_offset) >= 1:
            i = 0
            while i < mi_size and len(stack_mvs) < MAX_MV_REF_CANDIDATES:
                rr, cc = mi_row + i, mi_col - 1
                cand_ref = int(mi.ref_frame[rr, cc])
                if cand_ref >= 1:
                    this_mv = (int(mi.mv_row[rr, cc]), int(mi.mv_col[rr, cc]))
                    if bool(mi.sign_bias[cand_ref]) != bias_us:
                        this_mv = (-this_mv[0], -this_mv[1])
                    if this_mv not in stack_mvs:
                        stack_mvs.append(this_mv)
                        weights.append(2)
                i += int(BLOCK_H[int(mi.bsize[rr, cc])]) >> 2
        true_count = len(stack_mvs)  # relaxed rescan DOES increment count
        while len(stack_mvs) < MAX_MV_REF_CANDIDATES:
            stack_mvs.append(gm_mv)  # slot filled, count NOT incremented
            weights.append(0)

    # clamp (spec clamp_mv_ref: within frame + border, block-relative),
    # applied to the true-count entries only
    bw_px = n8_w * 4
    bh_px = n8_h * 4
    lo_col = -(mi_col * 4 * 8) - bw_px * 8 - MV_BORDER
    hi_col = (mi.mi_cols - n8_w - mi_col) * 4 * 8 + bw_px * 8 + MV_BORDER
    lo_row = -(mi_row * 4 * 8) - bh_px * 8 - MV_BORDER
    hi_row = (mi.mi_rows - n8_h - mi_row) * 4 * 8 + bh_px * 8 + MV_BORDER
    clamped = [(int(np.clip(mv[0], lo_row, hi_row)), int(np.clip(mv[1], lo_col, hi_col)))
               if i < true_count else mv for i, mv in enumerate(stack_mvs)]

    return MvStack(mvs=clamped, weights=weights, mode_context=mode_context,
                   count=true_count)
