"""Tile-group syntax writer: partitions, intra mode info, coefficients.

Mirrors the decode_tile/decode_partition/decode_block syntax of the AV1
spec (5.11.x) on the encode side. Counterpart in the reference:
Source/Lib/Codec/entropy_coding.c (write_modes / encode_partition_av1 /
encode_intra_luma_mode_kf_av1 / av1_encode_tx_coef_y).

The writer consumes a PartitionNode tree per superblock produced by mode
decision; all neighbor/context state (partition contexts, skip, modes,
per-plane entropy contexts) lives here, exactly as the decoder will
reconstruct it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..codec.constants import (
    BLOCK_H,
    BLOCK_W,
    DIRECTIONAL,
    INTRA_MODE_CONTEXT,
    MAX_ANGLE_DELTA,
    IntraMode,
    Partition,
    partition_ctx_lookup,
    subsize,
)
from .ec import EntropyEncoder, update_cdf
from .tables import FrameCdfs, trim


@dataclass
class LeafBlock:
    bsize: int
    y_mode: int = IntraMode.DC
    uv_mode: int = IntraMode.DC
    angle_delta_y: int = 0
    angle_delta_uv: int = 0
    skip: bool = True
    # per-plane coefficient payloads: list over tx blocks in coding order;
    # filled by the transform/quant stage. None => all-skip.
    coeffs: object = None


@dataclass
class PartitionNode:
    partition: int = Partition.NONE
    leaf: LeafBlock | None = None
    children: list = field(default_factory=list)


class TileWriter:
    def __init__(self, seq, fr, cdfs: FrameCdfs, mi_rows: int, mi_cols: int,
                 tile_mi_row_start: int = 0, tile_mi_row_end: int | None = None,
                 tile_mi_col_start: int = 0, tile_mi_col_end: int | None = None):
        self.seq = seq
        self.fr = fr
        self.cdfs = cdfs
        self.enc = EntropyEncoder()
        self.mi_rows = mi_rows
        self.mi_cols = mi_cols
        self.r0 = tile_mi_row_start
        self.r1 = tile_mi_row_end if tile_mi_row_end is not None else mi_rows
        self.c0 = tile_mi_col_start
        self.c1 = tile_mi_col_end if tile_mi_col_end is not None else mi_cols
        self.adapt = not fr.disable_cdf_update

        # neighbor state over the full mi grid (simple; tiles slice it)
        self.y_modes = np.zeros((mi_rows, mi_cols), dtype=np.int8)
        self.skips = np.zeros((mi_rows, mi_cols), dtype=np.int8)
        self.above_part = np.zeros(mi_cols, dtype=np.uint8)
        self.left_part = np.zeros(mi_rows, dtype=np.uint8)
        # coefficient contexts are managed by the coeff writer (set later)
        self.coeff_writer = None

    # ---- symbol helper with adaptation --------------------------------------
    def _sym_at(self, symbol: int, cdf_pair, *idx) -> None:
        values, counters = cdf_pair
        cdf = trim(values[idx]) if idx else trim(values)
        self.enc.encode_symbol(symbol, cdf)
        if self.adapt:
            # trim() returns a view: adaptation mutates the stored CDF
            update_cdf(cdf, symbol, counters[idx] if idx else counters)

    # ---- superblock entry -----------------------------------------------------
    def write_superblock(self, node: PartitionNode, mi_row: int, mi_col: int) -> None:
        sb_bsize = 15 if self.seq.use_128x128_superblock else 12  # B128X128 / B64X64
        self._write_partition_tree(node, mi_row, mi_col, sb_bsize)

    def _write_partition_tree(self, node: PartitionNode, r: int, c: int, bsize: int) -> None:
        if r >= self.r1 or c >= self.c1 or r >= self.mi_rows or c >= self.mi_cols:
            return
        bw4 = int(BLOCK_W[bsize]) >> 2
        bh4 = int(BLOCK_H[bsize]) >> 2
        p = node.partition
        if bw4 > 1:  # is_partition_point (>= 8x8)
            self._write_partition_symbol(p, r, c, bsize, bw4, bh4)
        else:
            assert p == Partition.NONE
        if p == Partition.NONE:
            self._write_block(node.leaf, r, c, bsize)
            return
        sub = subsize(p, bsize)
        hw4, hh4 = bw4 // 2, bh4 // 2
        if p == Partition.SPLIT:
            coords = [(r, c), (r, c + hw4), (r + hh4, c), (r + hh4, c + hw4)]
            for child, (rr, cc) in zip(node.children, coords):
                self._write_partition_tree(child, rr, cc, sub)
        elif p == Partition.HORZ:
            self._write_block(node.children[0].leaf, r, c, sub)
            if r + hh4 < self.mi_rows:
                self._write_block(node.children[1].leaf, r + hh4, c, sub)
        elif p == Partition.VERT:
            self._write_block(node.children[0].leaf, r, c, sub)
            if c + hw4 < self.mi_cols:
                self._write_block(node.children[1].leaf, r, c + hw4, sub)
        else:
            raise NotImplementedError(f"partition {p}")

    def _write_partition_symbol(self, p: int, r: int, c: int, bsize: int,
                                bw4: int, bh4: int) -> None:
        has_rows = (r + bh4 // 2) < self.mi_rows
        has_cols = (c + bw4 // 2) < self.mi_cols
        avail_u = r > self.r0
        avail_l = c > self.c0
        bsl_ctx = bw4.bit_length() - 2  # 8x8 -> 0 ... 128x128 -> 4
        above_bit = (int(self.above_part[c]) >> bsl_ctx) & 1 if avail_u else 0
        left_bit = (int(self.left_part[r]) >> bsl_ctx) & 1 if avail_l else 0
        ctx = (left_bit * 2 + above_bit) + bsl_ctx * 4

        values, counters = self.cdfs.partition
        cdf = trim(values[ctx])
        if not has_rows and not has_cols:
            assert p == Partition.SPLIT
            return
        if has_rows and has_cols:
            self.enc.encode_symbol(p, cdf)
            if self.adapt:
                update_cdf(cdf, p, counters[ctx])
                values[ctx][: len(cdf)] = cdf
        elif has_cols:  # bottom edge: split_or_horz, gathered "vert alike"
            assert p in (Partition.SPLIT, Partition.HORZ)
            bcdf = _gather_split_bool(cdf, bsize, vert=True)
            self.enc.encode_symbol(1 if p == Partition.SPLIT else 0, bcdf)
        else:  # right edge: split_or_vert, gathered "horz alike"
            assert p in (Partition.SPLIT, Partition.VERT)
            bcdf = _gather_split_bool(cdf, bsize, vert=False)
            self.enc.encode_symbol(1 if p == Partition.SPLIT else 0, bcdf)

    # ---- leaf block ------------------------------------------------------------
    def _write_block(self, leaf: LeafBlock, r: int, c: int, bsize: int) -> None:
        bw4 = int(BLOCK_W[bsize]) >> 2
        bh4 = int(BLOCK_H[bsize]) >> 2
        avail_u = r > self.r0
        avail_l = c > self.c0

        # skip flag (intra_frame_mode_info order: skip first)
        above_skip = int(self.skips[r - 1, c]) if avail_u else 0
        left_skip = int(self.skips[r, c - 1]) if avail_l else 0
        skip = 1 if leaf.skip else 0
        self._sym_at(skip, self.cdfs.skip, above_skip + left_skip)

        # intra_frame_y_mode
        above_mode = int(self.y_modes[r - 1, c]) if avail_u else IntraMode.DC
        left_mode = int(self.y_modes[r, c - 1]) if avail_l else IntraMode.DC
        actx = int(INTRA_MODE_CONTEXT[above_mode])
        lctx = int(INTRA_MODE_CONTEXT[left_mode])
        self._sym_at(leaf.y_mode, self.cdfs.kf_y_mode, actx, lctx)
        use_angle = bsize >= 3  # BLOCK_8X8
        if use_angle and leaf.y_mode in DIRECTIONAL:
            self._sym_at(leaf.angle_delta_y + MAX_ANGLE_DELTA,
                         self.cdfs.angle_delta, leaf.y_mode - IntraMode.V)

        has_chroma = self._has_chroma(r, c, bw4, bh4)
        if has_chroma:
            cfl_allowed = 1 if (int(BLOCK_W[bsize]) <= 32 and int(BLOCK_H[bsize]) <= 32) else 0
            self._sym_at(leaf.uv_mode, self.cdfs.uv_mode, cfl_allowed, leaf.y_mode)
            assert leaf.uv_mode != 13, "CFL not implemented yet"
            if use_angle and leaf.uv_mode in DIRECTIONAL:
                self._sym_at(leaf.angle_delta_uv + MAX_ANGLE_DELTA,
                             self.cdfs.angle_delta, leaf.uv_mode - IntraMode.V)

        # filter_intra: seq gate off
        # palette: screen content off

        # residual
        if leaf.skip:
            if self.coeff_writer is not None:
                self.coeff_writer.reset_skip_ctx(r, c, bw4, bh4, has_chroma)
        else:
            assert self.coeff_writer is not None and leaf.coeffs is not None
            for txb in leaf.coeffs:
                self.coeff_writer.write_txb(
                    txb["plane"], txb["plane_bsize"], txb["tx_size"], txb["tx_type"],
                    txb["qcoeff"], txb["eob"], txb["ux"], txb["uy"],
                    write_tx_type_fn=self._make_tx_type_writer(leaf),
                )

        # ---- neighbor state updates ----
        r_end = min(r + bh4, self.mi_rows)
        c_end = min(c + bw4, self.mi_cols)
        self.y_modes[r:r_end, c:c_end] = leaf.y_mode
        self.skips[r:r_end, c:c_end] = skip
        pa, pl = partition_ctx_lookup(bsize)
        self.above_part[c:c_end] = pa
        self.left_part[r:r_end] = pl

    def _make_tx_type_writer(self, leaf: LeafBlock):
        """Returns a callback writing the luma tx_type symbol when the tx
        set for (tx_size, intra) has more than one type (spec
        transform_type(); reference av1_write_tx_type entropy_coding.c:437).
        """

        def write(tx_size: int, tx_type: int) -> None:
            from ..codec.constants import tx_size_sqr, tx_size_sqr_up

            if self.fr.base_q_idx == 0:
                return
            sqr_up = tx_size_sqr_up(tx_size)
            if sqr_up > 3:  # TX_32X32: intra sets are DCT-only at >=32
                return
            if sqr_up == 3:
                return  # intra 32x32: EXT_TX_SET_DCTONLY
            sqr = tx_size_sqr(tx_size)
            if self.fr.reduced_tx_set or sqr == 2:  # 16x16: DTT4_IDTX (5)
                eset, nsym = 2, 5
                ind = {9: 0, 0: 1, 3: 2, 1: 3, 2: 4}[tx_type]
            else:  # 4x4/8x8: DTT4_IDTX_1DDCT (7)
                eset, nsym = 1, 7
                ind = {9: 0, 0: 1, 10: 2, 11: 3, 3: 4, 1: 5, 2: 6}[tx_type]
            self._sym_at(ind, self.cdfs.intra_ext_tx, eset, sqr, leaf.y_mode)

        return write

    def _has_chroma(self, r: int, c: int, bw4: int, bh4: int) -> bool:
        if self.seq.mono_chrome:
            return False
        ok_y = (r % 2 == 1) or (bh4 % 2 == 0) or (self.seq.subsampling_y == 0)
        ok_x = (c % 2 == 1) or (bw4 % 2 == 0) or (self.seq.subsampling_x == 0)
        return ok_y and ok_x

    def finish(self) -> bytes:
        return self.enc.done()


def _gather_split_bool(cdf: np.ndarray, bsize: int, vert: bool) -> np.ndarray:
    """Binary CDF for split_or_{horz,vert} at frame edges (spec 9.3
    partition_gather_*_alike). Symbol 1 = SPLIT, symbol 0 = HORZ/VERT.

    P(split-alike) sums the probabilities of every partition type that
    divides the forced edge; 8x8 alphabets lack the extended types and
    128x128 lacks the _4 types.
    """

    def prob(sym: int) -> int:
        if sym >= len(cdf):
            return 0
        lo = int(cdf[sym - 1]) if sym > 0 else 0
        return int(cdf[sym]) - lo

    if vert:
        gather = [Partition.VERT, Partition.SPLIT, Partition.HORZ_A,
                  Partition.VERT_A, Partition.VERT_B]
        if bsize != 15:  # BLOCK_128X128
            gather.append(Partition.VERT_4)
    else:
        gather = [Partition.HORZ, Partition.SPLIT, Partition.HORZ_A,
                  Partition.HORZ_B, Partition.VERT_A]
        if bsize != 15:
            gather.append(Partition.HORZ_4)
    s = sum(prob(g) for g in gather)
    return np.array([32768 - s, 32768], dtype=np.uint16)
