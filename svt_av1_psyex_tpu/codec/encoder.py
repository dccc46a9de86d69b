"""Frame encoder orchestration: mode decision -> recon -> OBUs.

Two-pass structure per frame:
  1. Analysis/recon pass — walks superblocks in coding order, picks intra
     modes against reconstructed neighbors, runs the device compute chain
     (predict -> residual -> fwd txfm -> quantize -> dequant -> inv txfm
     -> recon). This pass is the seam that moves onto TPU (batched per
     candidate/block); contexts/entropy are untouched here.
  2. Bitstream pass — tile writer emits syntax with CDF adaptation.

Counterpart: the reference's MD + encode-pass pipeline (enc_dec_process.c,
coding_loop.c) collapsed into its minimal intra form.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..bitstream.bitw import BitWriter
from ..bitstream.coeff_writer import CoeffWriter
from ..bitstream.headers import (
    FrameConfig,
    SequenceConfig,
    compute_tile_info,
    write_frame_header,
    write_sequence_header,
)
from ..bitstream.obu import ObuType, temporal_delimiter, wrap_obu
from ..bitstream.tables import FrameCdfs, scan_table
from ..bitstream.tile_writer import LeafBlock, PartitionNode, TileWriter
from ..ops import intra as intra_ops
from ..ops.quant import build_plane_quant, quantize_b
from ..ops.txfm import forward_txfm2d, inverse_txfm2d
from .constants import (
    BLOCK_H,
    BLOCK_W,
    MAX_TX_SIZE_RECT,
    TX_H,
    TX_W,
    BlockSize,
    IntraMode,
    Partition,
    TxType,
    block_size_of,
    subsize,
    tx_size_sqr_up,
)

# tx scale (spec av1_get_tx_scale): 0 for <=16, 1 for 32-class, 2 for 64-class
def tx_log_scale(tx_size: int) -> int:
    up = tx_size_sqr_up(tx_size)
    return 2 if up == 4 else (1 if up == 3 else 0)


# spec intra_mode_to_tx_type (chroma tx type derivation)
_MODE_TO_TXTYPE = {
    IntraMode.DC: TxType.DCT_DCT, IntraMode.V: TxType.ADST_DCT,
    IntraMode.H: TxType.DCT_ADST, IntraMode.D45: TxType.DCT_DCT,
    IntraMode.D135: TxType.ADST_ADST, IntraMode.D113: TxType.ADST_DCT,
    IntraMode.D157: TxType.DCT_ADST, IntraMode.D203: TxType.DCT_ADST,
    IntraMode.D67: TxType.ADST_DCT, IntraMode.SMOOTH: TxType.ADST_ADST,
    IntraMode.SMOOTH_V: TxType.ADST_DCT, IntraMode.SMOOTH_H: TxType.DCT_ADST,
    IntraMode.PAETH: TxType.ADST_ADST,
}


def chroma_tx_type(uv_mode: int, tx_size: int) -> int:
    """Decoder-derived chroma tx type (compute_tx_type for intra chroma)."""
    if tx_size_sqr_up(tx_size) > 2:  # > TX_16X16: DCT only set
        return TxType.DCT_DCT
    t = _MODE_TO_TXTYPE[IntraMode(uv_mode)]
    return t  # members of DTT4 sets are always allowed for <=16


@dataclass
class _PlaneCtx:
    src: np.ndarray  # aligned source
    recon: np.ndarray
    ss_x: int
    ss_y: int


class Av1Encoder:
    """Intra (keyframe) encoder slice. Inter path lands next."""

    CANDIDATE_MODES = [IntraMode.DC, IntraMode.V, IntraMode.H,
                       IntraMode.SMOOTH, IntraMode.PAETH]

    def __init__(self, seq: SequenceConfig):
        self.seq = seq
        self.mi_cols = 2 * ((seq.width + 7) >> 3)
        self.mi_rows = 2 * ((seq.height + 7) >> 3)
        self.aligned_w = self.mi_cols * 4
        self.aligned_h = self.mi_rows * 4
        self.frame_count = 0

    # ---- source preparation ---------------------------------------------------
    def _pad_plane(self, plane: np.ndarray, aw: int, ah: int) -> np.ndarray:
        h, w = plane.shape
        out = np.empty((ah, aw), plane.dtype)
        out[:h, :w] = plane
        if w < aw:
            out[:h, w:] = plane[:, -1:]
        if h < ah:
            out[h:, :] = out[h - 1 : h, :]
        return out

    # ---- partition plan --------------------------------------------------------
    def _plan_superblock(self, mi_row: int, mi_col: int, bsize: int) -> PartitionNode:
        if mi_row >= self.mi_rows or mi_col >= self.mi_cols:
            return PartitionNode(Partition.NONE, leaf=LeafBlock(bsize))
        bw4 = int(BLOCK_W[bsize]) >> 2
        bh4 = int(BLOCK_H[bsize]) >> 2
        fits = (mi_row + bh4 <= self.mi_rows) and (mi_col + bw4 <= self.mi_cols)
        if fits:
            return PartitionNode(Partition.NONE, leaf=LeafBlock(bsize))
        sub = subsize(Partition.SPLIT, bsize)
        half = bw4 // 2
        children = [
            self._plan_superblock(mi_row, mi_col, sub),
            self._plan_superblock(mi_row, mi_col + half, sub),
            self._plan_superblock(mi_row + half, mi_col, sub),
            self._plan_superblock(mi_row + half, mi_col + half, sub),
        ]
        return PartitionNode(Partition.SPLIT, children=children)

    # ---- leaf encode (predict/transform/recon) ----------------------------------
    def _encode_leaf(self, leaf: LeafBlock, r: int, c: int, planes: list[_PlaneCtx],
                     fr: FrameConfig, tw: TileWriter) -> None:
        bsize = leaf.bsize
        bw4 = int(BLOCK_W[bsize]) >> 2
        bh4 = int(BLOCK_H[bsize]) >> 2
        bd = self.seq.bit_depth
        has_chroma = tw._has_chroma(r, c, bw4, bh4) and not self.seq.mono_chrome
        x, y = c * 4, r * 4
        coeffs = []

        # ---- luma mode decision + txb ----
        tx_size = int(MAX_TX_SIZE_RECT[bsize])
        tx_w, tx_h = int(TX_W[tx_size]), int(TX_H[tx_size])
        pc = planes[0]
        have_above = r > 0
        have_left = c > 0
        best = None
        for mode in self.CANDIDATE_MODES:
            pred = self._predict(pc, x, y, tx_w, tx_h, have_above, have_left, mode, bd)
            src = pc.src[y : y + tx_h, x : x + tx_w].astype(np.int32)
            sse = int(((src - pred).astype(np.int64) ** 2).sum())
            if best is None or sse < best[0]:
                best = (sse, mode, pred)
        _, leaf.y_mode, pred = best
        txb = self._code_txb(pc, pred, x, y, tx_size, TxType.DCT_DCT, fr, plane=0,
                             plane_bsize=bsize)
        coeffs.append(txb)

        # ---- chroma ----
        if has_chroma:
            leaf.uv_mode = IntraMode.DC
            ss_x, ss_y = planes[1].ss_x, planes[1].ss_y
            # chroma block covers this block's chroma area (for sub-8x8
            # pairing the odd block carries chroma; v0 blocks are >=8x8)
            cw_px = max(int(BLOCK_W[bsize]) >> ss_x, 4)
            ch_px = max(int(BLOCK_H[bsize]) >> ss_y, 4)
            uv_bsize = block_size_of(cw_px, ch_px)
            uv_tx = int(MAX_TX_SIZE_RECT[uv_bsize])
            # clamp to 32x32 max for chroma
            uv_tx_w, uv_tx_h = int(TX_W[uv_tx]), int(TX_H[uv_tx])
            cx, cy = x >> ss_x, y >> ss_y
            uv_tt = chroma_tx_type(leaf.uv_mode, uv_tx)
            for p in (1, 2):
                pcc = planes[p]
                predc = self._predict(pcc, cx, cy, uv_tx_w, uv_tx_h,
                                      cy > 0, cx > 0, leaf.uv_mode, bd)
                txb = self._code_txb(pcc, predc, cx, cy, uv_tx, uv_tt, fr, plane=p,
                                     plane_bsize=uv_bsize)
                coeffs.append(txb)

        leaf.skip = all(t["eob"] == 0 for t in coeffs)
        leaf.coeffs = None if leaf.skip else coeffs

    def _predict(self, pc: _PlaneCtx, x: int, y: int, w: int, h: int,
                 have_above: bool, have_left: bool, mode: int, bd: int) -> np.ndarray:
        above, left, flat = intra_ops.fill_neighbors(
            pc.recon, x, y, w, h, have_above, have_left, mode, bd)
        if flat is not None:
            return np.full((h, w), flat, np.int32)
        return intra_ops.predict(int(mode), above[None], left[None], w, h,
                                 have_above, have_left, bd)[0]

    def _code_txb(self, pc: _PlaneCtx, pred: np.ndarray, x: int, y: int,
                  tx_size: int, tx_type: int, fr: FrameConfig, plane: int,
                  plane_bsize: int) -> dict:
        bd = self.seq.bit_depth
        tx_w, tx_h = int(TX_W[tx_size]), int(TX_H[tx_size])
        src = pc.src[y : y + tx_h, x : x + tx_w].astype(np.int32)
        resid = src - pred
        coeffs = forward_txfm2d(resid[None], tx_w, tx_h, tx_type, bd)[0]
        ls = tx_log_scale(tx_size)
        dc_delta = fr.delta_q_y_dc if plane == 0 else fr.delta_q_u_dc
        ac_delta = 0 if plane == 0 else fr.delta_q_u_ac
        pq = build_plane_quant(fr.base_q_idx, dc_delta, ac_delta, bd)
        from ..bitstream.coeff_writer import _scan_kind

        scan = scan_table(tx_size, _scan_kind(tx_type))
        qcoeff, dqcoeff, eob = quantize_b(coeffs.reshape(1, -1), scan, pq, ls)
        cw, ch = min(tx_w, 32), min(tx_h, 32)
        eob = int(eob[0])
        # recon
        if eob:
            resid_rec = inverse_txfm2d(dqcoeff.reshape(1, ch, cw), tx_w, tx_h, tx_type, bd)[0]
            recon = np.clip(pred + resid_rec, 0, (1 << bd) - 1)
        else:
            recon = np.clip(pred, 0, (1 << bd) - 1)
        pc.recon[y : y + tx_h, x : x + tx_w] = recon
        return {
            "plane": plane, "plane_bsize": plane_bsize, "tx_size": tx_size,
            "tx_type": int(tx_type), "qcoeff": qcoeff.reshape(ch, cw), "eob": eob,
            "ux": x >> 2, "uy": y >> 2,
        }

    # ---- leaf walk in coding order ----------------------------------------------
    def _walk(self, node: PartitionNode, r: int, c: int, bsize: int, visit) -> None:
        if r >= self.mi_rows or c >= self.mi_cols:
            return
        p = node.partition
        if p == Partition.NONE:
            visit(node.leaf, r, c)
            return
        sub = subsize(p, bsize)
        bw4 = int(BLOCK_W[bsize]) >> 2
        hw4 = bw4 // 2
        if p == Partition.SPLIT:
            coords = [(r, c), (r, c + hw4), (r + hw4, c), (r + hw4, c + hw4)]
            for child, (rr, cc) in zip(node.children, coords):
                self._walk(child, rr, cc, sub, visit)
        else:
            raise NotImplementedError

    # ---- frame encode --------------------------------------------------------------
    def encode_keyframe(self, planes: list[np.ndarray] | None,
                        base_q_idx: int = 80) -> bytes:
        seq = self.seq
        fr = FrameConfig(frame_type=0, show_frame=True, base_q_idx=base_q_idx,
                         order_hint=self.frame_count & ((1 << seq.order_hint_bits) - 1))
        fr.tile = compute_tile_info(seq)
        assert fr.tile.tile_cols == 1 and fr.tile.tile_rows == 1, "multi-tile later"

        cdfs = FrameCdfs(base_q_idx)
        tw = TileWriter(seq, fr, cdfs, self.mi_rows, self.mi_cols)
        tw.coeff_writer = CoeffWriter(tw, self.mi_rows, self.mi_cols,
                                      seq.subsampling_x, seq.subsampling_y)

        sb_mi = 32 if seq.use_128x128_superblock else 16
        sb_bsize = BlockSize.B128X128 if seq.use_128x128_superblock else BlockSize.B64X64

        if planes is None:
            planes = [np.full((seq.height, seq.width), 128, np.uint8)]
            if not seq.mono_chrome:
                ch = (seq.height + seq.subsampling_y) >> seq.subsampling_y
                cw = (seq.width + seq.subsampling_x) >> seq.subsampling_x
                planes += [np.full((ch, cw), 128, np.uint8)] * 2

        pctx = []
        for i, p in enumerate(planes):
            ss_x = 0 if i == 0 else seq.subsampling_x
            ss_y = 0 if i == 0 else seq.subsampling_y
            aw = self.aligned_w >> ss_x
            ah = self.aligned_h >> ss_y
            src = self._pad_plane(np.asarray(p), aw, ah).astype(np.int32)
            pctx.append(_PlaneCtx(src=src, recon=np.zeros((ah, aw), np.int32),
                                  ss_x=ss_x, ss_y=ss_y))

        # pass 1: analysis + recon, building the plan; pass 2: syntax
        sb_plans = []
        for r in range(0, self.mi_rows, sb_mi):
            for c in range(0, self.mi_cols, sb_mi):
                node = self._plan_superblock(r, c, sb_bsize)
                self._walk(node, r, c, sb_bsize,
                           lambda leaf, rr, cc: self._encode_leaf(leaf, rr, cc, pctx, fr, tw))
                sb_plans.append((node, r, c))
        for node, r, c in sb_plans:
            tw.write_superblock(node, r, c)
        tile_payload = tw.finish()

        w = BitWriter()
        write_frame_header(seq, fr, w)
        w.byte_align()
        frame_payload = w.data() + tile_payload

        tu = temporal_delimiter()
        if self.frame_count == 0:
            tu += wrap_obu(ObuType.SEQUENCE_HEADER, write_sequence_header(seq))
        tu += wrap_obu(ObuType.FRAME, frame_payload)
        self.frame_count += 1
        self.last_recon = [np.clip(p.recon, 0, 255).astype(np.uint8) for p in pctx]
        return tu
