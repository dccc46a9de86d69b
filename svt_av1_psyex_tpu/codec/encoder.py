"""Frame encoder orchestration: mode decision plan -> OBUs.

This is the top of the codec layer: it owns sequence/frame configs,
builds the per-frame partition plan (mode decision), runs the device
compute path (prediction/transform/quant/recon), and drives the
bitstream writers. Counterpart (vastly simplified at this stage):
the reference's enc_dec + packetization pipeline.
"""

from __future__ import annotations

import numpy as np

from ..bitstream.bitw import BitWriter
from ..bitstream.headers import (
    FrameConfig,
    SequenceConfig,
    compute_tile_info,
    write_frame_header,
    write_sequence_header,
)
from ..bitstream.obu import ObuType, temporal_delimiter, wrap_obu
from ..bitstream.tables import FrameCdfs
from ..bitstream.tile_writer import LeafBlock, PartitionNode, TileWriter
from .constants import BlockSize, IntraMode, Partition


class Av1Encoder:
    """Minimal AV1 encoder: keyframe-only at this stage."""

    def __init__(self, seq: SequenceConfig):
        self.seq = seq
        self.mi_cols = 2 * ((seq.width + 7) >> 3)
        self.mi_rows = 2 * ((seq.height + 7) >> 3)
        self.frame_count = 0

    # ---- plan construction (trivial mode decision for now) -------------------
    def _plan_superblock(self, mi_row: int, mi_col: int, bsize: int) -> PartitionNode:
        """All-DC plan: NONE where the block fits the mi grid, SPLIT at edges."""
        from .constants import BLOCK_H, BLOCK_W, subsize

        if mi_row >= self.mi_rows or mi_col >= self.mi_cols:
            # entirely outside the mi grid: never coded, placeholder leaf
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

    # ---- frame encode -----------------------------------------------------------
    def encode_keyframe(self, planes: list[np.ndarray], base_q_idx: int = 80) -> bytes:
        seq = self.seq
        fr = FrameConfig(frame_type=0, show_frame=True, base_q_idx=base_q_idx,
                         order_hint=self.frame_count & ((1 << seq.order_hint_bits) - 1))
        fr.tile = compute_tile_info(seq)
        assert fr.tile.tile_cols == 1 and fr.tile.tile_rows == 1, "multi-tile later"

        cdfs = FrameCdfs(base_q_idx)
        tw = TileWriter(seq, fr, cdfs, self.mi_rows, self.mi_cols)

        sb_mi = 32 if seq.use_128x128_superblock else 16
        sb_bsize = BlockSize.B128X128 if seq.use_128x128_superblock else BlockSize.B64X64
        for r in range(0, self.mi_rows, sb_mi):
            for c in range(0, self.mi_cols, sb_mi):
                node = self._plan_superblock(r, c, sb_bsize)
                tw.write_superblock(node, r, c)
        tile_payload = tw.finish()

        # assemble OBU_FRAME: header bits + byte alignment + tile group
        w = BitWriter()
        write_frame_header(seq, fr, w)
        w.byte_align()
        frame_payload = w.data() + tile_payload

        tu = temporal_delimiter()
        if self.frame_count == 0:
            tu += wrap_obu(ObuType.SEQUENCE_HEADER, write_sequence_header(seq))
        tu += wrap_obu(ObuType.FRAME, frame_payload)
        self.frame_count += 1
        return tu
