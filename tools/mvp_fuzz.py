#!/usr/bin/env python3
"""Differential MVP fuzzer: forced inter/compound leaves vs dav1d.

Builds streams directly at the TileWriter level (no MD): a gray KF, two
no-show GLOBALMV frames that plant future order hints in DPB slots, then
one inter frame whose blocks are all-skip forced-mode leaves (NEWMV /
NEAREST / NEAR / GLOBAL, single and compound; 3 named refs with real
past+future sign bias). Every block's recon is its motion-compensated
prediction, with MVs derived from OUR find_mv_stack exactly like the
commit path derives them. If dav1d's MVP derivation disagrees anywhere
(order, dedup, sign-bias flips, clamp, weights), its decoded MVs differ
and the recon comparison catches it.

This is the tool that localized the round-5 720p compound desync.

Usage:
  python tools/mvp_fuzz.py [--seeds 200] [--w 192 --h 128]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from svt_av1_psyex_tpu.bitstream.bitw import BitWriter
from svt_av1_psyex_tpu.bitstream.coeff_writer import CoeffWriter
from svt_av1_psyex_tpu.bitstream.headers import (
    FrameConfig,
    SequenceConfig,
    compute_tile_info,
    write_frame_header,
)
from svt_av1_psyex_tpu.bitstream.obu import ObuType, temporal_delimiter, wrap_obu
from svt_av1_psyex_tpu.bitstream.tables import FrameCdfs
from svt_av1_psyex_tpu.bitstream.tile_writer import LeafBlock, PartitionNode, TileWriter
from svt_av1_psyex_tpu.codec.constants import (
    BlockSize,
    InterMode,
    Partition,
    mode_has_newmv,
)
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
from svt_av1_psyex_tpu.codec.mvp import MiState, find_mv_stack
from svt_av1_psyex_tpu.ops.mc import mc_block, mc_block_compound

LAST, BWDREF, ALTREF = 1, 5, 7

_KF_CACHE: dict = {}


def _kf(w, h, q, bd=8):
    """One KF encode per (w, h, q, bd), shared by every seed (host MD:
    the fuzzer targets writer/MVP behavior, not the device tier)."""
    import os

    key = (w, h, q, bd)
    if key not in _KF_CACHE:
        os.environ["SVT_TPU_HOST_MD"] = "1"
        seq = SequenceConfig(width=w, height=h, bit_depth=bd)
        enc = Av1Encoder(seq, preset=10, enable_variance_boost=False,
                         enable_dlf=False, enable_restoration=False,
                         enable_mfmv=False)
        seq.enable_cdef = False
        yy, xx = np.mgrid[0:h, 0:w]
        sc = 1 << (bd - 8)
        dt = np.uint8 if bd == 8 else np.uint16
        kf_planes = [
            (np.clip(120 + 60 * np.sin(xx / 5.0) * np.cos(yy / 7.0),
                     0, 255) * sc).astype(dt),
            np.full(((h + 1) >> 1, (w + 1) >> 1), 120 * sc, dt),
            np.full(((h + 1) >> 1, (w + 1) >> 1), 135 * sc, dt)]
        tu_kf = enc.encode_keyframe([p.copy() for p in kf_planes], q)
        _KF_CACHE[key] = (seq, enc, tu_kf)
    return _KF_CACHE[key]


def _forced_frame(seq, mi_rows, mi_cols, q, order_hint, show,
                  refresh_flags, ref_frame_idx, ref_order_hints,
                  sign_bias, leaf_fn, reference_select,
                  tx_mode_select=False, cdfs=None, primary_ref=7):
    """One forced inter frame: leaf_fn(r, c, mi) -> LeafBlock per SB.
    Returns (tu_bytes,). The caller maintains recon/DPB bookkeeping."""
    fr = FrameConfig(frame_type=1, show_frame=show, base_q_idx=q,
                     order_hint=order_hint)
    fr.refresh_frame_flags = refresh_flags
    fr.ref_frame_idx = tuple(ref_frame_idx)
    fr.ref_order_hints = tuple(ref_order_hints)
    fr.reference_select = reference_select
    fr.interp_filter = 4  # SWITCHABLE: leaves carry per-block filters
    fr.tx_mode_select = tx_mode_select
    fr.tile = compute_tile_info(seq)
    fr.primary_ref_frame = primary_ref

    if cdfs is None:
        cdfs = FrameCdfs(q)
    tw = TileWriter(seq, fr, cdfs, mi_rows, mi_cols)
    tw.coeff_writer = CoeffWriter(tw, mi_rows, mi_cols,
                                  seq.subsampling_x, seq.subsampling_y)
    tw.mi_state = MiState(mi_rows, mi_cols)
    tw.mi_state.sign_bias = sign_bias

    mi = MiState(mi_rows, mi_cols)
    mi.sign_bias = sign_bias

    sb_plans = []
    for r in range(0, mi_rows, 16):
        for c in range(0, mi_cols, 16):
            node = leaf_fn(r, c, mi)
            if isinstance(node, LeafBlock):
                leaf = node
                if leaf.ref_frame1 >= 1:
                    mi.set_block(r, c, BlockSize.B64X64, leaf.ref_frame,
                                 leaf.mv, mode_has_newmv(leaf.inter_mode),
                                 ref_frame1=leaf.ref_frame1, mv1=leaf.mv1)
                else:
                    mi.set_block(r, c, BlockSize.B64X64, leaf.ref_frame,
                                 leaf.mv, mode_has_newmv(leaf.inter_mode))
                node = PartitionNode(Partition.NONE, leaf=leaf)
            sb_plans.append((node, r, c))
    for node, r, c in sb_plans:
        tw.write_superblock(node, r, c)
    tile = tw.finish()
    cdfs.reset_counters()  # frame-context save (encoder _finalize_frame)
    wbits = BitWriter()
    write_frame_header(seq, fr, wbits)
    wbits.byte_align()
    return (temporal_delimiter() + wrap_obu(ObuType.FRAME,
                                            wbits.data() + tile), cdfs)


def build_stream(w, h, leaf_gen, q=100, with_coeffs=False, bd=8):
    """KF + 2 hint-planting no-show frames + 1 forced fuzz frame.
    leaf_gen(r, c, stack_fn) -> LeafBlock per 64x64 SB of the fuzz
    frame; returns (ivf_bytes, fuzz_recon_planes)."""
    seq, enc, tu_kf = _kf(w, h, q, bd)
    mi_rows, mi_cols = enc.mi_rows, enc.mi_cols
    # crop DPB planes to display dims (spec 7.11.3.3 clamps MC samples
    # at the reference's display bounds — the encoder's begin_frame
    # crop(); the slot arrays carry aligned+margin extents)
    cdims = [(h, w), ((h + 1) >> 1, (w + 1) >> 1),
             ((h + 1) >> 1, (w + 1) >> 1)]
    kf_recon = [p.astype(np.int32)[:cdims[i][0], :cdims[i][1]]
                for i, p in enumerate(enc.slots[0]["recon"])]

    def skip_global(r, c, mi):
        return LeafBlock(BlockSize.B64X64, skip=True, is_inter=True,
                         ref_frame=LAST, inter_mode=int(InterMode.GLOBALMV),
                         mv=(0, 0), drl_index=0)

    tus = [tu_kf]
    # plant future hints: no-show GLOBALMV-skip frames into slots 1, 2
    # (recon == the KF recon, so every slot's samples stay identical)
    zero_bias = np.zeros(8, bool)
    for hint, slot in ((4, 1), (6, 2)):
        tus.append(_forced_frame(
            seq, mi_rows, mi_cols, q, hint, False, 1 << slot,
            (0,) * 7, (0,) * 7, zero_bias, skip_global, False)[0])

    # fuzz frame: order_hint 2; LAST=slot0 (hint 0, past), BWDREF=slot1
    # (hint 4, future), ALTREF=slot2 (hint 6, future)
    cur_hint = 2
    ref_idx = (0, 0, 0, 0, 1, 1, 2)
    hints_of_slot = {0: 0, 1: 4, 2: 6}
    ref_hints = tuple(hints_of_slot[ref_idx[n]] for n in range(7))
    sign_bias = np.zeros(8, bool)
    for name in range(1, 8):
        sign_bias[name] = ref_hints[name - 1] > cur_hint

    ref_planes = {n: kf_recon for n in (LAST, BWDREF, ALTREF)}
    recon = [p.copy() for p in kf_recon]

    from svt_av1_psyex_tpu.codec.constants import (
        BLOCK_H,
        BLOCK_W,
        MAX_TX_SIZE_RECT,
        SPLIT_TX_SIZE,
        TX_H,
        TX_W,
        TxType,
    )

    # residual-coding mode: noisy source + CommitCtx -> real coefficients
    # and tx-depth trials ride through the writer like the encoder's
    coeff_ctx = None
    src_planes = None
    if with_coeffs:
        from svt_av1_psyex_tpu.codec.encoder import _PlaneCtx
        from svt_av1_psyex_tpu.native import commit as native_commit

        if not native_commit.available():
            raise RuntimeError("native commit unavailable")
        coeff_ctx = native_commit.CommitCtx(bd)
        nrng = np.random.RandomState(9999)
        src_planes = []
        maxv = (1 << bd) - 1
        for i, p in enumerate(kf_recon):
            noise = nrng.randint(-12 << (bd - 8), (13 << (bd - 8)) + 1,
                                 p.shape)
            src_planes.append(_PlaneCtx(
                src=np.clip(p + noise, 0, maxv).astype(np.int32),
                recon=np.zeros_like(p, np.int32),
                ss_x=0 if i == 0 else 1, ss_y=0 if i == 0 else 1))

    def commit_txbs(leaf, r, c, bsize, pred_y, predu, predv, tx_depth):
        """Commit real coefficients at the given inter tx depth; returns
        (txbs, skip) and leaves recon in src_planes[\\*].recon."""
        x, y = c * 4, r * 4
        tx = int(MAX_TX_SIZE_RECT[bsize])
        for _ in range(tx_depth):
            tx = int(SPLIT_TX_SIZE[tx])
        txw, txh = int(TX_W[tx]), int(TX_H[tx])
        bw, bh = int(BLOCK_W[bsize]), int(BLOCK_H[bsize])
        txbs = []
        for ty in range(0, bh, txh):
            for txx in range(0, bw, txw):
                pr = np.ascontiguousarray(
                    pred_y[ty : ty + txh, txx : txx + txw], np.int32)
                qc, eob = coeff_ctx.run(src_planes[0], pr, x + txx, y + ty,
                                        tx, q, 0, 0, plane=0, is_inter=True)
                txbs.append({"plane": 0, "plane_bsize": bsize,
                             "tx_size": tx, "tx_type": int(TxType.DCT_DCT),
                             "qcoeff": qc, "eob": eob,
                             "ux": (x + txx) >> 2, "uy": (y + ty) >> 2})
        from svt_av1_psyex_tpu.codec.constants import block_size_of

        cw_px = max(bw >> 1, 4)
        ch_px = max(bh >> 1, 4)
        uv_bsize = block_size_of(cw_px, ch_px)
        uv_tx = int(MAX_TX_SIZE_RECT[uv_bsize])
        cx, cy = x >> 1, y >> 1
        for p, pc in ((1, predu), (2, predv)):
            qc, eob = coeff_ctx.run(
                src_planes[p],
                np.ascontiguousarray(pc[: int(TX_H[uv_tx]),
                                        : int(TX_W[uv_tx])], np.int32),
                cx, cy, uv_tx, q, 0, 0, plane=p, is_inter=True)
            txbs.append({"plane": p, "plane_bsize": uv_bsize,
                         "tx_size": uv_tx, "tx_type": int(TxType.DCT_DCT),
                         "qcoeff": qc, "eob": eob, "ux": cx >> 2,
                         "uy": cy >> 2})
        skip = all(t["eob"] == 0 for t in txbs)
        return txbs, skip

    from svt_av1_psyex_tpu.codec.constants import IntraMode, block_size_of
    from svt_av1_psyex_tpu.ops import intra as intra_ops

    def _intra_txb(plane, px, py, ptx, rec_arr, pc):
        txw, txh = int(TX_W[ptx]), int(TX_H[ptx])
        above, left, flat = intra_ops.fill_neighbors(
            rec_arr, px, py, txw, txh, py > 0, px > 0,
            int(IntraMode.DC), bd)
        if flat is None:
            pred = intra_ops.predict(int(IntraMode.DC), above[None],
                                     left[None], txw, txh, py > 0, px > 0,
                                     bd)[0]
        else:
            pred = np.full((txh, txw), flat, np.int32)
        if with_coeffs:
            return coeff_ctx.run(pc, np.ascontiguousarray(pred, np.int32),
                                 px, py, ptx, q, 0, 0, plane=plane,
                                 is_inter=False)
        rec_arr[py : py + txh, px : px + txw] = pred
        return np.zeros((min(txh, 32), min(txw, 32)), np.int32), 0

    def commit_intra_leaf(leaf, r, c, bsize, mi):
        x, y = c * 4, r * 4
        bw, bh = int(BLOCK_W[bsize]), int(BLOCK_H[bsize])
        tx = int(MAX_TX_SIZE_RECT[bsize])
        for _ in range(leaf.tx_depth):
            tx = int(SPLIT_TX_SIZE[tx])
        txw, txh = int(TX_W[tx]), int(TX_H[tx])
        luma_rec = src_planes[0].recon if with_coeffs else recon[0]
        txbs = []
        for ty in range(0, bh, txh):
            for txx in range(0, bw, txw):
                qc, eob = _intra_txb(0, x + txx, y + ty, tx, luma_rec,
                                     src_planes[0] if with_coeffs else None)
                txbs.append({"plane": 0, "plane_bsize": bsize,
                             "tx_size": tx, "tx_type": int(TxType.DCT_DCT),
                             "qcoeff": qc, "eob": eob,
                             "ux": (x + txx) >> 2, "uy": (y + ty) >> 2})
        cw_px, ch_px = max(bw >> 1, 4), max(bh >> 1, 4)
        uv_bsize = block_size_of(cw_px, ch_px)
        uv_tx = int(MAX_TX_SIZE_RECT[uv_bsize])
        cx, cy = x >> 1, y >> 1
        for pnum in (1, 2):
            prec = src_planes[pnum].recon if with_coeffs else recon[pnum]
            qc, eob = _intra_txb(pnum, cx, cy, uv_tx, prec,
                                 src_planes[pnum] if with_coeffs else None)
            txbs.append({"plane": pnum, "plane_bsize": uv_bsize,
                         "tx_size": uv_tx, "tx_type": int(TxType.DCT_DCT),
                         "qcoeff": qc, "eob": eob, "ux": cx >> 2,
                         "uy": cy >> 2})
        if with_coeffs:
            skip = all(t["eob"] == 0 for t in txbs)
            leaf.skip = skip
            leaf.coeffs = None if skip else txbs
            ch = max(bh >> 1, 4)
            cw = max(bw >> 1, 4)
            recon[0][y : y + bh, x : x + bw] = \
                src_planes[0].recon[y : y + bh, x : x + bw]
            recon[1][cy : cy + ch, cx : cx + cw] = \
                src_planes[1].recon[cy : cy + ch, cx : cx + cw]
            recon[2][cy : cy + ch, cx : cx + cw] = \
                src_planes[2].recon[cy : cy + ch, cx : cx + cw]
        mi.set_block(r, c, bsize, -1, (0, 0), False)

    def commit_leaf(leaf, r, c, bsize, mi):
        if not leaf.is_inter:
            return commit_intra_leaf(leaf, r, c, bsize, mi)
        x, y = c * 4, r * 4
        bw, bh = int(BLOCK_W[bsize]), int(BLOCK_H[bsize])
        cw, ch = max(bw >> 1, 4), max(bh >> 1, 4)
        if leaf.ref_frame1 >= 1:
            pred = mc_block_compound(
                ref_planes[leaf.ref_frame][0],
                ref_planes[leaf.ref_frame1][0], x, y, bw, bh,
                leaf.mv, leaf.mv1, 0, 0, bit_depth=bd)
            predu = mc_block_compound(
                ref_planes[leaf.ref_frame][1],
                ref_planes[leaf.ref_frame1][1], x >> 1, y >> 1, cw, ch,
                leaf.mv, leaf.mv1, 1, 1, bit_depth=bd)
            predv = mc_block_compound(
                ref_planes[leaf.ref_frame][2],
                ref_planes[leaf.ref_frame1][2], x >> 1, y >> 1, cw, ch,
                leaf.mv, leaf.mv1, 1, 1, bit_depth=bd)
        else:
            flt = getattr(leaf, "interp_filter", 0)
            pred = mc_block(ref_planes[leaf.ref_frame][0], x, y, bw, bh,
                            leaf.mv[0], leaf.mv[1], 0, 0, flt, flt,
                            bit_depth=bd)
            predu = mc_block(ref_planes[leaf.ref_frame][1], x >> 1,
                             y >> 1, cw, ch, leaf.mv[0], leaf.mv[1], 1, 1,
                             flt, flt, bit_depth=bd)
            predv = mc_block(ref_planes[leaf.ref_frame][2], x >> 1,
                             y >> 1, cw, ch, leaf.mv[0], leaf.mv[1], 1, 1,
                             flt, flt, bit_depth=bd)
        if with_coeffs:
            txbs, skip = commit_txbs(leaf, r, c, bsize, pred, predu, predv,
                                     leaf.tx_depth)
            leaf.skip = skip
            leaf.coeffs = None if skip else txbs
            cy, cx = y >> 1, x >> 1
            recon[0][y : y + bh, x : x + bw] = \
                src_planes[0].recon[y : y + bh, x : x + bw]
            recon[1][cy : cy + ch, cx : cx + cw] = \
                src_planes[1].recon[cy : cy + ch, cx : cx + cw]
            recon[2][cy : cy + ch, cx : cx + cw] = \
                src_planes[2].recon[cy : cy + ch, cx : cx + cw]
        else:
            recon[0][y : y + bh, x : x + bw] = pred
            recon[1][y >> 1 : (y >> 1) + ch, x >> 1 : (x >> 1) + cw] = predu
            recon[2][y >> 1 : (y >> 1) + ch, x >> 1 : (x >> 1) + cw] = predv
        if leaf.ref_frame1 >= 1:
            mi.set_block(r, c, bsize, leaf.ref_frame, leaf.mv,
                         mode_has_newmv(leaf.inter_mode),
                         ref_frame1=leaf.ref_frame1, mv1=leaf.mv1)
        else:
            mi.set_block(r, c, bsize, leaf.ref_frame, leaf.mv,
                         mode_has_newmv(leaf.inter_mode),
                         interp_filter=getattr(leaf, "interp_filter", 0))

    def fuzz_leaf(r, c, mi):
        """One SB: either a single 64x64 leaf or a split into 32x32
        (each optionally split into 16x16) — leaf_gen decides per node
        via its optional `split` protocol."""
        def build(rr, cc, bsize):
            sub = leaf_gen(rr, cc, bsize,
                           lambda rf: find_mv_stack(mi, rr, cc, bsize, rf))
            if sub == "split":
                from svt_av1_psyex_tpu.codec.constants import subsize

                nsz = subsize(Partition.SPLIT, bsize)
                half = (int(BLOCK_W[bsize]) >> 2) >> 1
                kids = [build(r2, c2, nsz)
                        for r2, c2 in ((rr, cc), (rr, cc + half),
                                       (rr + half, cc),
                                       (rr + half, cc + half))]
                return PartitionNode(Partition.SPLIT, children=kids)
            commit_leaf(sub, rr, cc, bsize, mi)
            return PartitionNode(Partition.NONE, leaf=sub)

        return build(r, c, BlockSize.B64X64)

    tuA, cdfsA = _forced_frame(
        seq, mi_rows, mi_cols, q, cur_hint, True, 1 << 3, ref_idx,
        ref_hints, sign_bias, fuzz_leaf, True, tx_mode_select=with_coeffs)
    tus.append(tuA)
    reconA = [p.copy() for p in recon]

    # chained frame B: LAST = frame A (slot 3, hint 2) with CDF
    # FORWARDING from A's end-of-tile state (primary_ref_frame = LAST).
    # Any context-selection divergence inside A that decoded the same
    # values still desyncs B here, like the encoder's primary-ref chain.
    ref_planes[LAST] = reconA
    cur2 = 3
    ref_idx2 = (3, 3, 3, 3, 1, 1, 2)
    hints2 = {3: 2, 1: 4, 2: 6}
    ref_hints2 = tuple(hints2[ref_idx2[n]] for n in range(7))
    sign_bias2 = np.zeros(8, bool)
    for name in range(1, 8):
        sign_bias2[name] = ref_hints2[name - 1] > cur2
    tuB, _ = _forced_frame(
        seq, mi_rows, mi_cols, q, cur2, True, 0, ref_idx2, ref_hints2,
        sign_bias2, fuzz_leaf, True, tx_mode_select=with_coeffs,
        cdfs=cdfsA.clone(), primary_ref=0)
    tus.append(tuB)
    reconB = [p.copy() for p in recon]

    from io import BytesIO

    from svt_av1_psyex_tpu.utils.ivf import IvfWriter

    bio = BytesIO()
    iw = IvfWriter(bio, w, h)
    for i, tu in enumerate(tus):
        iw.write_frame(tu, i)
    iw.close()
    return bio.getvalue(), (reconA, reconB)


def mk_leaf(kind, rf, stack, rng, bsize=BlockSize.B64X64):
    """LeafBlock for a forced compound/single mode; MVs derived from the
    stack exactly like the commit path (md_device._commit_*_leaf)."""
    if kind == "intra":
        return LeafBlock(bsize, y_mode=0, uv_mode=0, skip=True,
                         drl_index=0)
    is_comp = isinstance(rf, tuple)
    if is_comp:
        if kind == "nearest":
            mode, mv, mv1 = (InterMode.NEAREST_NEARESTMV, stack.mvs[0],
                             stack.comp_mvs[0])
        elif kind == "near" and stack.count >= 2:
            mode, mv, mv1 = (InterMode.NEAR_NEARMV, stack.mvs[1],
                             stack.comp_mvs[1])
        elif kind == "global":
            mode, mv, mv1 = InterMode.GLOBAL_GLOBALMV, (0, 0), (0, 0)
        else:
            mode = InterMode.NEW_NEWMV
            mv = (int(rng.integers(-300, 301)) * 2,
                  int(rng.integers(-300, 301)) * 2)
            mv1 = (int(rng.integers(-300, 301)) * 2,
                   int(rng.integers(-300, 301)) * 2)
        return LeafBlock(bsize, skip=True, is_inter=True,
                         ref_frame=rf[0], ref_frame1=rf[1],
                         inter_mode=int(mode), mv=tuple(mv), mv1=tuple(mv1),
                         drl_index=0)
    if kind == "nearest":
        mode, mv = InterMode.NEARESTMV, stack.mvs[0]
    elif kind == "near" and stack.count >= 2:
        mode, mv = InterMode.NEARMV, stack.mvs[1]
    elif kind == "global":
        mode, mv = InterMode.GLOBALMV, (0, 0)
    else:
        mode = InterMode.NEWMV
        mv = (int(rng.integers(-300, 301)) * 2,
              int(rng.integers(-300, 301)) * 2)
    leaf = LeafBlock(bsize, skip=True, is_inter=True,
                     ref_frame=rf, inter_mode=int(mode), mv=tuple(mv),
                     drl_index=0)
    # switchable interp filter (REG/SMOOTH/SHARP) when any subpel bits
    if (mv[0] | mv[1]) & 7:
        leaf.interp_filter = int(rng.integers(0, 3))
    return leaf


def run_seed(seed, w, h, with_coeffs=False, bd=8):
    rng = np.random.default_rng(seed)
    kinds = ["nearest", "near", "global", "new", "new", "intra"]
    refs = [LAST, BWDREF, ALTREF, (LAST, ALTREF), (LAST, BWDREF),
            (LAST, ALTREF)]

    def gen(r, c, bsize, stack_fn):
        # random quadtree: split 64->32 (30%), 32->16 (20%)
        if bsize == BlockSize.B64X64 and rng.random() < 0.30:
            return "split"
        if bsize == BlockSize.B32X32 and rng.random() < 0.20:
            return "split"
        rf = refs[int(rng.integers(0, len(refs)))]
        kind = kinds[int(rng.integers(0, len(kinds)))]
        leaf = mk_leaf(kind, rf, stack_fn(rf), rng, bsize)
        if with_coeffs:
            leaf.tx_depth = int(rng.integers(0, 2))
        return leaf

    ivf, (reconA, reconB) = build_stream(w, h, gen, with_coeffs=with_coeffs, bd=bd)
    import tempfile

    from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf

    with tempfile.NamedTemporaryFile(suffix=".ivf") as f:
        f.write(ivf)
        f.flush()
        dec = decode_ivf(f.name)
    assert len(dec) == 3, f"seed {seed}: decoded {len(dec)} frames"
    bad = []
    for fi, rec in ((1, reconA), (2, reconB)):
        for i in range(3):
            dh, dw = dec[fi][i].shape
            d = dec[fi][i].astype(np.int64) - rec[i][:dh, :dw]
            if (d != 0).any():
                bad.append((fi, i, int((d != 0).sum()),
                            int(np.abs(d).max())))
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--w", type=int, default=192)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--coeffs", action="store_true",
                    help="code real residuals + random inter tx depth")
    ap.add_argument("--bd", type=int, default=8)
    args = ap.parse_args()
    fails = 0
    for seed in range(args.start, args.start + args.seeds):
        bad = run_seed(seed, args.w, args.h, with_coeffs=args.coeffs, bd=args.bd)
        if bad:
            fails += 1
            print(f"SEED {seed}: MISMATCH {bad}", flush=True)
    print(f"{args.seeds} seeds, {fails} mismatching", flush=True)


if __name__ == "__main__":
    main()
