"""First-pass analysis + two-pass stats (spec-free encoder machinery).

Counterpart: firstpass.c (open-loop DC-intra / simple-MC error
accumulation) + pass2_strategy.c (stats-driven group bit allocation),
reduced to the decision-relevant core:

* pass 1: per frame, intra energy (variance of 8x8 block residuals vs
  their DC) and motion-compensated error vs the previous frame on
  4x-decimated luma — the same two quantities firstpass.c's
  intra_error / coded_error feed into the group allocator.
* stats serialize to a compact little-endian buffer exposed through
  svt_av1_enc_get_stream_info(FIRST_PASS_STATS_OUT).
* pass 2: relative per-frame complexity weights (coded_error ^ 0.6,
  the pass2 boost curve's shape) that scale the single-pass RC's frame
  targets.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

MAGIC = b"SVTP1\x00"
_REC = struct.Struct("<qddi")  # poc, intra_err, inter_err, is_cut


@dataclass
class FrameStats:
    poc: int
    intra_err: float
    inter_err: float
    is_cut: bool


def analyze_frame(luma: np.ndarray, prev_dec, bit_depth: int = 8):
    """-> (FrameStats sans poc fields, decimated luma for the next call).

    prev_dec: previous frame's decimated luma (or None for the first)."""
    from .scd import _mc_mad, decimate_luma, scene_cut

    dec = decimate_luma(luma, bit_depth)
    h, w = dec.shape
    h8, w8 = (h // 8) * 8, (w // 8) * 8
    blocks = dec[:h8, :w8].astype(np.float64).reshape(h8 // 8, 8, w8 // 8, 8)
    intra_err = float(blocks.var(axis=(1, 3)).mean())
    if prev_dec is not None and prev_dec.shape == dec.shape:
        inter_err = _mc_mad(prev_dec, dec) ** 2
        cut = scene_cut(prev_dec, dec)
    else:
        inter_err = intra_err
        cut = True
    return intra_err, inter_err, cut, dec


def serialize(stats: list[FrameStats]) -> bytes:
    out = [MAGIC, struct.pack("<i", len(stats))]
    for s in stats:
        out.append(_REC.pack(s.poc, s.intra_err, s.inter_err,
                             1 if s.is_cut else 0))
    return b"".join(out)


def parse(buf: bytes) -> list[FrameStats]:
    if not buf.startswith(MAGIC):
        raise ValueError("not a first-pass stats buffer")
    (n,) = struct.unpack_from("<i", buf, len(MAGIC))
    stats = []
    off = len(MAGIC) + 4
    for _ in range(n):
        poc, ie, pe, cut = _REC.unpack_from(buf, off)
        off += _REC.size
        stats.append(FrameStats(poc, ie, pe, bool(cut)))
    return stats


def complexity_weights(stats: list[FrameStats]) -> np.ndarray:
    """Relative per-frame bit weights (mean 1.0) from coded-error style
    stats (pass2_strategy.c group boost shape: err^0.6, clamped)."""
    if not stats:
        return np.ones(0)
    err = np.array([max(s.inter_err, 1e-3) for s in stats])
    wts = err ** 0.6
    wts = np.clip(wts / wts.mean(), 0.25, 4.0)
    return wts / wts.mean()
