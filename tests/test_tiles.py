"""Multi-tile (tile columns): independent per-tile MD + entropy
partitions, tile-group assembly, dav1d conformance."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.bitstream.headers import (  # noqa: E402
    SequenceConfig,
    compute_tile_info,
)
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.codec.gop import plan_key, plan_minigop  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402


def test_tile_info_geometry():
    seq = SequenceConfig(width=256, height=128)
    ti = compute_tile_info(seq, cols_log2=1)
    assert ti.tile_cols == 2 and ti.tile_rows == 1
    assert ti.col_starts_sb == [0, 2, 4]
    # log2 clamped to what the SB count allows
    ti = compute_tile_info(seq, cols_log2=4)
    assert ti.tile_cols == 4  # only 4 SB cols at 256 wide
    # single-tile default unchanged
    ti = compute_tile_info(seq)
    assert ti.tile_cols == 1


def _roundtrip_frames(enc, frames, plans, q, tmp_path, name):
    path = tmp_path / f"{name}.ivf"
    recons = {}
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, enc.seq.width, enc.seq.height)
        n = 0
        for pl in plans:
            src = frames[pl.disp_idx] if pl.show_existing_slot is None else None
            tu = enc.encode_frame(src, q, plan=pl)
            wr.write_frame(tu, n)
            n += 1
            if pl.show_frame or pl.show_existing_slot is not None:
                recons[pl.disp_idx] = [p.copy() for p in enc.last_recon]
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == len(recons)
    for t in sorted(recons):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)


def test_two_tile_intra_bitexact(tmp_path):
    w, h = 256, 128
    fmt = VideoFormat(w, h)
    frames = [synth_frame(fmt, 0, "blobs")]
    enc = Av1Encoder(SequenceConfig(width=w, height=h), preset=8,
                     tile_cols_log2=1)
    _roundtrip_frames(enc, frames, [plan_key(0)], 120, tmp_path, "t2i")


def test_four_tile_preset6_bitexact(tmp_path):
    """4 tile columns with the full preset-6 toolset (filter intra, CfL,
    restoration, TX_MODE_SELECT) and per-tile LR running refs."""
    w, h = 384, 128
    fmt = VideoFormat(w, h)
    frames = [synth_frame(fmt, 0, "blobs")]
    enc = Av1Encoder(SequenceConfig(width=w, height=h), preset=6,
                     tile_cols_log2=2)
    _roundtrip_frames(enc, frames, [plan_key(0)], 100, tmp_path, "t4p6")


def test_two_tile_inter_bitexact(tmp_path):
    """Inter mini-GOP across 2 tiles: tile-local MVP scans/contexts and
    cross-tile motion compensation."""
    w, h = 256, 128
    fmt = VideoFormat(w, h)
    frames = [synth_frame(fmt, t, "blobs") for t in range(5)]
    enc = Av1Encoder(SequenceConfig(width=w, height=h), preset=8,
                     tile_cols_log2=1)
    plans = [plan_key(0)] + plan_minigop(0, 1, 4, future_slot=1)
    _roundtrip_frames(enc, frames, plans, 120, tmp_path, "t2p")


def test_tiles_match_single_tile_quality(tmp_path):
    """Tiles change bit partitioning, not correctness: PSNR stays close
    to the single-tile encode on the same content."""
    from svt_av1_psyex_tpu.conformance.dav1d import psnr

    w, h = 256, 128
    fmt = VideoFormat(w, h)
    f = synth_frame(fmt, 0, "blobs")
    r = {}
    for log2 in (0, 1):
        enc = Av1Encoder(SequenceConfig(width=w, height=h), preset=8,
                         tile_cols_log2=log2)
        enc.encode_frame([p.copy() for p in f], 120)
        r[log2] = psnr(enc.last_recon[0][:h, :w], f[0], 8)
    assert abs(r[0] - r[1]) < 1.0, r
