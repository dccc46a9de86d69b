"""Hierarchical GOP: dyadic mini-GOPs, backward refs, show_existing_frame."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.codec.gop import plan_key, plan_minigop  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402


def test_two_minigops_bitexact(tmp_path):
    w, h = 96, 64
    fmt = VideoFormat(w, h)
    frames = [synth_frame(fmt, t, "blobs") for t in range(9)]
    seq = SequenceConfig(width=w, height=h)
    enc = Av1Encoder(seq, preset=10)
    plans = [plan_key(0)]
    plans += plan_minigop(0, 1, 4, future_slot=1, mid_slot=2)
    plans += plan_minigop(1, 5, 4, future_slot=0, mid_slot=2)
    path = tmp_path / "gop.ivf"
    recons = {}
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        n = 0
        for pl in plans:
            src = frames[pl.disp_idx] if pl.show_existing_slot is None else None
            tu = enc.encode_frame(src, 110, plan=pl)
            wr.write_frame(tu, n)
            n += 1
            if pl.show_frame or pl.show_existing_slot is not None:
                recons[pl.disp_idx] = [q.copy() for q in enc.last_recon]
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == 9
    for disp in range(9):
        for i in range(3):
            dh, dw = dec[disp][i].shape
            assert np.array_equal(dec[disp][i], recons[disp][i][:dh, :dw]), disp


def test_api_random_access_bitexact(tmp_path):
    from svt_av1_psyex_tpu.api.encoder import SvtAv1Encoder

    fmt = VideoFormat(96, 64)
    frames = [synth_frame(fmt, t, "blobs") for t in range(11)]
    h = SvtAv1Encoder()
    h.config.source_width = 96
    h.config.source_height = 64
    h.config.enc_mode = 10
    h.config.crf = 28
    h.config.pred_structure = 2
    h.config.recon_enabled = True
    h.init()
    path = tmp_path / "ra.ivf"
    recons = {}
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 96, 64)
        n = 0
        for t in range(11):
            h.send_picture(frames[t])
        h.send_picture(None)
        while (pk := h.get_packet()) is not None:
            if not pk.is_eos:
                wr.write_frame(pk.data, n)
                n += 1
        while (rc := h.get_recon()) is not None:
            recons[rc.pts] = rc.planes
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == 11
    for t in range(11):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), t


def test_compound_prediction_bitexact(tmp_path):
    """B frames choose compound (bidirectional average) blocks; streams
    with comp_mode/comp_ref/compound-mode syntax decode bit-exactly."""
    from svt_av1_psyex_tpu.bitstream.tile_writer import TileWriter

    ncomp = [0]
    orig = TileWriter._write_block

    def spy(self, leaf, r, c, bsize):
        if leaf.is_inter and leaf.ref_frame1 >= 1:
            ncomp[0] += 1
        return orig(self, leaf, r, c, bsize)

    TileWriter._write_block = spy
    try:
        w, h = 96, 64
        fmt = VideoFormat(w, h)
        frames = [synth_frame(fmt, t, "blobs") for t in range(9)]
        seq = SequenceConfig(width=w, height=h)
        enc = Av1Encoder(seq, preset=8)
        plans = [plan_key(0)]
        plans += plan_minigop(0, 1, 4, future_slot=1, mid_slot=2)
        plans += plan_minigop(1, 5, 4, future_slot=0, mid_slot=2)
        path = tmp_path / "comp.ivf"
        recons = {}
        with open(path, "wb") as fh:
            wr = IvfWriter(fh, w, h)
            n = 0
            for pl in plans:
                src = frames[pl.disp_idx] if pl.show_existing_slot is None else None
                tu = enc.encode_frame(src, 120, plan=pl)
                wr.write_frame(tu, n)
                n += 1
                if pl.show_frame or pl.show_existing_slot is not None:
                    recons[pl.disp_idx] = [q.copy() for q in enc.last_recon]
            wr.close()
    finally:
        TileWriter._write_block = orig
    assert ncomp[0] > 0, "no compound blocks selected"
    dec = decode_ivf(path)
    for disp in range(9):
        for i in range(3):
            dh, dw = dec[disp][i].shape
            assert np.array_equal(dec[disp][i], recons[disp][i][:dh, :dw]), disp
