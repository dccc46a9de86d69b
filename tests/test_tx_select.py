"""TX_MODE_SELECT: intra tx-depth signaling + inter vartx no-split flags.

Reference counterpart: av1_code_tx_size / write_selected_tx_size /
write_tx_size_vartx (entropy_coding.c:4381-4536). Conformance is checked
end-to-end against dav1d; the tests also assert the feature is actually
exercised (some blocks choose depth 1) so the syntax path can't silently
rot into depth-0-only.
"""

import numpy as np
import pytest


def _encode_decode(seq_kwargs, frames, preset=6, q=70, tmp_path=None,
                   plan_fn=None):
    from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
    from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
    from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
    from svt_av1_psyex_tpu.utils.ivf import IvfWriter

    seq = SequenceConfig(**seq_kwargs)
    enc = Av1Encoder(seq, preset=preset)
    path = tmp_path / "tx.ivf"
    recs = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, seq.width, seq.height)
        for t, planes in enumerate(frames):
            wr.write_frame(enc.encode_frame(planes, q, force_key=(t == 0)), t)
            recs.append([p.copy() for p in enc.last_recon])
        wr.close()
    dec = decode_ivf(path)
    return dec, recs


def _sharp_frames(w, h, n, bd=8, seed=7):
    rng = np.random.RandomState(seed)
    mx = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        base = ((yy + xx + 2 * t) % 32) * (mx // 50) + rng.randint(
            0, mx // 16, (h, w))
        out.append([np.clip(base, 0, mx).astype(dt),
                    rng.randint(mx // 3, mx // 2, (h // 2, w // 2)).astype(dt),
                    rng.randint(mx // 3, mx // 2, (h // 2, w // 2)).astype(dt)])
    return out


def test_tx_select_intra_inter_conformance(tmp_path, monkeypatch):
    """Key + inter frames at a TX-select preset decode bit-exact, and at
    least one block signals tx depth 1 (host MD path — the device
    lattice at preset 6 commits max-rect only)."""
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    import svt_av1_psyex_tpu.bitstream.tile_writer as twmod

    hist = {}
    orig = twmod.TileWriter._write_block

    def spy(self, leaf, r, c, bsize):
        hist[leaf.tx_depth] = hist.get(leaf.tx_depth, 0) + 1
        return orig(self, leaf, r, c, bsize)

    twmod.TileWriter._write_block = spy
    try:
        dec, recs = _encode_decode(dict(width=160, height=96), tmp_path=tmp_path,
                                   frames=_sharp_frames(160, 96, 4), preset=6)
    finally:
        twmod.TileWriter._write_block = orig
    for t in range(4):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recs[t][i][:dh, :dw]), (t, i)
    assert hist.get(1, 0) > 0, f"tx depth 1 never chosen: {hist}"


def test_tx_select_10bit(tmp_path):
    dec, recs = _encode_decode(dict(width=96, height=80, bit_depth=10),
                               tmp_path=tmp_path,
                               frames=_sharp_frames(96, 80, 3, bd=10), preset=6)
    for t in range(3):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recs[t][i][:dh, :dw]), (t, i)


def test_tx_select_partial_sb_edges(tmp_path):
    """Frame dims forcing partial superblocks (the per-TU availability and
    DLF tx-grid edge cases)."""
    dec, recs = _encode_decode(dict(width=176, height=144), tmp_path=tmp_path,
                               frames=_sharp_frames(176, 144, 2, seed=3),
                               preset=8)
    for t in range(2):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recs[t][i][:dh, :dw]), (t, i)


def test_tx_select_gop_compound(tmp_path):
    """Hierarchical GOP (show_existing + compound) through the API with
    TX select enabled."""
    from svt_av1_psyex_tpu.api.config import EncoderConfig
    from svt_av1_psyex_tpu.api.encoder import SvtAv1Encoder
    from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
    from svt_av1_psyex_tpu.utils.ivf import IvfWriter

    w, h = 96, 64
    frames = _sharp_frames(w, h, 8, seed=11)
    henc = SvtAv1Encoder()
    cfg = EncoderConfig()
    cfg.source_width = w
    cfg.source_height = h
    cfg.enc_mode = 6
    cfg.qp = 18  # qindex 72
    cfg.pred_structure = 2
    cfg.intra_period_length = -1
    cfg.recon_enabled = True
    henc.set_parameter(cfg)
    henc.init()
    for t, planes in enumerate(frames):
        henc.send_picture(planes, t)
    henc.send_picture(None)
    pkts, recons = [], {}
    while True:
        pkt = henc.get_packet()
        if pkt is None or pkt.is_eos:
            break
        pkts.append(pkt)
    while True:
        rec = henc.get_recon()
        if rec is None:
            break
        recons[rec.pts] = rec.planes
    path = tmp_path / "gop.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        for i, pkt in enumerate(pkts):
            wr.write_frame(pkt.data, i)
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == len(frames)
    for t in range(len(frames)):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
