"""Super-resolution e2e: encode at a downscaled width, dav1d decodes and
normatively upscales — its output must be bit-exact with our upscaled
recon (which validates the spec-7.16 upscaler in ops/resize.py).

Reference behavior: Source/Lib/Codec/super_res.c (fixed mode),
svt_av1_upscale_normative_rows.  v1 scope: all-intra streams.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from mkclip import synth_frame

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf, psnr
from svt_av1_psyex_tpu.utils.ivf import IvfWriter
from svt_av1_psyex_tpu.utils.y4m import VideoFormat


def _roundtrip(tmp_path, w, h, denom, qindex=60, bit_depth=8, n=2,
               kind="blobs"):
    fmt = VideoFormat(w, h, bit_depth=bit_depth)
    seq = SequenceConfig(width=w, height=h, bit_depth=bit_depth)
    enc = Av1Encoder(seq, superres_denom=denom)
    assert seq.enable_superres and seq.disp_width == w
    assert seq.width < w
    path = tmp_path / f"sr{denom}.ivf"
    srcs = [synth_frame(fmt, t, kind) for t in range(n)]
    recons = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        for t, fs in enumerate(srcs):
            wr.write_frame(enc.encode_keyframe(fs, qindex), t)
            recons.append(enc.last_recon)
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == n
    for t in range(n):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert dw == (w + (i > 0)) >> (1 if i else 0), (t, i, dw)
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
    return dec, srcs


@pytest.mark.parametrize("denom", [9, 12, 16])
def test_superres_denoms_bitexact(tmp_path, denom):
    dec, srcs = _roundtrip(tmp_path, 128, 96, denom)
    y_psnr = psnr(dec[0][0], srcs[0][0])
    assert y_psnr > 28, y_psnr


def test_superres_odd_width_10bit(tmp_path):
    _roundtrip(tmp_path, 131, 65, 13, bit_depth=10, n=1)


def test_superres_min_denom_texture(tmp_path):
    dec, srcs = _roundtrip(tmp_path, 160, 64, 10, qindex=40,
                           kind="texture")
    assert psnr(dec[0][0], srcs[0][0]) > 27


def test_superres_rejects_inter(tmp_path):
    seq = SequenceConfig(width=128, height=64)
    enc = Av1Encoder(seq, superres_denom=16)
    fmt = VideoFormat(128, 64)
    enc.encode_keyframe(synth_frame(fmt, 0, "blobs"), 60)
    with pytest.raises(AssertionError, match="all-intra"):
        enc.encode_frame(synth_frame(fmt, 1, "blobs"), 60)


def test_superres_api_all_intra(tmp_path):
    """--superres-mode 1 through the public handle: all-intra stream,
    display-size recon, dav1d-exact round trip."""
    from svt_av1_psyex_tpu.api.encoder import svt_av1_enc_init_handle

    h, cfg = svt_av1_enc_init_handle()
    cfg.source_width = 128
    cfg.source_height = 64
    cfg.crf = 35
    cfg.intra_period_length = 0  # all-intra
    cfg.superres_mode = 1
    cfg.superres_denom = 12
    cfg.recon_enabled = True
    h.set_parameter(cfg)
    h.init()
    fmt = VideoFormat(128, 64)
    srcs = [synth_frame(fmt, t, "blobs") for t in range(3)]
    for t, f in enumerate(srcs):
        h.send_picture(f, t)
    h.send_picture(None)
    path = tmp_path / "api_sr.ivf"
    recons = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 128, 64)
        n = 0
        while (p := h.get_packet()) is not None:
            if p.is_eos:
                break
            wr.write_frame(p.data, n)
            n += 1
        while (rc := h.get_recon()) is not None:
            recons.append(rc.planes)
        wr.close()
    h.deinit()
    dec = decode_ivf(path)
    assert len(dec) == 3 and len(recons) == 3
    for t in range(3):
        assert recons[t][0].shape[1] >= 128  # display width recon
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)


def test_superres_mode_validation():
    from svt_av1_psyex_tpu.api.encoder import svt_av1_enc_init_handle

    h, cfg = svt_av1_enc_init_handle()
    cfg.source_width = 128
    cfg.source_height = 64
    cfg.superres_mode = 1
    cfg.superres_denom = 12
    cfg.intra_period_length = 60  # not all-intra -> rejected
    errs = cfg.validate()
    assert any("all-intra" in e for e in errs)
    cfg.intra_period_length = 0
    assert not cfg.validate()
    cfg.superres_mode = 3
    assert any("superres_mode" in e for e in cfg.validate())


def test_scaled_size_spec_clamps():
    from svt_av1_psyex_tpu.ops.resize import scaled_size

    assert scaled_size(1920, 8) == 1920
    assert scaled_size(1920, 16) == 960
    assert scaled_size(1920, 9) == (1920 * 8 + 4) // 9
    assert scaled_size(20, 16) == 16   # >=16 clamp
    assert scaled_size(12, 16) == 12   # tiny frames keep their size
