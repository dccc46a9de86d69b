"""API lifecycle tests — SvtAv1EncApiTest / SvtAv1EncParamsTest pattern:
misuse must fail cleanly, every parameter must round-trip via the string
API, valid lifecycle must produce a decodable stream."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.api import (
    EncoderConfig,
    SvtAv1Encoder,
    svt_av1_enc_init_handle,
    svt_av1_get_version,
)
from svt_av1_psyex_tpu.api.encoder import SvtAv1Error
from svt_av1_psyex_tpu.api.params import PARAM_MAP, parse_parameter


def test_version():
    assert "tpu" in svt_av1_get_version()


def test_lifecycle_misuse():
    h = SvtAv1Encoder()
    with pytest.raises(SvtAv1Error):
        h.send_picture([np.zeros((64, 64), np.uint8)])  # before init
    with pytest.raises(SvtAv1Error):
        h.init()  # invalid default dims (0x0)


def test_param_validation():
    h, cfg = svt_av1_enc_init_handle()
    cfg.source_width = 63  # below minimum
    cfg.source_height = 64
    with pytest.raises(SvtAv1Error):
        h.set_parameter(cfg)
    cfg.source_width = 64
    cfg.enc_mode = 99
    with pytest.raises(SvtAv1Error):
        h.set_parameter(cfg)
    cfg.enc_mode = 8
    h.set_parameter(cfg)


def test_all_params_parse():
    cfg = EncoderConfig()
    samples = {int: "1", float: "0.5", str: "x"}
    for name, (attr, parser) in PARAM_MAP.items():
        if parser is None:  # int-list params ([a,b,c] syntax)
            val = "[1,2]"
        else:
            val = ("1" if parser.__name__ == "_to_bool"
                   else samples.get(parser, "1"))
        parse_parameter(cfg, name, val)
        assert getattr(cfg, attr) is not None
    with pytest.raises(KeyError):
        parse_parameter(cfg, "no-such-param", "1")


def test_encode_lifecycle():
    h, cfg = svt_av1_enc_init_handle()
    cfg.source_width = 64
    cfg.source_height = 64
    cfg.crf = 35
    cfg.recon_enabled = True
    h.set_parameter(cfg)
    h.init()
    hdr = h.stream_header()
    assert hdr[0] >> 3 & 0xF == 1  # sequence header obu type
    rng = np.random.RandomState(0)
    planes = [rng.randint(0, 255, (64, 64)).astype(np.uint8),
              rng.randint(0, 255, (32, 32)).astype(np.uint8),
              rng.randint(0, 255, (32, 32)).astype(np.uint8)]
    h.send_picture(planes, 0)
    h.send_picture(None)  # EOS
    pkts = []
    while (p := h.get_packet()) is not None:
        pkts.append(p)
    assert len(pkts) == 2 and pkts[-1].is_eos
    assert len(pkts[0].data) > 10
    rec = h.get_recon()
    assert rec.planes[0].shape == (64, 64)
    h.deinit()
    h.deinit_handle()


def test_hdr_metadata_obus(tmp_path):
    """HDR10 MDCV + CLL metadata OBUs ride keyframe TUs; dav1d decodes
    the stream unchanged (metadata_handle.c string formats)."""
    import sys as _sys
    from pathlib import Path as _P

    _sys.path.insert(0, str(_P(__file__).resolve().parent.parent / "tools"))
    import numpy as np
    from mkclip import synth_frame

    from svt_av1_psyex_tpu.api.encoder import SvtAv1Encoder
    from svt_av1_psyex_tpu.bitstream.obu import parse_mastering_display
    from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
    from svt_av1_psyex_tpu.utils.ivf import IvfWriter
    from svt_av1_psyex_tpu.utils.y4m import VideoFormat

    prim, wp, lmax, lmin = parse_mastering_display(
        "G(0.265,0.690)B(0.150,0.060)R(0.680,0.320)"
        "WP(0.3127,0.3290)L(1000.0,0.0001)")
    assert prim[0] == (0.265, 0.690) and lmax == 1000.0

    fmt = VideoFormat(96, 64)
    frames = [synth_frame(fmt, t, "blobs") for t in range(3)]
    h = SvtAv1Encoder()
    h.config.source_width = 96
    h.config.source_height = 64
    h.config.enc_mode = 10
    h.config.crf = 30
    h.config.recon_enabled = True
    h.config.mastering_display = ("G(0.265,0.690)B(0.150,0.060)"
                                  "R(0.680,0.320)WP(0.3127,0.3290)"
                                  "L(1000.0,0.0001)")
    h.config.content_light_level = "1000,400"
    h.init()
    path = tmp_path / "meta.ivf"
    recons = {}
    kf_data = None
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 96, 64)
        n = 0
        for t, f in enumerate(frames):
            h.send_picture(f, t)
        h.send_picture(None)
        while (pk := h.get_packet()) is not None:
            if not pk.is_eos:
                if pk.frame_type == 0:
                    kf_data = pk.data
                wr.write_frame(pk.data, n)
                n += 1
        while (rc := h.get_recon()) is not None:
            recons[rc.pts] = rc.planes
        wr.close()
    # metadata OBU type (5) present right after the temporal delimiter
    assert kf_data is not None and (kf_data[2] >> 3) & 0xF == 5
    dec = decode_ivf(path)
    assert len(dec) == 3
    for t in range(3):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw])
