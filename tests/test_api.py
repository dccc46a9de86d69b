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
        val = "1" if parser.__name__ == "_to_bool" else samples.get(parser, "1")
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
