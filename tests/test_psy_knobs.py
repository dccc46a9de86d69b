"""PSYEX knobs: noise normalization, tf-strength, luminance QP bias."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.api.encoder import SvtAv1Encoder  # noqa: E402
from svt_av1_psyex_tpu.codec.rc import luminance_qp_bias_offset  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.ops.quant import noise_normalize  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402


def _encode(tmp_path, name, cfgmod):
    fmt = VideoFormat(96, 64)
    frames = [synth_frame(fmt, t, "blobs") for t in range(6)]
    h = SvtAv1Encoder()
    h.config.source_width = 96
    h.config.source_height = 64
    h.config.enc_mode = 8
    h.config.crf = 30
    h.config.recon_enabled = True
    cfgmod(h.config)
    h.init()
    path = tmp_path / f"{name}.ivf"
    recons = {}
    tot = 0
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 96, 64)
        n = 0
        for t, f in enumerate(frames):
            h.send_picture([p.copy() for p in f], t)
        h.send_picture(None)
        while (pk := h.get_packet()) is not None:
            if not pk.is_eos:
                wr.write_frame(pk.data, n)
                n += 1
                tot += len(pk.data)
        while (rc := h.get_recon()) is not None:
            recons[rc.pts] = rc.planes
        wr.close()
    dec = decode_ivf(path)
    for t in range(6):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
    return tot


def test_noise_norm_unit_flat_block_revival():
    """Flat block (eob=1): the best zeroed AC coeff near DC is revived."""
    n = 64
    scan = np.arange(n)
    tcoeff = np.zeros(n, np.int64)
    qcoeff = np.zeros(n, np.int32)
    dqcoeff = np.zeros(n, np.int32)
    qcoeff[0] = 3
    dqcoeff[0] = 90
    tcoeff[0] = 95
    tcoeff[2] = 27  # close to one dequant step (dqv=30)
    q, d, eob = noise_normalize(tcoeff, qcoeff, dqcoeff, 1, scan, 30, 0,
                                strength=3, n_coeffs_area=64)
    assert eob == 3 and q[2] == 1 and d[2] == 30
    # strength 0: no-op
    qcoeff2 = np.zeros(n, np.int32)
    dq2 = np.zeros(n, np.int32)
    _, _, e2 = noise_normalize(tcoeff, qcoeff2, dq2, 1, scan, 30, 0,
                               strength=0, n_coeffs_area=64)
    assert e2 == 1


def test_luminance_bias_formula():
    assert luminance_qp_bias_offset(120, 255.0, 2, 50) == 0  # bright: none
    dark = luminance_qp_bias_offset(120, 40.0, 2, 50)
    assert dark < 0  # dark frames get more bits
    assert luminance_qp_bias_offset(120, 40.0, 0, 50) == 0  # layer 0 exempt


def test_knobs_stay_conformant_and_act(tmp_path):
    b0 = _encode(tmp_path, "base", lambda c: None)
    b1 = _encode(tmp_path, "nn",
                 lambda c: setattr(c, "noise_norm_strength", 3))
    _encode(tmp_path, "lum", lambda c: setattr(c, "luminance_qp_bias", 50))
    _encode(tmp_path, "tf", lambda c: setattr(c, "tf_strength", 4))
    assert b1 != b0, "noise normalization had no effect on the stream"


def test_spy_rd_conformant_and_acts(tmp_path, monkeypatch):
    """--spy-rd 1 (alternate psy RD pathways, pic_operators.c:241):
    mode-class distortion biases must change the stream on the host MD
    path and stay dav1d bit-exact."""
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    b0 = _encode(tmp_path, "spy0", lambda c: None)
    b1 = _encode(tmp_path, "spy1", lambda c: setattr(c, "spy_rd", 1))
    assert b1 != b0, "spy-rd had no effect on the stream"


def test_max_32_tx_size(tmp_path):
    """--max-32-tx-size forces tx splits on 64-class blocks (intra,
    TX_MODE_SELECT) and stays conformant."""
    from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
    from svt_av1_psyex_tpu.codec.encoder import Av1Encoder

    fmt = VideoFormat(128, 128)
    f = synth_frame(fmt, 0, "gradient")
    outs = {}
    for flag in (False, True):
        enc = Av1Encoder(SequenceConfig(width=128, height=128), preset=9,
                         max_32_tx_size=flag)
        tu = enc.encode_frame([p.copy() for p in f], 100)
        path = tmp_path / f"m32_{flag}.ivf"
        with open(path, "wb") as fh:
            wr = IvfWriter(fh, 128, 128)
            wr.write_frame(tu, 0)
            wr.close()
        dec = decode_ivf(path)
        for i in range(3):
            dh, dw = dec[0][i].shape
            assert np.array_equal(dec[0][i], enc.last_recon[i][:dh, :dw])
        outs[flag] = tu
    assert outs[True] != outs[False]
