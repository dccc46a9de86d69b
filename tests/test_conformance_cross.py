"""Cross-decoder conformance: dav1d (recon oracle) + libaom (strict
second opinion) on the round-5 regression configs.

Round-5 findings these tests pin down:
  * the entropy termination must be od_ec-shaped (bitstream/ec.py
    done()) — dav1d tolerated the old minimal form, libaom did not,
    and at rare byte states dav1d failed too;
  * temporal MV projection clamps at +-(1<<14)-1 (MV_UPP-1), not int16;
  * frames whose projection sources carry extreme MVs code
    use_ref_frame_mvs=0 (mfmv.projection_safe) until the residual
    near-clamp divergence vs dav1d is root-caused.
"""

import sys
from fractions import Fraction
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.api import EncoderConfig, SvtAv1Encoder  # noqa: E402
from svt_av1_psyex_tpu.conformance import libaom  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402


def _encode(w, h, n, kind="blobs", **cfg_kw):
    fmt = VideoFormat(w, h, fps=Fraction(30, 1))
    frames = [synth_frame(fmt, t, kind) for t in range(n)]
    cfg = EncoderConfig(source_width=w, source_height=h,
                        frame_rate_numerator=30, frame_rate_denominator=1,
                        **cfg_kw)
    hd = SvtAv1Encoder()
    hd.set_parameter(cfg)
    hd.init()
    pkts = []
    for t, f in enumerate(frames):
        hd.send_picture(f, t)
    hd.send_picture(None)
    while (pk := hd.get_packet()) is not None:
        if not pk.is_eos:
            pkts.append(pk.data)
    return pkts


def _write_ivf(pkts, w, h, path):
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        for i, d in enumerate(pkts):
            wr.write_frame(d, i)
        wr.close()


def test_crf46_448x256_regression(tmp_path):
    """The round-4 latent conformance failure: 448x256 p6 crf46 blobs
    with the CLI operating point (tune 1, octile 6) — dav1d send_data
    -22 before the round-5 fixes."""
    pkts = _encode(448, 256, 33, enc_mode=6, crf=46, tune=1,
                   variance_octile=6)
    p = tmp_path / "r.ivf"
    _write_ivf(pkts, 448, 256, p)
    assert len(decode_ivf(p)) == 33
    if libaom.available():
        libaom.validate_ivf(p)


def test_libaom_accepts_intra_stream(tmp_path):
    """The strict decoder accepts our keyframe tiles (od_ec-shaped
    entropy termination)."""
    if not libaom.available():
        pytest.skip("libaom unavailable")
    pkts = _encode(192, 128, 2, enc_mode=8, crf=32)
    p = tmp_path / "i.ivf"
    _write_ivf(pkts, 192, 128, p)
    libaom.validate_ivf(p)
    assert len(decode_ivf(p)) == 2
