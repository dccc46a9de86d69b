"""Rate control: VBR/CBR hit their bitrate targets and stay conformant."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.api.encoder import SvtAv1Encoder  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402


@pytest.mark.parametrize("mode,tbr", [(1, 150_000), (2, 80_000)])
def test_bitrate_target(tmp_path, mode, tbr):
    fmt = VideoFormat(176, 144)
    frames = [synth_frame(fmt, t, "blobs") for t in range(20)]
    h = SvtAv1Encoder()
    h.config.source_width = 176
    h.config.source_height = 144
    h.config.enc_mode = 10
    h.config.rate_control_mode = mode
    h.config.target_bit_rate = tbr
    h.config.frame_rate_numerator = 30
    h.config.frame_rate_denominator = 1
    h.init()
    path = tmp_path / "rc.ivf"
    tot = 0
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 176, 144)
        n = 0
        for t in range(20):
            h.send_picture(frames[t])
        h.send_picture(None)
        while (pk := h.get_packet()) is not None:
            if not pk.is_eos:
                wr.write_frame(pk.data, n)
                n += 1
                tot += len(pk.data)
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == 20
    achieved = tot * 8 / (20 / 30)
    assert 0.7 * tbr < achieved < 1.35 * tbr, achieved
