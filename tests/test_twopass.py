"""Two-pass: first-pass stats out, stats-driven allocation in pass 2."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.api.encoder import SvtAv1Encoder  # noqa: E402
from svt_av1_psyex_tpu.codec.firstpass import (  # noqa: E402
    complexity_weights,
    parse,
    serialize,
)
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402


def _frames(n=8, w=96, h=64):
    fmt = VideoFormat(w, h)
    return [synth_frame(fmt, t, "blobs") for t in range(n)]


def test_pass1_stats_roundtrip():
    frames = _frames()
    h = SvtAv1Encoder()
    h.config.source_width = 96
    h.config.source_height = 64
    h.config.pass_ = 1
    h.init()
    for t, f in enumerate(frames):
        h.send_picture(f, t)
    h.send_picture(None)
    buf = h.get_stream_info(0)
    stats = parse(buf)
    assert len(stats) == len(frames)
    assert stats[0].is_cut  # first frame is always a "cut"
    assert all(s.intra_err > 0 for s in stats)
    assert serialize(stats) == buf
    w = complexity_weights(stats)
    assert abs(w.mean() - 1.0) < 1e-9
    # pass 1 emits no coded packets (EOS only)
    pkts = []
    while (pk := h.get_packet()) is not None:
        pkts.append(pk)
    assert all(p.is_eos for p in pkts)


def test_pass2_consumes_stats_and_encodes(tmp_path):
    frames = _frames(8)
    # pass 1
    h1 = SvtAv1Encoder()
    h1.config.source_width = 96
    h1.config.source_height = 64
    h1.config.pass_ = 1
    h1.init()
    for t, f in enumerate(frames):
        h1.send_picture([p.copy() for p in f], t)
    h1.send_picture(None)
    buf = h1.get_stream_info(0)

    # pass 2: VBR with stats
    h2 = SvtAv1Encoder()
    h2.config.source_width = 96
    h2.config.source_height = 64
    h2.config.enc_mode = 10
    h2.config.rate_control_mode = 1
    h2.config.target_bit_rate = 150_000
    h2.config.pass_ = 2
    h2.config.rc_stats_buffer = buf
    h2.config.recon_enabled = True
    h2.init()
    assert h2._fp_weights is not None and len(h2._fp_weights) == 8
    path = tmp_path / "p2.ivf"
    recons = {}
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 96, 64)
        n = 0
        for t, f in enumerate(frames):
            h2.send_picture([p.copy() for p in f], t)
        h2.send_picture(None)
        while (pk := h2.get_packet()) is not None:
            if not pk.is_eos:
                wr.write_frame(pk.data, n)
                n += 1
        while (rc := h2.get_recon()) is not None:
            recons[rc.pts] = rc.planes
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == 8
    for t in range(8):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
