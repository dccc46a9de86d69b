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


def _run_vbr(frames, w, h, tbr, stats_in=None, pass_=0, keyint=31):
    enc = SvtAv1Encoder()
    enc.config.source_width = w
    enc.config.source_height = h
    enc.config.enc_mode = 10
    enc.config.rate_control_mode = 0 if pass_ == 1 else 1
    enc.config.target_bit_rate = tbr
    enc.config.intra_period_length = keyint
    enc.config.frame_rate_numerator = 30
    enc.config.frame_rate_denominator = 1
    if pass_:
        enc.config.pass_ = pass_
    if stats_in is not None:
        enc.config.rc_stats_buffer = stats_in
    enc.init()
    for t, f in enumerate(frames):
        enc.send_picture([p.copy() for p in f], t)
    enc.send_picture(None)
    tot = 0
    n = 0
    while (pk := enc.get_packet()) is not None:
        if not pk.is_eos:
            tot += len(pk.data)
            n += 1
    return enc, tot, n


def test_two_pass_vbr_hits_target_5pct():
    """pass2_strategy + recode loop: 120-frame two-pass VBR lands within
    +-5% of the target (VERDICT r2 #8 'done' bar)."""
    fmt = VideoFormat(160, 96)
    frames = [synth_frame(fmt, t, "blobs") for t in range(120)]
    tbr = 120_000
    enc1, _, _ = _run_vbr(frames, 160, 96, tbr, pass_=1)
    stats = enc1.get_stream_info(0)
    _, tot, n = _run_vbr(frames, 160, 96, tbr, stats_in=stats)
    assert n >= 120  # packets include show-existing TUs
    achieved = tot * 8 / (120 / 30)
    assert 0.95 * tbr < achieved < 1.05 * tbr, achieved


def test_recode_loop_engages_on_overshoot(monkeypatch):
    """A hard per-frame cap (--mbr) must trigger the overshoot recode
    (state rollback + higher q), and the capped stream obeys the cap."""
    from svt_av1_psyex_tpu.codec.encoder import Av1Encoder

    restores = [0]
    orig = Av1Encoder.state_restore

    def spy(self, snap):
        restores[0] += 1
        return orig(self, snap)

    monkeypatch.setattr(Av1Encoder, "state_restore", spy)
    fmt = VideoFormat(160, 96)
    rng = np.random.default_rng(3)
    frames = []
    for t in range(10):
        f = synth_frame(fmt, t, "blobs")
        f[0][:] = np.clip(f[0].astype(np.int32)
                          + rng.integers(-40, 41, f[0].shape),
                          0, 255).astype(np.uint8)
        frames.append(f)
    enc = SvtAv1Encoder()
    enc.config.source_width = 160
    enc.config.source_height = 96
    enc.config.enc_mode = 10
    enc.config.rate_control_mode = 1
    enc.config.target_bit_rate = 100_000
    enc.config.max_bit_rate = 120_000
    enc.config.frame_rate_numerator = 30
    enc.config.frame_rate_denominator = 1
    enc.init()
    for t, f in enumerate(frames):
        enc.send_picture(f, t)
    enc.send_picture(None)
    while (pk := enc.get_packet()) is not None:
        pass
    assert restores[0] > 0, "recode never engaged"


def test_capped_crf_holds_ceiling(tmp_path):
    """Capped CRF (max_bit_rate in CRF mode): the coded stream stays
    within the cap + the virtual-buffer tolerance, while plain CRF on
    the same content spends well past it."""
    fmt = VideoFormat(176, 144)
    frames = [synth_frame(fmt, t, "noise") for t in range(20)]

    def run(mbr):
        h = SvtAv1Encoder()
        h.config.source_width = 176
        h.config.source_height = 144
        h.config.enc_mode = 10
        h.config.crf = 20  # low CRF: plain CRF spends heavily on noise
        h.config.max_bit_rate = mbr
        h.config.frame_rate_numerator = 30
        h.config.frame_rate_denominator = 1
        h.init()
        for t in range(20):
            h.send_picture(frames[t])
        h.send_picture(None)
        tot = 0
        pkts = []
        while (pk := h.get_packet()) is not None:
            if not pk.is_eos:
                tot += len(pk.data) * 8
                pkts.append(pk.data)
        return tot, pkts

    uncapped, _ = run(0)
    cap = 200_000  # bits/s; 20 frames at 30fps = 2/3 s of video
    capped, pkts = run(cap)
    assert uncapped > capped, (uncapped, capped)
    # budget: duration * cap + the virtual buffer the stream may drain
    duration = 20 / 30.0
    assert capped <= duration * cap + 2 * cap, (capped, uncapped)
    # conformance: the capped stream still decodes
    path = tmp_path / "capped.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 176, 144)
        for n, d in enumerate(pkts):
            wr.write_frame(d, n)
        wr.close()
    assert len(decode_ivf(path)) == 20
