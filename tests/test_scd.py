"""Scene-change detection: detector behavior + keyframe insertion."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.api.encoder import SvtAv1Encoder  # noqa: E402
from svt_av1_psyex_tpu.codec.scd import (  # noqa: E402
    decimate_luma,
    scene_cut,
)
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402


def _clip_two_scenes(w=352, h=288, n_a=4, n_b=3):
    fmt = VideoFormat(w, h)
    return ([synth_frame(fmt, t, "blobs") for t in range(n_a)]
            + [synth_frame(fmt, t, "gradient") for t in range(n_b)])


def test_detector_fires_only_on_the_cut():
    frames = _clip_two_scenes()
    prev = None
    cuts = []
    for t, f in enumerate(frames):
        d = decimate_luma(f[0])
        if prev is not None and scene_cut(prev, d):
            cuts.append(t)
        prev = d
    assert cuts == [4], cuts


def test_detector_motion_tolerance():
    """Global pan of the same scene is continuity, not a cut."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:240, 0:320]
    base = np.clip(120 + 80 * np.sin(xx / 17.0) * np.cos(yy / 13.0)
                   + rng.normal(0, 4, (240, 320)), 0, 255).astype(np.uint8)
    a = decimate_luma(base[:, :288])
    b = decimate_luma(base[:, 8:296])  # 8px pan
    assert not scene_cut(a, b)


def test_keyframe_inserted_at_cut(tmp_path):
    frames = _clip_two_scenes(w=96, h=64)
    h = SvtAv1Encoder()
    h.config.source_width = 96
    h.config.source_height = 64
    h.config.enc_mode = 10
    h.config.crf = 30
    h.config.recon_enabled = True
    h.init()
    path = tmp_path / "scd.ivf"
    keys = []
    recons = {}
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 96, 64)
        n = 0
        for t, f in enumerate(frames):
            h.send_picture(f, t)
        h.send_picture(None)
        while (pk := h.get_packet()) is not None:
            if not pk.is_eos:
                wr.write_frame(pk.data, n)
                n += 1
                if pk.frame_type == 0:
                    keys.append(pk.pts)
        while (rc := h.get_recon()) is not None:
            recons[rc.pts] = rc.planes
        wr.close()
    assert 4 in keys, keys  # keyframe lands on the cut
    assert keys[0] == 0
    dec = decode_ivf(path)
    assert len(dec) == len(frames)
    for t in range(len(frames)):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
