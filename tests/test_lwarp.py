"""Local warped motion (WARPED_CAUSAL): motion_mode syntax + decoder-
re-derivable warp params, dav1d bit-exact."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from test_gm_e2e import _zoom_frames, W, H  # noqa: E402

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402


def _collect_motion_modes(enc):
    """Walk the last frame's partition trees for coded motion modes."""
    mms = []

    def walk(node):
        if node.leaf is not None and node.leaf.is_inter:
            mms.append(node.leaf.motion_mode)
        for ch in node.children:
            walk(ch)

    for sb in getattr(enc, "_last_sb_plans", []) or []:
        walk(sb)
    return mms


def test_lwarp_dav1d_exact(tmp_path, monkeypatch):
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    frames = _zoom_frames(4, scale_per_frame=1.04)
    seq = SequenceConfig(width=W, height=H)
    enc = Av1Encoder(seq, preset=10, enable_global_motion=False)
    seq.enable_warped_motion = True  # host fast preset for test speed
    path = tmp_path / "lw.ivf"
    recons = []
    warped_seen = 0
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, W, H)
        for t, fs in enumerate(frames):
            tu = enc.encode_frame(fs, 120, force_key=(t == 0))
            wr.write_frame(tu, t)
            recons.append([p.copy() for p in enc.last_recon])
            warped_seen += sum(1 for m in _collect_motion_modes(enc) if m == 2)
        wr.close()
    assert warped_seen > 0, "no block chose WARPED_CAUSAL on zooming content"
    dec = decode_ivf(path)
    assert len(dec) == len(frames)
    for t in range(len(frames)):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)


def test_motion_mode_syntax_without_warp_choice(tmp_path, monkeypatch):
    """Pan content with lwarp enabled: even when SIMPLE wins everywhere
    the motion_mode/obmc symbols are coded — dav1d must still agree."""
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    from test_gm_e2e import _pan_frames

    frames = _pan_frames(3, 1, -2)
    seq = SequenceConfig(width=W, height=H)
    enc = Av1Encoder(seq, preset=10)
    seq.enable_warped_motion = True
    path = tmp_path / "mm.ivf"
    recons = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, W, H)
        for t, fs in enumerate(frames):
            tu = enc.encode_frame(fs, 120, force_key=(t == 0))
            wr.write_frame(tu, t)
            recons.append([p.copy() for p in enc.last_recon])
        wr.close()
    dec = decode_ivf(path)
    for t in range(len(frames)):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
