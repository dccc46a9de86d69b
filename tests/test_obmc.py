"""OBMC (OBMC_CAUSAL): motion-mode syntax + neighbor blending,
dav1d bit-exact (forced-choice + natural selection)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from test_gm_e2e import W, H, _zoom_frames  # noqa: E402

import svt_av1_psyex_tpu.codec.md as mdmod  # noqa: E402
from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402


def _encode_zoom(tmp_path, force_obmc: bool):
    frames = _zoom_frames(4, scale_per_frame=1.04)
    seq = SequenceConfig(width=W, height=H)
    enc = Av1Encoder(seq, preset=10, enable_global_motion=False)
    seq.enable_warped_motion = True
    if force_obmc:
        orig = mdmod.ModeDecision._try_inter

        def patched(self, *a, **k):
            j, leaf, arts = orig(self, *a, **k)
            if k.get("obmc"):
                j = j / 1000.0  # forced-choice: OBMC wins where legal
            return j, leaf, arts

        mdmod.ModeDecision._try_inter = patched
    try:
        path = tmp_path / ("ob_f.ivf" if force_obmc else "ob.ivf")
        recons = []
        n_obmc = 0
        with open(path, "wb") as fh:
            wr = IvfWriter(fh, W, H)
            for t, fs in enumerate(frames):
                tu = enc.encode_frame(fs, 120, force_key=(t == 0))
                wr.write_frame(tu, t)
                recons.append([p.copy() for p in enc.last_recon])

                def walk(node):
                    nonlocal n_obmc
                    if node.leaf is not None and node.leaf.is_inter \
                            and node.leaf.motion_mode == 1:
                        n_obmc += 1
                    for ch in node.children:
                        walk(ch)

                for sb in enc._last_sb_plans:
                    walk(sb)
            wr.close()
    finally:
        if force_obmc:
            mdmod.ModeDecision._try_inter = orig
    return path, recons, n_obmc, len(frames)


def test_obmc_forced_dav1d_exact(tmp_path, monkeypatch):
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    path, recons, n_obmc, n = _encode_zoom(tmp_path, force_obmc=True)
    assert n_obmc > 0, "forced-choice produced no OBMC blocks"
    dec = decode_ivf(path)
    for t in range(n):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)


def test_obmc_natural_dav1d_exact(tmp_path, monkeypatch):
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    path, recons, n_obmc, n = _encode_zoom(tmp_path, force_obmc=False)
    dec = decode_ivf(path)
    for t in range(n):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
