"""4:4:4 (profile 1) pipeline: MD/CfL/DLF/LR at full chroma resolution."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.codec.gop import plan_key, plan_minigop  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402


def _mk(w, h, t, rng):
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(110 + 70 * np.sin((xx + 4 * t) / 9.0) * np.cos(yy / 7.0)
                + rng.integers(-5, 6, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(100 + 60 * np.cos((xx + 4 * t) / 11.0), 0, 255).astype(np.uint8)
    v = np.clip(150 - 60 * np.sin(yy / 13.0), 0, 255).astype(np.uint8)
    return [y, u, v]


def _roundtrip(preset, tmp_path, name, n_frames=5):
    w, h = 128, 96
    rng = np.random.default_rng(2)
    frames = [_mk(w, h, t, rng) for t in range(n_frames)]
    seq = SequenceConfig(width=w, height=h, profile=1,
                         subsampling_x=0, subsampling_y=0)
    enc = Av1Encoder(seq, preset=preset)
    plans = [plan_key(0)]
    if n_frames > 1:
        plans += plan_minigop(0, 1, 4, future_slot=1)
    path = tmp_path / f"{name}.ivf"
    recons = {}
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        n = 0
        for pl in plans:
            src = frames[pl.disp_idx] if pl.show_existing_slot is None else None
            tu = enc.encode_frame(src, 120, plan=pl)
            wr.write_frame(tu, n)
            n += 1
            if pl.show_frame or pl.show_existing_slot is not None:
                recons[pl.disp_idx] = [q.copy() for q in enc.last_recon]
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == n_frames
    for t in range(n_frames):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert dec[t][i].shape == dec[t][0].shape  # full-res chroma
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)


def test_444_device_path_gop(tmp_path):
    _roundtrip(10, tmp_path, "i444p10")


def test_444_full_toolset(tmp_path):
    """Preset 6: CfL at 4:4:4, filter intra, restoration, TX select."""
    _roundtrip(6, tmp_path, "i444p6")
