"""Monochrome (4:0:0) pipeline conformance."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.codec.gop import plan_key, plan_minigop  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402


def _frames(w, h, n):
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:h, 0:w]
    return [[np.clip(110 + 70 * np.sin((xx + 4 * t) / 9.0) * np.cos(yy / 7.0)
                     + rng.integers(-5, 6, (h, w)), 0, 255).astype(np.uint8)]
            for t in range(n)]


def test_mono_gop_bitexact_all_presets(tmp_path):
    """Luma-only streams (mono CDEF header gating, single-plane filters,
    DLF/LR/MD without chroma) at host and device presets."""
    w, h = 128, 96
    frames = _frames(w, h, 5)
    for preset in (8, 6, 10):
        seq = SequenceConfig(width=w, height=h, mono_chrome=True)
        enc = Av1Encoder(seq, preset=preset)
        plans = [plan_key(0)] + plan_minigop(0, 1, 4, future_slot=1)
        path = tmp_path / f"mono{preset}.ivf"
        recons = {}
        with open(path, "wb") as fh:
            wr = IvfWriter(fh, w, h)
            n = 0
            for pl in plans:
                src = frames[pl.disp_idx] \
                    if pl.show_existing_slot is None else None
                tu = enc.encode_frame(src, 120, plan=pl)
                wr.write_frame(tu, n)
                n += 1
                if pl.show_frame or pl.show_existing_slot is not None:
                    recons[pl.disp_idx] = [q.copy() for q in enc.last_recon]
            wr.close()
        dec = decode_ivf(path)
        assert len(dec) == 5, preset
        for t in range(5):
            dh, dw = dec[t][0].shape
            assert np.array_equal(dec[t][0], recons[t][0][:dh, :dw]), \
                (preset, t)
