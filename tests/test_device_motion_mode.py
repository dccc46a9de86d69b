"""Device-path motion modes: base-layer OBMC/WARPED_CAUSAL commit trial.

The reference keeps OBMC (obmc_level=4) and local warp (wm_level=3/4) on
base-layer frames up to M9 (enc_mode_config.c:8065-8075, 8237-8243); the
device lattice ranks candidates with SIMPLE translation and the commit
runs a per-winner motion-mode trial (md_device._commit_inter_leaf).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.codec.gop import plan_key, plan_minigop  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402


def _mm_counts(enc):
    counts = [0, 0, 0]

    def walk(nd):
        if nd.leaf is not None and nd.leaf.is_inter:
            counts[nd.leaf.motion_mode] += 1
        for ch in nd.children or []:
            walk(ch)

    for node in getattr(enc, "_last_sb_plans", []):
        walk(node)
    return counts


def test_device_p8_motion_mode_trial(tmp_path):
    w, h = 192, 128
    fmt = VideoFormat(w, h)
    frames = [synth_frame(fmt, t, "blobs") for t in range(5)]
    enc = Av1Encoder(SequenceConfig(width=w, height=h), preset=8)
    assert enc.seq.enable_warped_motion  # wm_level reaches M9
    plans = [plan_key(0)] + plan_minigop(0, 1, 4, future_slot=1)
    recons = {}
    totals = [0, 0, 0]
    path = tmp_path / "mm.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        n = 0
        for pl in plans:
            src = (frames[pl.disp_idx]
                   if pl.show_existing_slot is None else None)
            tu = enc.encode_frame(src, 120, plan=pl)
            for i, v in enumerate(_mm_counts(enc)):
                totals[i] += v
            wr.write_frame(tu, n)
            n += 1
            if pl.show_frame or pl.show_existing_slot is not None:
                recons[pl.disp_idx] = [q.copy() for q in enc.last_recon]
        wr.close()
    # the trial must engage and pick at least one non-SIMPLE block
    assert totals[1] + totals[2] >= 1, totals
    dec = decode_ivf(path)
    assert len(dec) == 5
    for t in range(5):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
