"""CDF forwarding (primary_ref_frame): conformance incl. counter reset.

The frame-context save resets per-CDF visit counters; keeping them was a
subtle bug only visible once a key frame adapted a row >15 times (the
adaptation rate term cnt>15 then diverged on the next frame). The content
here is rich enough to cross that threshold.
"""

import numpy as np
import pytest

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
from svt_av1_psyex_tpu.utils.ivf import IvfWriter

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402


def test_forwarding_bitexact_and_smaller(tmp_path):
    fmt = VideoFormat(96, 64)
    frames = [synth_frame(fmt, t, "blobs") for t in range(4)]
    seq = SequenceConfig(width=96, height=64)
    enc = Av1Encoder(seq, preset=10)
    path = tmp_path / "fwd.ivf"
    recons = []
    sizes = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 96, 64)
        for t, f in enumerate(frames):
            tu = enc.encode_frame(f, 120, force_key=(t == 0))
            sizes.append(len(tu))
            wr.write_frame(tu, t)
            recons.append([p.copy() for p in enc.last_recon])
        wr.close()
    dec = decode_ivf(path)
    for t in range(4):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)

    # forwarding must not be a no-op: re-encode with per-frame reset and
    # compare inter sizes
    enc2 = Av1Encoder(seq, preset=10)
    sizes2 = []
    for t, f in enumerate(frames):
        if getattr(enc2, "slots", None):
            for s in enc2.slots:
                if s is not None:
                    s["cdfs"] = None  # force per-frame context reset
        sizes2.append(len(enc2.encode_frame(f, 120, force_key=(t == 0))))
    assert sum(sizes[1:]) < sum(sizes2[1:])


def test_counter_reset_on_save():
    from svt_av1_psyex_tpu.bitstream.tables import FrameCdfs

    c = FrameCdfs(120)
    c.skip[1][...] = 20
    c.eob_flag[16][1][...] = 33
    c.reset_counters()
    assert int(c.skip[1].max()) == 0
    assert int(c.eob_flag[16][1].max()) == 0
