"""E2E: real-coefficient intra encode, dav1d decode, bit-exact recon match.

The reference's e2e pattern (SvtAv1E2EFramework): decode our stream with an
independent decoder and require bit-exact equality with the encoder's own
reconstruction, plus PSNR sanity vs the source.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from mkclip import synth_frame

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf, psnr
from svt_av1_psyex_tpu.utils.ivf import IvfWriter
from svt_av1_psyex_tpu.utils.y4m import VideoFormat


@pytest.mark.parametrize("size,qindex", [((64, 64), 60), ((65, 49), 100), ((128, 96), 30)])
def test_intra_encode_bitexact(tmp_path, size, qindex):
    w, h = size
    fmt = VideoFormat(w, h)
    seq = SequenceConfig(width=w, height=h)
    enc = Av1Encoder(seq)
    path = tmp_path / "out.ivf"
    frames_src = [synth_frame(fmt, t, "blobs") for t in range(2)]
    recons = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        for t, fs in enumerate(frames_src):
            wr.write_frame(enc.encode_keyframe(fs, qindex), t)
            recons.append(enc.last_recon)
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == 2
    for t in range(2):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
    y_psnr = psnr(dec[0][0], frames_src[0][0])
    assert y_psnr > 35, y_psnr
