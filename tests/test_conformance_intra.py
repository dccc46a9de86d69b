"""E2E conformance: our bitstreams must decode with the real dav1d.

Mirrors the reference's e2e strategy (decode with an independent decoder,
compare against the encoder's own recon — SvtAv1E2EFramework.cc pattern).
"""

import numpy as np
import pytest

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
from svt_av1_psyex_tpu.utils.ivf import IvfWriter


@pytest.mark.parametrize("size", [(64, 64), (65, 49), (176, 144), (128, 96)])
def test_allskip_keyframe_decodes_gray(tmp_path, size):
    w, h = size
    seq = SequenceConfig(width=w, height=h)
    enc = Av1Encoder(seq)
    path = tmp_path / "out.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        for t in range(2):
            wr.write_frame(enc.encode_keyframe(None, base_q_idx=80), t)
        wr.close()
    frames = decode_ivf(path)
    assert len(frames) == 2
    y = frames[0][0]
    assert y.shape == (h, w)
    for fr in frames:
        for plane in fr:
            assert np.all(plane == 128)
