"""E2E inter path: IPPP encode, dav1d decode, bit-exact recon match."""

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


@pytest.mark.parametrize("size,preset", [((128, 96), 12), ((65, 49), 10)])
def test_ippp_bitexact(tmp_path, size, preset):
    w, h = size
    fmt = VideoFormat(w, h)
    seq = SequenceConfig(width=w, height=h)
    enc = Av1Encoder(seq, preset=preset)
    frames_src = [synth_frame(fmt, t, "blobs") for t in range(4)]
    path = tmp_path / "out.ivf"
    recons = []
    sizes = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        for t, fs in enumerate(frames_src):
            tu = enc.encode_frame(fs, 100, force_key=(t == 0))
            sizes.append(len(tu))
            wr.write_frame(tu, t)
            recons.append([p.copy() for p in enc.last_recon])
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == 4
    for t in range(4):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
    # inter frames must be substantially smaller than the keyframe on this
    # temporally-correlated content
    assert max(sizes[1:]) < sizes[0]
    assert psnr(dec[-1][0], frames_src[-1][0]) > 35


def test_static_scene_all_skip(tmp_path):
    """A static scene's inter frames collapse to near-zero bits."""
    rng = np.random.RandomState(0)
    planes = [rng.randint(0, 255, (96, 128)).astype(np.uint8),
              rng.randint(0, 255, (48, 64)).astype(np.uint8),
              rng.randint(0, 255, (48, 64)).astype(np.uint8)]
    seq = SequenceConfig(width=128, height=96)
    enc = Av1Encoder(seq, preset=10)
    path = tmp_path / "s.ivf"
    recons = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 128, 96)
        for t in range(3):
            tu = enc.encode_frame(planes, 100, force_key=(t == 0))
            wr.write_frame(tu, t)
            recons.append([p.copy() for p in enc.last_recon])
        wr.close()
    dec = decode_ivf(path)
    for t in range(3):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
    # successive inter frames keep refining toward the (static) source
    assert psnr(dec[2][0], planes[0]) >= psnr(dec[1][0], planes[0])
