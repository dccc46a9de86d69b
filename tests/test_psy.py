"""Variance boost + per-SB delta q: unit behavior + e2e conformance."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
from svt_av1_psyex_tpu.codec.psy import (
    sb_variances_8x8,
    variance_adjust_qp,
    variance_boost,
)
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
from svt_av1_psyex_tpu.utils.ivf import IvfWriter


def _mixed_frame():
    rng = np.random.RandomState(0)
    y = np.zeros((192, 192), np.uint8)
    xx = np.mgrid[0:192, 0:192][1]
    y[:96] = (xx[:96] // 3 + 30).astype(np.uint8)
    y[96:] = rng.randint(0, 255, (96, 192)).astype(np.uint8)
    return [y, np.full((96, 96), 110, np.uint8), np.full((96, 96), 140, np.uint8)]


def test_variance_boost_direction():
    flat = np.full((64, 64), 100, np.int64)
    noisy = np.random.RandomState(1).randint(0, 255, (64, 64)).astype(np.int64)
    v_flat = sb_variances_8x8(flat, 0, 0)
    v_noisy = sb_variances_8x8(noisy, 0, 0)
    assert v_flat.max() == 0
    b_flat = variance_boost(160, v_flat, 2, 8, 6, 0)
    b_noisy = variance_boost(160, v_noisy, 2, 8, 6, 0)
    assert b_flat > b_noisy >= 0


def test_qmap_res_alignment():
    y = _mixed_frame()[0].astype(np.int64)
    base, qmap, res = variance_adjust_qp(y, 160, 2, 6, 0, 8)
    assert res in (1, 2, 4, 8)
    if res > 1:
        assert np.all((qmap - (base & (res - 1))) % res == 0)
    assert qmap.min() >= 1 and qmap.max() <= 255


@pytest.mark.slow
def test_delta_q_e2e_bitexact(tmp_path):
    planes = _mixed_frame()
    seq = SequenceConfig(width=192, height=192)
    enc = Av1Encoder(seq, preset=10, enable_variance_boost=True)
    path = tmp_path / "vb.ivf"
    recons = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 192, 192)
        for t in range(2):
            wr.write_frame(enc.encode_frame(planes, 160, force_key=(t == 0)), t)
            recons.append([p.copy() for p in enc.last_recon])
        wr.close()
    dec = decode_ivf(path)
    for t in range(2):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
