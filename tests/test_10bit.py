"""10-bit pipeline: intra/inter/GOP/compound + highbd DLF/CDEF, bit-exact."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
from svt_av1_psyex_tpu.codec.gop import plan_key, plan_minigop
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
from svt_av1_psyex_tpu.utils.ivf import IvfWriter


def _frames10(n, h=64, w=96):
    rng = np.random.RandomState(3)
    grad = (np.mgrid[0:h, 0:w][1] * 9 + 40).astype(np.uint16)
    noise = rng.randint(0, 1024, (h, w)).astype(np.uint16)
    y0 = np.where(np.mgrid[0:h, 0:w][0] < h // 2, grad, noise)
    out = []
    for t in range(n):
        y = np.roll(y0, t, axis=1)
        out.append([y, np.full((h // 2, w // 2), 512, np.uint16),
                    np.full((h // 2, w // 2), 300, np.uint16)])
    return out


def _check(path, recons, n):
    dec = decode_ivf(path)
    assert len(dec) == n
    for t in range(n):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert dec[t][i].dtype == np.uint16
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)


def test_10bit_ippp_bitexact(tmp_path):
    frames = _frames10(4)
    seq = SequenceConfig(width=96, height=64, bit_depth=10)
    enc = Av1Encoder(seq, preset=10)
    path = tmp_path / "b10.ivf"
    recons = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 96, 64)
        for t in range(4):
            wr.write_frame(enc.encode_frame(frames[t], 120, force_key=(t == 0)), t)
            recons.append([q.copy() for q in enc.last_recon])
        wr.close()
    _check(path, recons, 4)


def test_10bit_gop_compound_bitexact(tmp_path):
    frames = _frames10(5)
    seq = SequenceConfig(width=96, height=64, bit_depth=10)
    enc = Av1Encoder(seq, preset=8)
    plans = [plan_key(0)] + plan_minigop(0, 1, 4, future_slot=1, mid_slot=2)
    path = tmp_path / "b10gop.ivf"
    recons = {}
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 96, 64)
        n = 0
        for pl in plans:
            src = frames[pl.disp_idx] if pl.show_existing_slot is None else None
            tu = enc.encode_frame(src, 120, plan=pl)
            wr.write_frame(tu, n)
            n += 1
            if pl.show_frame or pl.show_existing_slot is not None:
                recons[pl.disp_idx] = [q.copy() for q in enc.last_recon]
        wr.close()
    _check(path, [recons[t] for t in range(5)], 5)
