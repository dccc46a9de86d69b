"""Recursive filter-intra: predictor bit-exactness + e2e conformance."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import oracle  # noqa: E402

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.bitstream.tile_writer import TileWriter  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.ops.intra import filter_intra_predict  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402

SHAPES = [(4, 4), (8, 8), (16, 16), (32, 32), (4, 8), (8, 4), (8, 16),
          (16, 8), (16, 32), (32, 16), (4, 16), (16, 4), (8, 32), (32, 8)]


@pytest.mark.skipif(not oracle.available(), reason="reference unavailable")
def test_predictor_bitexact_vs_oracle():
    rng = np.random.default_rng(0)
    for _ in range(40):
        w, h = SHAPES[int(rng.integers(0, len(SHAPES)))]
        mode = int(rng.integers(0, 5))
        a = rng.integers(0, 256, w + 2)
        left = rng.integers(0, 256, h)
        assert np.array_equal(
            filter_intra_predict(a[:w + 1], left, mode, w, h, 8),
            oracle.filter_intra_predict(a, left, mode, w, h, 8)), (w, h, mode)


def _blob_frame(w, h, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(90 + 70 * np.exp(-((xx - 60) ** 2 + (yy - 50) ** 2) / 900.0)
                + 60 * (xx > 120) + rng.normal(0, 4, (h, w)),
                0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    return [y, u, v]


def _count_fi_and_roundtrip(enc, planes, q, tmp_path, name):
    nfi = [0]
    orig = TileWriter._write_block

    def spy(self, leaf, r, c, bsize):
        if leaf is not None and leaf.use_filter_intra:
            nfi[0] += 1
        return orig(self, leaf, r, c, bsize)

    TileWriter._write_block = spy
    try:
        tu = enc.encode_frame(planes, q)
    finally:
        TileWriter._write_block = orig
    path = tmp_path / f"{name}.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, enc.seq.width, enc.seq.height)
        wr.write_frame(tu, 0)
        wr.close()
    dec = decode_ivf(path)
    for i in range(3):
        dh, dw = dec[0][i].shape
        assert np.array_equal(dec[0][i], enc.last_recon[i][:dh, :dw]), i
    return nfi[0]


def test_search_selects_fi_and_decodes(tmp_path, monkeypatch):
    """Real RD picks filter-intra blocks on smooth-blob content and the
    stream (use_filter_intra flags + mode symbols + recursive recon +
    mapped ext-tx context) decodes bit-exactly in dav1d."""
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")  # FI search = host MD
    w, h = 192, 128
    enc = Av1Encoder(SequenceConfig(width=w, height=h), preset=6)
    n = _count_fi_and_roundtrip(enc, _blob_frame(w, h), 120, tmp_path, "fi")
    assert n > 0, "RD never selected filter intra"


def test_fi_off_at_fast_presets(tmp_path):
    w, h = 96, 64
    enc = Av1Encoder(SequenceConfig(width=w, height=h), preset=10)
    assert not enc.seq.enable_filter_intra
    n = _count_fi_and_roundtrip(enc, _blob_frame(w, h), 120, tmp_path, "fi0")
    assert n == 0


def test_fi_inter_frame_intra_blocks(tmp_path):
    """Filter intra inside an inter frame's intra blocks round-trips."""
    from svt_av1_psyex_tpu.codec.gop import plan_key, plan_minigop

    w, h = 192, 128
    planes0 = _blob_frame(w, h, seed=1)
    planes1 = [np.roll(p, 2, axis=1) for p in _blob_frame(w, h, seed=2)]
    seq = SequenceConfig(width=w, height=h)
    enc = Av1Encoder(seq, preset=6)
    path = tmp_path / "fi_inter.ivf"
    recons = {}
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        n = 0
        for pl, planes in zip(
                [plan_key(0)] + plan_minigop(0, 1, 1, future_slot=1),
                [planes0, planes1]):
            tu = enc.encode_frame(planes, 120, plan=pl)
            wr.write_frame(tu, n)
            n += 1
            recons[pl.disp_idx] = [q.copy() for q in enc.last_recon]
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == 2
    for t in range(2):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
