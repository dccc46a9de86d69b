"""Chroma-from-luma: alpha search, syntax, and dav1d conformance."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.bitstream.tile_writer import TileWriter  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.ops.intra import (  # noqa: E402
    cfl_ac,
    cfl_context_u,
    cfl_context_v,
    cfl_joint_sign,
    cfl_predict,
)
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402


def _mosaic(w, h, bd=8, seed=7):
    """Sharp 24px mosaic + texture, chroma strongly luma-correlated —
    forces sub-32 partitions where CfL is allowed and profitable."""
    rng = np.random.default_rng(seed)
    mx = (1 << bd) - 1
    mid = 1 << (bd - 1)
    scale = 1 << (bd - 8)
    base = rng.integers(40 * scale, 216 * scale, (h // 24 + 1, w // 24 + 1))
    y = np.kron(base, np.ones((24, 24)))[:h, :w]
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(y + 25 * scale * np.sin(xx / 5.0) * np.cos(yy / 6.0)
                + rng.normal(0, 3 * scale, (h, w)), 0, mx)
    dt = np.uint8 if bd == 8 else np.uint16
    y = y.astype(dt)
    ysub = y.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    u = np.clip(mid + 0.85 * (ysub - mid), 0, mx).astype(dt)
    v = np.clip(mid - 0.7 * (ysub - mid), 0, mx).astype(dt)
    return [y, u, v]


def _count_cfl_roundtrip(enc, planes, q, tmp_path, name):
    cnt = [0]
    orig = TileWriter._write_block

    def spy(self, leaf, r, c, bsize):
        if leaf is not None and leaf.uv_mode == 13:
            cnt[0] += 1
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
    return cnt[0], len(tu)


def test_kernels_basic():
    rng = np.random.default_rng(0)
    luma = rng.integers(0, 256, (16, 16)).astype(np.int32)
    ac = cfl_ac(luma, 8, 8, 1, 1)
    assert ac.shape == (8, 8)
    # scaled by 8, zero-mean up to rounding
    assert abs(int(ac.sum())) <= 8 * 8 // 2
    dc = np.full((8, 8), 100, np.int32)
    p = cfl_predict(dc, ac, 8, 8)
    assert p.min() >= 0 and p.max() <= 255
    assert np.array_equal(cfl_predict(dc, ac, 0, 8), dc)
    # sign/context tables (definitions.h:1078-1094)
    assert cfl_joint_sign(1, 0) == 5  # U pos, V zero -> 2*3+0-1
    assert cfl_joint_sign(-2, 3) == 4
    assert cfl_context_u(5) == 3
    assert cfl_context_v(4) == 4  # SIGN_V(4)=2, SIGN_U(4)=1 -> 2*3+1-3


def test_cfl_selected_and_dav1d_bitexact(tmp_path, monkeypatch):
    # CfL search lives on the host MD path; preset 6 defaults to the
    # device lattice (round-3 gate lift) whose mode set has no CfL yet
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    w, h = 192, 128
    enc = Av1Encoder(SequenceConfig(width=w, height=h), preset=6)
    n, _ = _count_cfl_roundtrip(enc, _mosaic(w, h), 60, tmp_path, "cfl")
    assert n > 0, "RD never selected CfL"


def test_cfl_saves_bits_on_correlated_chroma(tmp_path, monkeypatch):
    import svt_av1_psyex_tpu.codec.md as M

    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    w, h = 192, 128
    planes = _mosaic(w, h)
    enc = Av1Encoder(SequenceConfig(width=w, height=h), preset=6)
    _, bytes_cfl = _count_cfl_roundtrip(enc, [p.copy() for p in planes], 60,
                                        tmp_path, "cfl_on")
    orig_init = M.ModeDecision.__init__

    def no_cfl(self, *a, **k):
        k["cfl"] = False
        orig_init(self, *a, **k)

    M.ModeDecision.__init__ = no_cfl
    try:
        enc2 = Av1Encoder(SequenceConfig(width=w, height=h), preset=6)
        tu2 = enc2.encode_frame([p.copy() for p in planes], 60)
    finally:
        M.ModeDecision.__init__ = orig_init
    assert bytes_cfl < len(tu2), (bytes_cfl, len(tu2))


def test_cfl_10bit(tmp_path, monkeypatch):
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    w, h = 96, 96
    enc = Av1Encoder(SequenceConfig(width=w, height=h, bit_depth=10),
                     preset=6)
    n, _ = _count_cfl_roundtrip(enc, _mosaic(w, h, bd=10), 80, tmp_path,
                                "cfl10")
    assert n > 0


def test_cfl_inter_frame(tmp_path):
    from svt_av1_psyex_tpu.codec.gop import plan_key, plan_minigop

    w, h = 192, 128
    p0 = _mosaic(w, h, seed=7)
    p1 = [np.roll(p, 3, axis=1) for p in _mosaic(w, h, seed=8)]
    seq = SequenceConfig(width=w, height=h)
    enc = Av1Encoder(seq, preset=6)
    path = tmp_path / "cfl_inter.ivf"
    recons = {}
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        n = 0
        for pl, planes in zip(
                [plan_key(0)] + plan_minigop(0, 1, 1, future_slot=1),
                [p0, p1]):
            tu = enc.encode_frame(planes, 60, plan=pl)
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
