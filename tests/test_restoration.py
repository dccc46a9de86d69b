"""Loop restoration: kernel bit-exactness vs the C oracle, striped
geometry, and e2e dav1d conformance for all three frame types."""

import ctypes
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import oracle  # noqa: E402
from mkclip import synth_frame  # noqa: E402

import svt_av1_psyex_tpu.codec.restoration as CR  # noqa: E402
from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.ops import restoration as R  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402

needs_oracle = pytest.mark.skipif(not oracle.available(),
                                  reason="reference tree unavailable")


@needs_oracle
def test_sgr_tables_match_reference():
    lib = oracle.get_lib()
    tab = np.ctypeslib.as_array(
        (ctypes.c_int32 * 256).in_dll(lib, "svt_aom_eb_x_by_xplus1"))
    assert np.array_equal(tab, R._X_BY_XPLUS1)
    onex = np.ctypeslib.as_array(
        (ctypes.c_int32 * 25).in_dll(lib, "svt_aom_eb_one_by_x"))
    assert np.array_equal(onex, R._ONE_BY_X)


@needs_oracle
@pytest.mark.parametrize("bd", [8, 10, 12])
def test_wiener_convolve_bitexact(bd):
    rng = np.random.default_rng(bd)
    for _ in range(10):
        h = int(rng.choice([1, 5, 8, 32, 56, 64]))
        w = int(rng.choice([4, 16, 32, 64]))
        pad = rng.integers(0, 1 << bd, (h + 6, w + 6))
        ht = (int(rng.integers(-5, 11)), int(rng.integers(-23, 9)),
              int(rng.integers(-17, 47)))
        vt = (int(rng.integers(-5, 11)), int(rng.integers(-23, 9)),
              int(rng.integers(-17, 47)))
        assert np.array_equal(R.wiener_convolve(pad, ht, vt, bd),
                              oracle.wiener_convolve(pad, ht, vt, bd))


@needs_oracle
@pytest.mark.parametrize("bd", [8, 10])
def test_apply_sgr_bitexact(bd):
    rng = np.random.default_rng(bd)
    for _ in range(12):
        h = int(rng.choice([1, 5, 8, 32, 56, 64]))
        w = int(rng.choice([4, 16, 32, 64]))
        ep = int(rng.integers(0, 16))
        xqd = [int(rng.integers(-96, 32)), int(rng.integers(-32, 96))]
        pad = rng.integers(0, 1 << bd, (h + 6, w + 6))
        assert np.array_equal(R.apply_sgr(pad, ep, xqd, bd),
                              oracle.apply_sgr(pad, ep, xqd, bd))


def test_unit_geometry():
    # 640x200 luma, 256 units: 3 cols (last absorbs 128), 1 row
    rows, cols = R.unit_rows_cols(256, 640, 200, 0)
    assert cols == [(0, 256), (256, 512), (512, 640)]
    assert rows == [(0, 200)]
    # 600 rows: last RU absorbs the 344-px remainder (< 1.5 * 256);
    # RU rows shift up by the 8-px stripe offset
    rows, _ = R.unit_rows_cols(256, 64, 600, 0)
    assert rows == [(0, 248), (248, 600)]
    # 700 rows: remainder 188 makes its own (offset) RU row
    rows, _ = R.unit_rows_cols(256, 64, 700, 0)
    assert rows == [(0, 248), (248, 504), (504, 700)]
    # stripes: first 56 high, then 64s
    assert R.stripes_in(0, 200, 0) == [(0, 56), (56, 64), (120, 64), (184, 16)]
    assert R.stripes_in(248, 504, 0) == [(248, 64), (312, 64), (376, 64),
                                         (440, 64)]
    # chroma (ss_y=1): 32-row stripes offset 4
    assert R.stripes_in(0, 100, 1) == [(0, 28), (28, 32), (60, 32), (92, 8)]
    assert R.count_units(256, 100) == 1
    assert R.count_units(256, 384) == 2


def test_wiener_identity_taps():
    rng = np.random.default_rng(0)
    d = rng.integers(0, 256, (64, 64)).astype(np.int64)
    pad = np.pad(d, 3, mode="edge")
    assert np.array_equal(R.wiener_convolve(pad, (0, 0, 0), (0, 0, 0), 8), d)


def _textured_frame(w, h, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
                + 40 * ((xx // 24 + yy // 16) % 2)
                + rng.normal(0, 6, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(110 + 30 * np.sin(xx[::2, ::2] / 9.0), 0, 255).astype(np.uint8)
    v = np.clip(140 + 30 * np.cos(yy[::2, ::2] / 11.0), 0, 255).astype(np.uint8)
    return [y, u, v]


def _roundtrip(enc, planes, q, tmp_path, name):
    tu = enc.encode_frame(planes, q)
    path = tmp_path / f"{name}.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, enc.seq.width, enc.seq.height)
        wr.write_frame(tu, 0)
        wr.close()
    dec = decode_ivf(path)
    for i in range(3):
        dh, dw = dec[0][i].shape
        assert np.array_equal(dec[0][i], enc.last_recon[i][:dh, :dw]), i
    return tu


def _force_search(force_type):
    """Replace the RD search with a deterministic unit-type generator so
    the syntax/apply path is exercised regardless of content."""
    from svt_av1_psyex_tpu.ops.restoration import filter_plane, unit_rows_cols

    def forced(src, cdef, deblock, pw, ph, ss_y, unit, bd, rdm, chroma,
               preset, type_costs):
        rows, cols = unit_rows_cols(unit, pw, ph, ss_y)
        n = len(rows) * len(cols)
        rng = np.random.default_rng(100 + n + (1 if chroma else 0))
        units = []
        for i in range(n):
            kind = [1, 2, 0, 1][i % 4] if force_type == 3 else force_type
            if kind == 1:
                def taps():
                    return (0 if chroma else int(rng.integers(-5, 11)),
                            int(rng.integers(-23, 9)),
                            int(rng.integers(-17, 47)))
                units.append((1, (taps(), taps()), 0))
            elif kind == 2:
                ep = int(rng.integers(0, 16))
                xqd = CR._encode_xq(float(rng.integers(-40, 40)),
                                    float(rng.integers(-20, 60)), ep)
                units.append((2, (ep, xqd), 0))
            else:
                units.append((0, None, 0))
        info = CR.RestorationInfo(force_type, unit, units)
        restored = filter_plane(cdef, deblock, unit,
                                [(t, p) for t, p, _ in units],
                                pw, ph, ss_y, bd)
        return info, restored

    return forced


@pytest.mark.parametrize("ftype", [1, 2, 3])
def test_forced_lr_types_dav1d_bitexact(ftype, tmp_path, monkeypatch):
    """RESTORE_WIENER / RESTORE_SGRPROJ / RESTORE_SWITCHABLE unit syntax
    (subexp delta coding vs running refs, restore CDFs) + striped apply
    decode bit-exactly in dav1d, across multiple RUs and stripes."""
    monkeypatch.setattr(CR, "search_plane", _force_search(ftype))
    w, h = 640, 200
    seq = SequenceConfig(width=w, height=h)
    enc = Av1Encoder(seq, preset=10, enable_restoration=True)
    _roundtrip(enc, _textured_frame(w, h), 120, tmp_path, f"lr{ftype}")


def test_lr_search_engages_and_decodes(tmp_path):
    """The real RD search selects restoration on textured content, the
    stream decodes bit-exactly, and PSNR does not regress vs LR off."""
    from svt_av1_psyex_tpu.conformance.dav1d import psnr

    w, h = 320, 128
    planes = _textured_frame(w, h)
    seq = SequenceConfig(width=w, height=h)
    enc = Av1Encoder(seq, preset=8, enable_restoration=True)
    picked = []
    orig = Av1Encoder._search_apply_lr

    def spy(self, st):
        orig(self, st)
        picked.extend(i.frame_type for i in st["tw"].lr_infos
                      if i is not None)

    Av1Encoder._search_apply_lr = spy
    try:
        _roundtrip(enc, [p.copy() for p in planes], 100, tmp_path, "lrs")
    finally:
        Av1Encoder._search_apply_lr = orig
    assert any(t != 0 for t in picked), "search never chose restoration"
    seq2 = SequenceConfig(width=w, height=h)
    enc2 = Av1Encoder(seq2, preset=8, enable_restoration=False)
    enc2.encode_frame([p.copy() for p in planes], 100)
    p_lr = psnr(enc.last_recon[0][:h, :w], planes[0], 8)
    p_no = psnr(enc2.last_recon[0][:h, :w], planes[0], 8)
    assert p_lr >= p_no - 0.01


def test_lr_10bit_dav1d_bitexact(tmp_path, monkeypatch):
    monkeypatch.setattr(CR, "search_plane", _force_search(3))
    w, h = 320, 128
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(512 + 300 * np.sin(xx / 6.0) * np.cos(yy / 4.0)
                + rng.normal(0, 20, (h, w)), 0, 1023).astype(np.uint16)
    u = np.full((h // 2, w // 2), 470, np.uint16)
    v = np.full((h // 2, w // 2), 560, np.uint16)
    seq = SequenceConfig(width=w, height=h, bit_depth=10)
    enc = Av1Encoder(seq, preset=10, enable_restoration=True)
    _roundtrip(enc, [y, u, v], 140, tmp_path, "lr10")
