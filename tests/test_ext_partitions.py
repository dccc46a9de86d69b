"""Extended partitions (AB + 4-way) conformance.

The RD search rarely picks ext shapes on tiny synthetic clips, so these
tests force each shape (monkeypatched `_try_multi` cost) and check the
full encode -> dav1d decode round trip bit-exactly.

4-way partitions at 16x16 produce 16x4/4x16 blocks; in 4:2:0 those
would need the spec's sub-8x8 chroma-pair coding (not implemented), so
the search only offers them when the 4px axis is unsubsampled — here
they're covered at 32x32 (4:2:0) and at 16x16 in monochrome, where the
4px-at-odd-mi blocks exercise the sub-8x8 MVP scan adjustments
(reference adaptive_mv_pred.c:133-139,645-671). Square children of
VERT_A/VERT_B use the orders_vert availability tables
(reference intra_prediction.c:683-692,938-947).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from mkclip import synth_frame  # noqa: E402

import svt_av1_psyex_tpu.codec.md as mdmod  # noqa: E402
from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.bitstream.tile_writer import Partition  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.codec.gop import plan_key, plan_minigop  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402

FORCE_COST = -(10**15)  # beats every real RD cost, including SPLIT sums


def _force(monkeypatch, target_part, at_bsize=6):
    """Make `target_part` win unconditionally at `at_bsize` blocks."""
    orig_try = mdmod.ModeDecision._try_multi
    hits = [0]

    def patched(self, part, r, c, bsize, part_rates, blocks, best):
        if part == target_part and bsize == at_bsize:
            got = orig_try(self, part, r, c, bsize, part_rates, blocks, None)
            if got is not None and got[1].partition == part:
                hits[0] += 1
                return (FORCE_COST, got[1], got[2])
        return orig_try(self, part, r, c, bsize, part_rates, blocks, best)

    monkeypatch.setattr(mdmod.ModeDecision, "_try_multi", patched)
    orig_init = mdmod.ModeDecision.__init__

    def init(self, *a, **kw):
        kw["try_4way"] = True  # force the search on regardless of preset
        orig_init(self, *a, **kw)

    monkeypatch.setattr(mdmod.ModeDecision, "__init__", init)
    return hits


def _mono_frames(w, h, n):
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w]
    return [[np.clip(110 + 70 * np.sin((xx + 4 * t) / 9.0) * np.cos(yy / 7.0)
                     + rng.integers(-5, 6, (h, w)), 0, 255).astype(np.uint8)]
            for t in range(n)]


def _roundtrip(tmp_path, tag, w=64, h=64, n=2, mono=False):
    if mono:
        frames = _mono_frames(w, h, n)
        nplanes = 1
    else:
        fmt = VideoFormat(w, h)
        frames = [synth_frame(fmt, t, "blobs") for t in range(n)]
        nplanes = 3
    enc = Av1Encoder(SequenceConfig(width=w, height=h, mono_chrome=mono),
                     preset=5)
    plans = [plan_key(0)]
    if n > 1:
        plans += plan_minigop(0, 1, n - 1, future_slot=1, mid_slot=2)
    path = tmp_path / "ext.ivf"
    recons = {}
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        k = 0
        for pl in plans:
            src = frames[pl.disp_idx] if pl.show_existing_slot is None else None
            tu = enc.encode_frame(src, 105, plan=pl)
            wr.write_frame(tu, k)
            k += 1
            if pl.show_frame or pl.show_existing_slot is not None:
                recons[pl.disp_idx] = [q.copy() for q in enc.last_recon]
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == n
    for disp in range(n):
        for i in range(nplanes):
            dh, dw = dec[disp][i].shape
            assert np.array_equal(dec[disp][i], recons[disp][i][:dh, :dw]), (
                tag, disp, i)


# AB shapes at 16x16 in 4:2:0 over a key + inter frame pair
@pytest.mark.parametrize("part", [Partition.HORZ_A, Partition.HORZ_B,
                                  Partition.VERT_A, Partition.VERT_B])
def test_forced_ab_partition_bitexact(tmp_path, monkeypatch, part):
    tag = Partition(part).name
    hits = _force(monkeypatch, part, at_bsize=6)
    _roundtrip(tmp_path, tag)
    assert hits[0] > 0, "forced ext partition never evaluated"


# 4-way keyframes are bit-exact (32x32 in 4:2:0; 16x16 needs an
# unsubsampled axis — covered by the mono tests below)
@pytest.mark.parametrize("part", [Partition.HORZ_4, Partition.VERT_4])
def test_forced_4way_key_bitexact(tmp_path, monkeypatch, part):
    tag = Partition(part).name
    hits = _force(monkeypatch, part, at_bsize=9)
    _roundtrip(tmp_path, tag, n=1)
    assert hits[0] > 0, "forced ext partition never evaluated"


# 4-way inter frames: exact after two root-cause fixes — SIZE_GROUP's
# ext tail (0,0,1,1,2,2, one group lower than same-long-dim squares)
# and the vertical is_sec_rect rule in the MVP has_top_right
# (mi_col + width alignment, so VERT_4 children mark 0,0,0,1)
@pytest.mark.parametrize("part", [Partition.HORZ_4, Partition.VERT_4])
def test_forced_4way_inter_bitexact(tmp_path, monkeypatch, part):
    tag = f"{Partition(part).name}-inter"
    hits = _force(monkeypatch, part, at_bsize=9)
    _roundtrip(tmp_path, tag, n=2)
    assert hits[0] > 0, "forced ext partition never evaluated"


def test_forced_ext_at_32(tmp_path, monkeypatch):
    # AB shape at 32x32 (square children 16x16, rect 32x16)
    hits = _force(monkeypatch, Partition.HORZ_B, at_bsize=9)
    _roundtrip(tmp_path, "HORZ_B@32")
    assert hits[0] > 0, "forced ext partition never evaluated"


@pytest.mark.parametrize("part", [Partition.HORZ_4, Partition.VERT_4])
def test_forced_4way_16_mono(tmp_path, monkeypatch, part):
    # 16x4 / 4x16 blocks at odd mi positions (sub-8x8 MVP scans),
    # key + inter
    tag = f"{Partition(part).name}@16mono"
    hits = _force(monkeypatch, part, at_bsize=6)
    _roundtrip(tmp_path, tag, n=2, mono=True)
    assert hits[0] > 0, "forced ext partition never evaluated"
