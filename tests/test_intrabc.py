"""Intra block copy (screen-content tools): DV prediction, syntax,
no-filter frames, conformance.

Counterpart: mode_decision.c:3390 (candidate generation),
entropy_coding.c:4290 (svt_av1_encode_dv), adaptive_mv_pred.c:1832
(av1_is_dv_valid), inter_prediction.c:2270 (svt_aom_find_ref_dv)."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
from svt_av1_psyex_tpu.utils.ivf import IvfWriter



def _repeat_rows(h=192, w=192, period=16, seed=1):
    """Identical 'text' rows repeating vertically: ideal intra-BC."""
    rng = np.random.default_rng(seed)
    y = np.full((h, w), 30, np.uint8)
    row = np.full((period, w), 30, np.uint8)
    for _ in range(14):
        c0 = rng.integers(0, w - 12)
        row[4:12, c0:c0 + 8] = 220
    for rr in range(0, h, period):
        y[rr:rr + period] = row[: min(period, h - rr)]
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    return [y, u, v]


def _count_dv(state):
    import svt_av1_psyex_tpu.bitstream.tile_writer as tw

    orig = tw.TileWriter._write_dv
    state["n"] = 0

    def spy(self, dv, rdv):
        state["n"] += 1
        return orig(self, dv, rdv)

    tw.TileWriter._write_dv = spy
    return lambda: setattr(tw.TileWriter, "_write_dv", orig)


@pytest.mark.quick
@pytest.mark.parametrize("q", [120])
def test_intrabc_keyframe_dav1d_exact(tmp_path, q):
    planes = _repeat_rows()
    st = {}
    restore = _count_dv(st)
    try:
        enc = Av1Encoder(SequenceConfig(width=192, height=192), preset=6,
                         screen_content_mode=1)
        tu = enc.encode_keyframe([p.copy() for p in planes], q)
        rec = [p.copy() for p in enc.last_recon]
    finally:
        restore()
    assert st["n"] > 0, "no intra-BC blocks chosen on repeating content"
    path = tmp_path / "ibc.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 192, 192)
        wr.write_frame(tu, 0)
        wr.close()
    dec = decode_ivf(path)
    for p in range(3):
        dh, dw = dec[0][p].shape
        assert np.array_equal(dec[0][p], rec[p][:dh, :dw])


def test_intrabc_saves_bits_on_repeats(tmp_path):
    planes = _repeat_rows(seed=4)
    sizes = {}
    import os

    for label, env in (("on", "0"), ("off", "1")):
        os.environ["SVT_TPU_NO_INTRABC"] = env
        try:
            enc = Av1Encoder(SequenceConfig(width=192, height=192),
                             preset=6, screen_content_mode=1)
            sizes[label] = len(enc.encode_keyframe(
                [p.copy() for p in planes], 100))
        finally:
            del os.environ["SVT_TPU_NO_INTRABC"]
    assert sizes["on"] <= sizes["off"]


@pytest.mark.quick
def test_dv_valid_rules():
    from svt_av1_psyex_tpu.codec.mvp import dv_valid

    mi_rows = mi_cols = 48  # 192x192, 3 SB64 per row
    # one SB up from SB row 1: violates the 256px raster delay
    assert not dv_valid((-512, 0), 16, 0, 12, mi_rows, mi_cols)
    # two SBs up from SB row 2: legal
    assert dv_valid((-1024, 0), 32, 0, 12, mi_rows, mi_cols)
    # out of frame
    assert not dv_valid((-8, 0), 0, 0, 12, mi_rows, mi_cols)
    # subpel DV never valid
    assert not dv_valid((-1023, 0), 32, 0, 12, mi_rows, mi_cols)
    # source one row up and two SB64 right of the diagonal: rejected
    assert not dv_valid((-512, 1024), 32, 0, 12, mi_rows, mi_cols)
    # up-and-one-right within the diagonal: legal
    assert dv_valid((-1024, 512), 32, 0, 12, mi_rows, mi_cols)


@pytest.mark.quick
def test_find_ref_dv_fallbacks():
    from svt_av1_psyex_tpu.codec.mvp import MiState, find_dv_ref

    mi = MiState(48, 48)
    # first SB row: one SB + delay to the left
    assert find_dv_ref(mi, 0, 0, 12, 48, 48) == (0, (-64 - 256) * 8)
    # later rows: one SB up
    assert find_dv_ref(mi, 16, 0, 12, 48, 48) == (-64 * 8, 0)
    # a neighbor DV propagates through the INTRA_FRAME stack
    mi.set_block(14, 0, 12, 0, (-1024, 0), False)
    got = find_dv_ref(mi, 16, 0, 12, 48, 48)
    assert got == (-1024, 0)
