"""MFMV (temporal MV prediction, spec 7.9): projection unit checks +
dav1d-bit-exact e2e with the temporal grid demonstrably active.

Counterpart coverage: motion_field_projection / av1_setup_motion_field
(md_config_process.c:453-591), av1_copy_frame_mvs (coding_loop.c:1208),
add_tpl_ref_mv (adaptive_mv_pred.c:340).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from mkclip import synth_frame

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
from svt_av1_psyex_tpu.codec import mfmv
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
from svt_av1_psyex_tpu.codec.mvp import MiState
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
from svt_av1_psyex_tpu.utils.ivf import IvfWriter
from svt_av1_psyex_tpu.utils.y4m import VideoFormat


def test_mv_projection_matches_scalar():
    """Vectorized get_mv_projection vs a scalar transcription."""
    rng = np.random.default_rng(3)
    for _ in range(200):
        r = int(rng.integers(-4000, 4000))
        c = int(rng.integers(-4000, 4000))
        num = int(rng.integers(-31, 32))
        den = int(rng.integers(1, 32))
        pr, pc = mfmv.mv_projection(np.array([r]), np.array([c]), num,
                                    np.array([den]))

        def scalar(v):
            x = v * num * int(mfmv.DIV_MULT[min(den, 31)])
            s = (abs(x) + (1 << 13)) >> 14
            s = -s if x < 0 else s
            return max(-16383, min(16383, s))  # MV_UPP - 1

        assert int(pr[0]) == scalar(r) and int(pc[0]) == scalar(c)


def test_save_frame_mvs_rules():
    """Second component wins; future-side refs and over-limit MVs are
    skipped; odd-mi sampling models last-writer-wins."""
    mi = MiState(4, 4)
    side = np.zeros(8, np.int8)
    side[4] = 1  # GOLDEN on the future side -> skipped
    # cell (0,0): compound LAST+GOLDEN; GOLDEN (idx 1) skipped -> LAST
    mi.set_block(0, 0, 3, 1, (8, -8), True, ref_frame1=4, mv1=(2, 2))
    # cell (0,1): compound LAST+BWD, both saveable -> idx 1 (BWD) wins
    mi.set_block(0, 2, 3, 1, (4, 4), True, ref_frame1=5, mv1=(-6, 6))
    # cell (1,0): over-limit MV -> skipped, stays 0
    mi.set_block(2, 0, 3, 2, (5000, 0), True)
    saved = mfmv.save_frame_mvs(mi, side)
    assert saved["ref"][0, 0] == 1 and saved["mv_row"][0, 0] == 8
    assert saved["ref"][0, 1] == 5 and saved["mv_row"][0, 1] == -6
    assert saved["ref"][1, 0] == 0


def _scalar_project(tpl_shape, saved, saved_hints, start_hint, cur_hint,
                    direction, bits):
    """Scalar oracle of _project_one (the C's raster double loop)."""
    h8, w8 = tpl_shape
    out = {}
    stc = mfmv.rel_dist(bits, start_hint, cur_hint)
    if direction == 2:
        stc = -stc
    if abs(stc) > mfmv.MAX_FRAME_DISTANCE:
        return out
    for br in range(h8):
        for bc in range(w8):
            rf = int(saved["ref"][br, bc])
            if rf < 1:
                continue
            roff = mfmv.rel_dist(bits, start_hint, saved_hints[rf - 1])
            if not (0 < roff <= mfmv.MAX_FRAME_DISTANCE):
                continue
            fr_ = int(saved["mv_row"][br, bc])
            fc_ = int(saved["mv_col"][br, bc])
            pr, pc = mfmv.mv_projection(np.array([fr_]), np.array([fc_]),
                                        stc, np.array([roff]))
            pr, pc = int(pr[0]), int(pc[0])
            ro = pr >> 6 if pr >= 0 else -((-pr) >> 6)
            co = pc >> 6 if pc >= 0 else -((-pc) >> 6)
            sign = 1 if (direction >> 1) == 1 else -1
            row = br - sign * ro
            col = bc - sign * co
            if not (0 <= row < h8 and 0 <= col < w8):
                continue
            base_r, base_c = (br >> 3) << 3, (bc >> 3) << 3
            if not (base_r <= row < base_r + 8
                    and base_c - 8 <= col < base_c + 16):
                continue
            out[(row, col)] = (fr_, fc_, roff)
    return out


def test_projection_matches_scalar_oracle():
    rng = np.random.default_rng(11)
    h8, w8 = 12, 20
    for trial in range(10):
        saved = {
            "ref": rng.integers(0, 4, (h8, w8)).astype(np.int8),
            "mv_row": rng.integers(-900, 900, (h8, w8)).astype(np.int16),
            "mv_col": rng.integers(-900, 900, (h8, w8)).astype(np.int16),
        }
        hints = tuple(int(x) for x in rng.integers(0, 30, 7))
        start, cur = 10, 12
        direction = 2 if trial % 2 else 0
        tpl = mfmv.TplMvs(h8, w8)
        mfmv._project_one(tpl, saved, hints, start, cur, direction, 7)
        oracle = _scalar_project((h8, w8), saved, hints, start, cur,
                                 direction, 7)
        got = {(r, c): (int(tpl.mfmv_row[r, c]), int(tpl.mfmv_col[r, c]),
                        int(tpl.ref_off[r, c]))
               for r, c in zip(*np.nonzero(tpl.valid))}
        assert got == oracle


@pytest.mark.slow
def test_mfmv_e2e_dav1d_bitexact(tmp_path):
    """IPPP with real motion: the temporal grid populates from frame 2
    on, streams decode bit-exactly, and turning MFMV off changes the
    coded bits (the candidates are live, not inert)."""
    w, h = 128, 96
    fmt = VideoFormat(w, h)
    frames = [synth_frame(fmt, t, "blobs") for t in range(5)]

    def encode(enable):
        seq = SequenceConfig(width=w, height=h)
        enc = Av1Encoder(seq, preset=9, enable_mfmv=enable)
        tus, recons = [], []
        grids = []
        for t, fs in enumerate(frames):
            st = enc.begin_frame([p.copy() for p in fs], 120,
                                 force_key=(t == 0))
            if isinstance(st, dict):
                if st["tw"].mi_state is not None:
                    tpl = st["tw"].mi_state.tpl
                    grids.append(0 if tpl is None
                                 else int(tpl.valid.sum()))
                tus.append(enc.resume_frame(st))
            else:
                tus.append(st)
            recons.append([p.copy() for p in enc.last_recon])
        return tus, recons, grids

    tus_on, recons, grids = encode(True)
    # frame 1 projects from the keyframe (intra -> empty); frames 2+ see
    # a populated grid on this moving content
    assert any(g > 0 for g in grids[1:]), grids
    path = tmp_path / "mfmv.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        for t, tu in enumerate(tus_on):
            wr.write_frame(tu, t)
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == len(frames)
    for t in range(len(frames)):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)

    tus_off, _, _ = encode(False)
    assert b"".join(tus_on) != b"".join(tus_off), \
        "MFMV candidates never influenced coding"
