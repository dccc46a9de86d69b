"""Quantizer matrices: table layout, quantize arithmetic, dav1d e2e."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.bitstream.tables import scan_table  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.codec.gop import plan_key, plan_minigop  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.ops.quant import (  # noqa: E402
    build_plane_quant,
    get_qmlevel,
    qm_tables,
    quantize_b,
    quantize_b_qm,
)
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402


def test_qm_table_layout():
    # 4x4 luma level-0 starts with the spec's first weights
    wt, iwt = qm_tables(0, False, 0)
    assert wt[0] == 32 and len(wt) == 16
    # 64-class sizes reuse the 32-class matrices (adjusted tx size)
    wt64, _ = qm_tables(4, False, 4)
    wt32, _ = qm_tables(4, False, 3)
    assert np.array_equal(wt64, wt32)
    # identity level -> no matrices
    assert qm_tables(15, False, 0) is None
    assert get_qmlevel(0, 8, 15) == 8
    assert get_qmlevel(255, 8, 15) == 15


def test_quantize_qm_identity_weights_match_plain():
    """wt = iwt = 32 reduces quantize_b_qm to quantize_b exactly."""
    rng = np.random.default_rng(0)
    pq = build_plane_quant(120, 0, 0, 8)
    scan = scan_table(1, "default")
    coeffs = rng.integers(-3000, 3000, (4, 64)).astype(np.int32)
    unit = np.full(64, 32, np.int64)
    a = quantize_b(coeffs, scan, pq, 0)
    b = quantize_b_qm(coeffs, scan, pq, 0, unit, unit)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def _roundtrip(enc, frames, plans, q, tmp_path, name):
    path = tmp_path / f"{name}.ivf"
    recons = {}
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, enc.seq.width, enc.seq.height)
        n = 0
        for pl in plans:
            src = frames[pl.disp_idx] if pl.show_existing_slot is None else None
            tu = enc.encode_frame(src, q, plan=pl)
            wr.write_frame(tu, n)
            n += 1
            if pl.show_frame or pl.show_existing_slot is not None:
                recons[pl.disp_idx] = [p.copy() for p in enc.last_recon]
        wr.close()
    dec = decode_ivf(path)
    for t in sorted(recons):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)


def test_qm_inter_gop_bitexact(tmp_path):
    w, h = 96, 64
    fmt = VideoFormat(w, h)
    frames = [synth_frame(fmt, t, "blobs") for t in range(5)]
    enc = Av1Encoder(SequenceConfig(width=w, height=h), preset=8,
                     qm=(8, 12, 8, 12))
    _roundtrip(enc, frames, [plan_key(0)] + plan_minigop(0, 1, 4,
                                                         future_slot=1),
               120, tmp_path, "qm")


def test_qm_preset6_full_toolset(tmp_path):
    """QM with TX_MODE_SELECT, ADST chroma, CfL/filter-intra, LR."""
    w, h = 96, 64
    fmt = VideoFormat(w, h)
    frames = [synth_frame(fmt, 0, "blobs")]
    enc = Av1Encoder(SequenceConfig(width=w, height=h), preset=6,
                     qm=(4, 10, 6, 12))
    _roundtrip(enc, frames, [plan_key(0)], 100, tmp_path, "qm6")


def test_qm_10bit(tmp_path):
    w, h = 96, 64
    fmt = VideoFormat(w, h, bit_depth=10)
    frames = [synth_frame(fmt, 0, "blobs")]
    enc = Av1Encoder(SequenceConfig(width=w, height=h, bit_depth=10),
                     preset=8, qm=(8, 15, 8, 15))
    _roundtrip(enc, frames, [plan_key(0)], 140, tmp_path, "qm10")
