"""RDOQ trellis tests: invariants, RD improvement, e2e dav1d conformance.

Counterpart behavior: svt_av1_optimize_b (reference full_loop.c:1127) with
rdoq_level 1 (fp quantization + full trellis, enc_mode_config.c:7481).
"""

import numpy as np
import pytest

from svt_av1_psyex_tpu.bitstream.coeff_writer import _scan_i32
from svt_av1_psyex_tpu.bitstream.tables import FrameCdfs
from svt_av1_psyex_tpu.codec.rd import compute_rdmult
from svt_av1_psyex_tpu.codec.rdoq import RdoqFrame
from svt_av1_psyex_tpu.ops.quant import build_plane_quant, quantize_fp

pytestmark = []


def _rdoq_frame(q=100):
    # the round-4 lambda rescale made compute_rdmult return the /16
    # raw-SSE value; RDOQ's coefficient-domain trellis pairs with the
    # UNDIVIDED libaom rdmult (see encoder.py RdoqFrame construction)
    rf = RdoqFrame(FrameCdfs(q), q, compute_rdmult(q) * 16)
    if rf.lib() is None:
        pytest.skip("native toolchain unavailable")
    return rf


def test_quantize_fp_matches_reference_shape():
    """fp quant: no zbin, round = dequant/2; levels >= quantize_b's
    (the fp dead zone is narrower, leaving work for the trellis)."""
    from svt_av1_psyex_tpu.ops.quant import quantize_b

    rng = np.random.default_rng(3)
    pq = build_plane_quant(120)
    scan = _scan_i32(1, "default").astype(np.int64)  # 8x8
    coeffs = rng.normal(0, 800, (8, 64)).astype(np.int32)
    qf, df, ef = quantize_fp(coeffs, scan, pq, 0)
    qb, db, eb = quantize_b(coeffs, scan, pq, 0)
    assert np.all(np.abs(qf) >= np.abs(qb))
    # dequant relation holds everywhere
    deq = np.where(np.arange(64) == 0, pq.dequant[0], pq.dequant[1])
    assert np.array_equal(df, np.sign(qf) * ((np.abs(qf) * deq) >> 0))


@pytest.mark.parametrize("tx_size,kind", [(0, "default"), (1, "default"),
                                          (2, "default"), (6, "default"),
                                          (10, "default")])
def test_trellis_invariants(tx_size, kind):
    """Levels only move down, eob never grows, post-eob positions are
    zero, dqcoeff stays consistent with the dequant formula."""
    from svt_av1_psyex_tpu.codec.constants import TX_H, TX_W

    rf = _rdoq_frame()
    rng = np.random.default_rng(tx_size)
    pq = build_plane_quant(100)
    cw = min(int(TX_W[tx_size]), 32)
    ch = min(int(TX_H[tx_size]), 32)
    scan = _scan_i32(tx_size, kind)
    for amp in (300, 1200, 6000):
        for _ in range(25):
            coeffs = rng.normal(0, amp, cw * ch).astype(np.int32)[None]
            q, dq, eob = quantize_fp(coeffs, scan.astype(np.int64), pq, 0)
            e0 = int(eob[0])
            if e0 == 0:
                continue
            qc = np.ascontiguousarray(q.reshape(-1))
            dqc = np.ascontiguousarray(dq.reshape(-1))
            tco = np.ascontiguousarray(coeffs.reshape(-1))
            ne = rf.optimize(tco, qc, dqc, e0, scan, tx_size, 0, cw, ch,
                             False, 0, 0, pq.dequant[0], pq.dequant[1])
            assert ne <= e0
            assert np.all(np.abs(qc) <= np.abs(q.reshape(-1)))
            assert np.all(np.abs(q.reshape(-1)) - np.abs(qc) <= 1) or ne < e0
            if ne:
                assert qc[scan[ne - 1]] != 0
            assert np.all(qc[scan[ne:]] == 0)
            deq = np.where(np.arange(cw * ch) == 0, pq.dequant[0],
                           pq.dequant[1])
            assert np.array_equal(
                dqc, (np.sign(qc) * ((np.abs(qc).astype(np.int64) * deq)
                                     >> 0)).astype(np.int32))


def test_trellis_prunes():
    """The trellis can only lower levels (rate never rises under the
    monotone coeff cost model) and must actually prune on noisy input."""
    rf = _rdoq_frame(120)
    rng = np.random.default_rng(11)
    pq = build_plane_quant(120)
    scan = _scan_i32(1, "default")  # 8x8

    wins = same = losses = 0
    for _ in range(60):
        coeffs = rng.normal(0, 900, 64).astype(np.int32)[None]
        q, dq, eob = quantize_fp(coeffs, scan.astype(np.int64), pq, 0)
        e0 = int(eob[0])
        if e0 == 0:
            continue
        qc = np.ascontiguousarray(q.reshape(-1))
        dqc = np.ascontiguousarray(dq.reshape(-1))
        tco = np.ascontiguousarray(coeffs.reshape(-1))
        before = np.abs(qc).sum()
        ne = rf.optimize(tco, qc, dqc, e0, scan, 1, 0, 8, 8, False, 0, 0,
                         pq.dequant[0], pq.dequant[1], qindex=120)
        after = np.abs(qc).sum()
        if after < before:
            wins += 1
        elif after == before:
            same += 1
        else:
            losses += 1
    assert losses == 0
    assert wins > 0  # the trellis must actually prune something


def test_rdoq_e2e_dav1d_and_rate(tmp_path, monkeypatch):
    """Host-path encode with RDOQ on: stream is dav1d bit-exact and at
    mid q costs measurably fewer bits than with RDOQ off."""
    from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
    from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
    from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
    from svt_av1_psyex_tpu.utils.ivf import IvfWriter

    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    # structured content + mild noise: the regime where the trellis
    # prunes (pure noise at mid q can legitimately grow — the fp dead
    # zone is narrower and the kept coefficients are RD-positive)
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:128, 0:192]
    y = (128 + 80 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
         + rng.integers(-8, 9, (128, 192)))
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.clip(128 + 20 * np.sin(yy[::2, ::2] / 7.0)
                + rng.integers(-4, 5, (64, 96)), 0, 255).astype(np.uint8)
    v = np.clip(128 + 20 * np.cos(xx[::2, ::2] / 11.0)
                + rng.integers(-4, 5, (64, 96)), 0, 255).astype(np.uint8)

    sizes = {}
    for rdoq in (0, 1):
        seq = SequenceConfig(width=192, height=128)
        enc = Av1Encoder(seq, preset=10, rdoq=rdoq)
        tu = enc.encode_frame([y.copy(), u.copy(), v.copy()], 120)
        sizes[rdoq] = len(tu)
        if rdoq:
            ivf = tmp_path / "rdoq.ivf"
            with open(ivf, "wb") as fh:
                wr = IvfWriter(fh, 192, 128)
                wr.write_frame(tu, 0)
                wr.close()
            dec = decode_ivf(ivf)
            rec = enc.last_recon
            for p_dec, p_ref in zip(dec[0], rec):
                dh, dw = p_dec.shape
                assert np.array_equal(p_dec, p_ref[:dh, :dw])
    assert sizes[1] < sizes[0]  # noisy content at mid q: trellis prunes


def test_rdoq_device_commit_dav1d(tmp_path):
    """DEVICE MD path (native whole-frame commit): RDOQ engages in the C
    commit kernel (ecenc.c svt_txb_commit fp+trellis branch), stream
    stays dav1d bit-exact and shrinks on key + inter frames."""
    from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
    from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
    from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
    from svt_av1_psyex_tpu.utils.ivf import IvfWriter

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:64, 0:128]

    def clip(t):
        y = (128 + 70 * np.sin((xx + 3 * t) / 8.0) * np.cos(yy / 11.0)
             + rng.integers(-8, 9, (64, 128)))
        return [np.clip(y, 0, 255).astype(np.uint8),
                np.full((32, 64), 128, np.uint8),
                np.full((32, 64), 128, np.uint8)]

    f0, f1 = clip(0), clip(1)
    sizes = {}
    recons = {}
    for rdoq in (0, 1):
        seq = SequenceConfig(width=128, height=64)
        enc = Av1Encoder(seq, preset=10, rdoq=rdoq)
        tus = [enc.encode_frame(f0, 120), enc.encode_frame(f1, 124)]
        sizes[rdoq] = sum(len(t) for t in tus)
        recons[rdoq] = [p.copy() for p in enc.slots[0]["recon"]]
        if rdoq:
            ivf = tmp_path / "dev_rdoq.ivf"
            with open(ivf, "wb") as fh:
                wr = IvfWriter(fh, 128, 64)
                for t, tu in enumerate(tus):
                    wr.write_frame(tu, t)
                wr.close()
            dec = decode_ivf(ivf)
            assert len(dec) == 2
            for p_dec, p_ref in zip(dec[1], recons[1]):
                dh, dw = p_dec.shape
                assert np.array_equal(p_dec, p_ref[:dh, :dw])
    assert sizes[1] < sizes[0]
