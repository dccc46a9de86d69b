"""C txb-commit kernel vs the numpy reference chain, bit-exact.

Same harness pattern as the reference's kernel equivalence tests
(test/FwdTxfm2dAsmTest.cc etc.): random inputs, scalar reference vs the
native kernel, exact equality on qcoeff/eob/recon.
"""

import numpy as np
import pytest

from svt_av1_psyex_tpu.bitstream.tables import scan_table
from svt_av1_psyex_tpu.codec.constants import TX_H, TX_W, TxType
from svt_av1_psyex_tpu.native import commit as native_commit
from svt_av1_psyex_tpu.ops.quant import build_plane_quant, quantize_b
from svt_av1_psyex_tpu.ops.txfm import forward_txfm2d, inverse_txfm2d

pytestmark = pytest.mark.skipif(not native_commit.available(),
                                reason="native toolchain unavailable")

# square + rect DCT sizes used by the commit pass
TX_SIZES = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]


def _ref_commit(src, recon, pred, x, y, tx_size, qindex, dc_d, ac_d, bd):
    w, h = int(TX_W[tx_size]), int(TX_H[tx_size])
    cw, ch = min(w, 32), min(h, 32)
    resid = (src[y : y + h, x : x + w] - pred).astype(np.int32)
    coeffs = forward_txfm2d(resid[None], w, h, TxType.DCT_DCT, bd)[0]
    ls = 2 if max(w, h) == 64 else (1 if max(w, h) == 32 else 0)
    pq = build_plane_quant(qindex, dc_d, ac_d, bd)
    scan = scan_table(tx_size, "default")
    qc, dqc, eob = quantize_b(coeffs.reshape(1, -1), scan, pq, ls)
    eob = int(eob[0])
    if eob:
        rr = inverse_txfm2d(dqc.reshape(1, ch, cw), w, h, TxType.DCT_DCT, bd)[0]
        rec = np.clip(pred + rr, 0, (1 << bd) - 1)
    else:
        rec = np.clip(pred, 0, (1 << bd) - 1)
    recon[y : y + h, x : x + w] = rec
    return qc.reshape(ch, cw), eob


@pytest.mark.parametrize("tx_size", TX_SIZES)
@pytest.mark.parametrize("bd", [8, 10])
def test_txb_commit_matches_numpy(tx_size, bd):
    rng = np.random.default_rng(1234 + tx_size + bd)
    w, h = int(TX_W[tx_size]), int(TX_H[tx_size])
    maxv = (1 << bd) - 1
    for qindex, dc_d, ac_d in ((140, 0, 0), (40, -2, 1), (230, 0, 0)):
        src = rng.integers(0, maxv + 1, (h + 8, w + 8)).astype(np.int32)
        pred = rng.integers(0, maxv + 1, (h, w)).astype(np.int32)
        rec_c = np.zeros_like(src)
        rec_ref = np.zeros_like(src)
        qc_c, eob_c = native_commit.txb_commit(
            src, rec_c, pred, 4, 4, tx_size, qindex, dc_d, ac_d, bd)
        qc_r, eob_r = _ref_commit(src, rec_ref, pred, 4, 4, tx_size,
                                  qindex, dc_d, ac_d, bd)
        assert eob_c == eob_r
        assert np.array_equal(qc_c, qc_r)
        assert np.array_equal(rec_c, rec_ref)


def test_txb_commit_flat_block_skips():
    src = np.full((64, 64), 300, np.int32)
    pred = np.full((32, 32), 300, np.int32)
    rec = np.zeros_like(src)
    qc, eob = native_commit.txb_commit(src, rec, pred, 0, 0, 3, 140, 0, 0, 10)
    assert eob == 0
    assert np.all(qc == 0)
    assert np.all(rec[:32, :32] == 300)
