"""Transform equivalence: our batched networks vs the reference C kernels.

Bit-exact across all tx sizes x applicable tx types, random inputs at
coefficient-range extremes (the reference's FwdTxfm2dAsmTest/
InvTxfm2dAsmTest pattern).
"""

import numpy as np
import pytest

import oracle
from svt_av1_psyex_tpu.codec.constants import TX_H, TX_W, TxType
from svt_av1_psyex_tpu.ops.txfm import forward_txfm2d, inverse_txfm2d_add

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference tree absent")

SIZES = [(int(TX_W[t]), int(TX_H[t])) for t in range(19)]


def _legal_types(w, h):
    out = []
    for t in range(16):
        col, row = {  # (vertical, horizontal) 1D kinds
            0: ("dct", "dct"), 1: ("adst", "dct"), 2: ("dct", "adst"),
            3: ("adst", "adst"), 4: ("adst", "dct"), 5: ("dct", "adst"),
            6: ("adst", "adst"), 7: ("adst", "adst"), 8: ("adst", "adst"),
            9: ("identity", "identity"), 10: ("dct", "identity"),
            11: ("identity", "dct"), 12: ("adst", "identity"),
            13: ("identity", "adst"), 14: ("adst", "identity"),
            15: ("identity", "adst"),
        }[t]
        if col == "adst" and h > 16:
            continue
        if row == "adst" and w > 16:
            continue
        if col == "identity" and h > 32:
            continue
        if row == "identity" and w > 32:
            continue
        out.append(t)
    return out


@pytest.mark.parametrize("size", SIZES, ids=[f"{w}x{h}" for w, h in SIZES])
def test_inverse_matches_reference(size):
    w, h = size
    rng = np.random.RandomState(w * 100 + h)
    cw, ch = min(w, 32), min(h, 32)
    for tx_type in _legal_types(w, h):
        coeffs = rng.randint(-(1 << 15), 1 << 15, size=(2, ch, cw)).astype(np.int32)
        pred = rng.randint(0, 256, size=(2, h, w)).astype(np.uint16)
        mine = inverse_txfm2d_add(coeffs, pred, w, h, tx_type, 8)
        for b in range(2):
            ref = oracle.inv_txfm2d_add(coeffs[b], pred[b], w, h, tx_type, 8)
            assert np.array_equal(mine[b], ref), f"tx {w}x{h} type {tx_type} batch {b}"


@pytest.mark.parametrize("size", SIZES, ids=[f"{w}x{h}" for w, h in SIZES])
def test_forward_matches_reference(size):
    w, h = size
    rng = np.random.RandomState(w * 7 + h)
    for tx_type in _legal_types(w, h):
        res = rng.randint(-255, 256, size=(2, h, w)).astype(np.int32)
        mine = forward_txfm2d(res, w, h, tx_type, 8)
        for b in range(2):
            ref_full = oracle.fwd_txfm2d(res[b], w, h, tx_type, 8).reshape(h, w)
            ref = ref_full[: min(h, 32), : min(w, 32)]
            assert np.array_equal(mine[b], ref), f"tx {w}x{h} type {tx_type} batch {b}"


def test_roundtrip_energy():
    """fwd -> inv roundtrip reproduces the residual closely (scale sanity)."""
    rng = np.random.RandomState(0)
    for w, h in [(4, 4), (8, 8), (16, 16), (8, 4), (16, 8)]:
        res = rng.randint(-100, 101, size=(1, h, w)).astype(np.int32)
        coeffs = forward_txfm2d(res, w, h, TxType.DCT_DCT, 8)
        pred = np.full((1, h, w), 128, np.uint16)
        recon = inverse_txfm2d_add(coeffs, pred, w, h, TxType.DCT_DCT, 8)
        err = recon.astype(int) - 128 - res
        assert np.abs(err).max() <= 2, (w, h, np.abs(err).max())
