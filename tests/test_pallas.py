"""Pallas fused full-loop kernel vs the jnp analysis chain.

On CPU the kernel runs in Pallas interpret mode (same program the TPU
compiles through Mosaic).  The analysis tier is float — kernel and jnp
chain may differ by one quantization level at exact RD ties — so the
contract is near-equality of the metrics plus agreement of the actual
mode decisions, not bit-exactness (the conformant commit pass
requantizes exactly either way; see device/intra.py docstring)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.quick

jnp = pytest.importorskip("jax.numpy")


def _qp_row(qindex=80, bit_depth=8):
    from svt_av1_psyex_tpu.device.intra import qp_row_for

    return qp_row_for(qindex, 0, 0, bit_depth)


def _jnp_chain(resid, qp_row, n, bit_depth=8):
    from svt_av1_psyex_tpu.device import intra as di

    ls = 2 if n == 64 else (1 if n == 32 else 0)
    coeffs = di._fwd_dct2d(jnp.asarray(resid), n)
    qabs, dq = di._quantize_analysis(
        coeffs, qp_row[4], qp_row[9], di._rp2(qp_row[1], ls),
        di._rp2(qp_row[6], ls), di._rp2(qp_row[0], ls),
        di._rp2(qp_row[5], ls), ls)
    dist, rate, eob, inv = di._rate_dist(qabs, dq, jnp.asarray(resid), n,
                                         bit_depth)
    return (np.asarray(dist), np.asarray(rate), np.asarray(eob),
            np.asarray(inv))


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_fullloop_matches_jnp_chain(n):
    from svt_av1_psyex_tpu.ops.pallas.fullloop import fullloop

    rng = np.random.RandomState(7 + n)
    b = 150  # not a multiple of the tile size: exercises padding
    # realistic residual amplitudes (intra prediction errors)
    resid = (rng.randint(-64, 65, (b, n, n))
             + rng.randint(-2, 3, (b, n, n)) * 40).astype(np.int32)
    resid[0] = 0                      # all-skip block: eob must be 0
    qp_row = _qp_row()
    ls = 1 if n == 32 else 0

    from svt_av1_psyex_tpu.device.intra import _rp2

    qp6 = jnp.asarray([qp_row[4], qp_row[9], _rp2(qp_row[1], ls),
                       _rp2(qp_row[6], ls), _rp2(qp_row[0], ls),
                       _rp2(qp_row[5], ls)], jnp.float32)
    metrics, inv = fullloop(jnp.asarray(resid), qp6, n, ls, want_inv=True)
    metrics = np.asarray(metrics)
    d_ref, r_ref, e_ref, inv_ref = _jnp_chain(resid, qp_row, n)

    sse_ref = (resid.astype(np.float64) ** 2).sum(axis=(1, 2))
    assert np.allclose(metrics[:, 3], sse_ref, rtol=1e-5)
    # distortion: float-order differences only
    assert np.allclose(metrics[:, 0], d_ref, rtol=1e-3, atol=2.0)
    # eob/rate: identical except where a coefficient sits exactly on a
    # quantization boundary (kron vs separable matmul rounding)
    eob_eq = np.mean(metrics[:, 2] == e_ref)
    assert eob_eq > 0.98, eob_eq
    rdiff = np.abs(metrics[:, 1] - r_ref) / np.maximum(r_ref, 512)
    assert np.mean(rdiff < 0.02) > 0.98
    assert metrics[0, 2] == 0
    assert np.allclose(np.asarray(inv)[1:], inv_ref[1:], rtol=1e-2,
                       atol=2.0)


def test_sad_lattice_bit_exact():
    """Integer SADs: the Pallas offset sweep must equal the jnp scan
    exactly."""
    import jax

    from svt_av1_psyex_tpu.device.me import R2, _offset_table
    from svt_av1_psyex_tpu.ops.pallas.sad import sad_lattice

    rng = np.random.RandomState(11)
    nsb = 2
    tiles = rng.randint(0, 256, (nsb, 64, 64)).astype(np.int32)
    wins = rng.randint(0, 256, (nsb, 64 + 2 * R2, 64 + 2 * R2)).astype(
        np.int32)

    got = np.asarray(sad_lattice(jnp.asarray(tiles), jnp.asarray(wins)))

    def body2(_, off):
        cand = jax.lax.dynamic_slice(jnp.asarray(wins),
                                     (0, off[0], off[1]), (nsb, 64, 64))
        d = jnp.abs(jnp.asarray(tiles) - cand)
        return None, d.reshape(-1, 8, 8, 8, 8).sum(axis=(2, 4))

    _, lat = jax.lax.scan(body2, None, _offset_table(R2))
    want = np.asarray(lat.transpose(1, 0, 2, 3))
    assert np.array_equal(got, want)


def test_fullloop_decisions_match_jnp(monkeypatch):
    """End to end through the intra lattice: the Pallas path must pick
    the same modes/partitions as the jnp path on a real frame."""
    import jax

    from svt_av1_psyex_tpu.device import intra as di

    rng = np.random.RandomState(3)
    luma = np.add.outer(np.linspace(30, 220, 128),
                        np.linspace(0, 90, 128)).astype(np.int32)
    luma = np.clip(luma + rng.randint(-12, 13, luma.shape), 0, 255)
    qp_row = _qp_row()
    rd_row = np.array([120, 100, 60] + [300] * di.N_MODES, np.int32)

    def run():
        jax.clear_caches()
        packed = di.intra_analysis_batch(
            jnp.asarray(luma[None]), jnp.asarray(qp_row[None]),
            jnp.asarray(rd_row[None], jnp.int32), depths=(32, 16, 8))
        return di.unpack_rd_analysis(np.asarray(packed[0]), 128, 128,
                                     (32, 16, 8))

    monkeypatch.setenv("SVT_TPU_PALLAS", "1")
    got = run()
    monkeypatch.setenv("SVT_TPU_PALLAS", "0")
    want = run()
    for blk in (32, 16, 8):
        same = np.mean(got[blk]["mode"] == want[blk]["mode"])
        assert same >= 0.98, (blk, same)
        assert np.allclose(got[blk]["j"], want[blk]["j"], rtol=5e-3,
                           atol=50)
