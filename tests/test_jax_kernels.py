"""JAX device kernels must match the numpy spec-exact references."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.codec.constants import TX_H, TX_W
from svt_av1_psyex_tpu.ops import jax_kernels as jk
from svt_av1_psyex_tpu.ops.txfm import forward_txfm2d, inverse_txfm2d

SIZES = [(4, 4), (8, 8), (16, 16), (32, 32), (64, 64), (4, 8), (16, 8), (8, 32), (16, 64)]


@pytest.mark.parametrize("size", SIZES, ids=[f"{w}x{h}" for w, h in SIZES])
def test_jnp_forward_matches_numpy(size):
    w, h = size
    rng = np.random.RandomState(0)
    res = rng.randint(-255, 256, size=(3, h, w)).astype(np.int32)
    for tx_type in (0, 9) if max(w, h) <= 32 else (0,):
        a = forward_txfm2d(res, w, h, tx_type)
        b = np.asarray(jk.forward_txfm2d_jnp(res, w, h, tx_type))
        assert np.array_equal(a, b), (size, tx_type)


@pytest.mark.parametrize("size", SIZES, ids=[f"{w}x{h}" for w, h in SIZES])
def test_jnp_inverse_matches_numpy(size):
    w, h = size
    rng = np.random.RandomState(1)
    cw, ch = min(w, 32), min(h, 32)
    co = rng.randint(-(1 << 14), 1 << 14, size=(3, ch, cw)).astype(np.int32)
    for tx_type in (0, 9) if max(w, h) <= 32 else (0,):
        a = inverse_txfm2d(co, w, h, tx_type)
        b = np.asarray(jk.inverse_txfm2d_jnp(co, w, h, tx_type))
        assert np.array_equal(a, b), (size, tx_type)


def test_frame_intra_analysis_shapes():
    rng = np.random.RandomState(2)
    luma = rng.randint(0, 256, size=(128, 192)).astype(np.int32)
    out = jk.frame_intra_analysis(luma, blk=64)
    assert out["sse"].shape == (5, 6)
    assert out["sad"].shape == (5, 6)
    assert out["var8x8"].shape == (6, 64)
    # DC sse must be 0 on a flat frame matching the edge default (128)
    flat = np.full((64, 64), 128, np.int32)
    out2 = jk.frame_intra_analysis(flat, blk=64)
    assert int(np.asarray(out2["sse"])[0, 0]) == 0
    assert int(np.asarray(out2["var8x8"]).max()) == 0
