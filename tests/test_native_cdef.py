"""C CDEF kernels vs the numpy reference, bit-exact on the integer paths."""

import ctypes

import numpy as np
import pytest

from svt_av1_psyex_tpu.native import cdefc
from svt_av1_psyex_tpu.ops.cdef import (
    CDEF_VERY_LARGE,
    adjust_strength,
    dist_8x8_luma,
    filter_blocks,
    find_dir_batch,
)

pytestmark = pytest.mark.skipif(not cdefc.available(),
                                reason="native toolchain unavailable")


def _pad(plane):
    h, w = plane.shape
    out = np.full((h + 4, w + 4), CDEF_VERY_LARGE, np.int32)
    out[2 : 2 + h, 2 : 2 + w] = plane
    return out


@pytest.mark.parametrize("cs", [0, 2])
def test_dirs_match(cs):
    rng = np.random.default_rng(5)
    nv8p, nh8p = 8, 16
    plane = rng.integers(0, 256 << cs, (nv8p * 8, nh8p * 8)).astype(np.int32)
    pad = _pad(plane)
    n = nv8p * nh8p
    dirs = np.empty(n, np.int32)
    var = np.empty(n, np.int32)
    lib = cdefc._lib()
    lib.svt_cdef_dirs(cdefc._p32(pad), pad.shape[1], nv8p, nh8p, cs,
                      cdefc._p32(dirs), cdefc._p32(var))
    blocks = plane.reshape(nv8p, 8, nh8p, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    d_ref, v_ref = find_dir_batch(blocks, cs)
    assert np.array_equal(dirs, d_ref)
    assert np.array_equal(var, v_ref)


def test_apply_matches_numpy_filter():
    rng = np.random.default_rng(6)
    nv8p, nh8p = 8, 8
    h = w = 64
    plane = rng.integers(0, 256, (h, w)).astype(np.int32)
    pad = _pad(plane)
    n = nv8p * nh8p
    dirs = rng.integers(0, 8, n).astype(np.int32)
    var = rng.integers(0, 4000, n).astype(np.int32)
    y_gi = rng.integers(0, 64, n).astype(np.int32)
    mask = np.ones(n, np.uint8)
    rec = plane.copy()
    lib = cdefc._lib()
    lib.svt_cdef_apply(
        cdefc._p32(pad), pad.shape[1], cdefc._p32(pad), cdefc._p32(pad),
        pad.shape[1], cdefc._p32(rec), rec.shape[1], h, w,
        cdefc._p32(rec), cdefc._p32(rec), rec.shape[1], 0, 0,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nv8p, nh8p,
        cdefc._p32(dirs), cdefc._p32(var), cdefc._p32(y_gi),
        cdefc._p32(np.zeros(n, np.int32)), 5, 4, 0, 0)
    # numpy reference over the filtered blocks
    by8, bx8 = np.divmod(np.arange(n), nh8p)
    m = y_gi != 0
    pri = (y_gi // 4).astype(np.int64)
    sec = y_gi % 4
    sec = sec + (sec == 3)
    t = adjust_strength(pri, var.astype(np.int64))
    d_eff = np.where(pri != 0, dirs, 0)
    out = filter_blocks(pad, by8[m] * 8 + 2, bx8[m] * 8 + 2, 8, 8,
                        t[m], sec[m], d_eff[m], 5, 5, 0)
    expect = plane.copy()
    rr = (by8[m] * 8)[:, None, None] + np.arange(8)[None, :, None]
    cc = (bx8[m] * 8)[:, None, None] + np.arange(8)[None, None, :]
    expect[rr, cc] = out
    assert np.array_equal(rec, expect)


def test_search_dist_matches():
    rng = np.random.default_rng(7)
    nv8p = nh8p = 8
    plane = rng.integers(0, 256, (64, 64)).astype(np.int32)
    src = rng.integers(0, 256, (64, 64)).astype(np.int32)
    pad = _pad(plane)
    n = nv8p * nh8p
    dirs = np.empty(n, np.int32)
    var = np.empty(n, np.int32)
    lib = cdefc._lib()
    lib.svt_cdef_dirs(cdefc._p32(pad), pad.shape[1], nv8p, nh8p, 0,
                      cdefc._p32(dirs), cdefc._p32(var))
    cands = np.asarray([0, 30, 62], np.int32)
    mask = np.ones(n, np.uint8)
    mse0 = np.zeros((1, 3), np.int64)
    mse1 = np.zeros((1, 3), np.int64)
    lib.svt_cdef_search(
        cdefc._p32(pad), pad.shape[1], cdefc._p32(pad), cdefc._p32(pad),
        pad.shape[1], cdefc._p32(src), src.shape[1], cdefc._p32(src),
        cdefc._p32(src), src.shape[1],
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nv8p, nh8p, 1, cdefc._p32(dirs), cdefc._p32(var),
        cdefc._p32(cands), 3, 5, 4, 0, 0,
        mse0.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        mse1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    # numpy reference for each candidate
    by8, bx8 = np.divmod(np.arange(n), nh8p)
    src_blocks = src.reshape(8, 8, 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    for ci, gi in enumerate(cands):
        pri = int(gi) // 4
        sec = int(gi) % 4
        sec += sec == 3
        t = adjust_strength(pri, var.astype(np.int64))
        d_eff = dirs if pri else np.zeros_like(dirs)
        out = filter_blocks(pad, by8 * 8 + 2, bx8 * 8 + 2, 8, 8,
                            t, sec, d_eff, 5, 5, 0)
        d = dist_8x8_luma(src_blocks, out, 0)
        assert int(d.sum()) == int(mse0[0, ci])
