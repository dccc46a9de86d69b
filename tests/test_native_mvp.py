"""Fuzz the C MVP stack (native/mvp.c) against the Python oracle.

The MVP derivation (spec 7.10.2) is the single most desync-prone piece
of inter syntax; the two implementations must agree exactly on every
field for random mi states, block sizes, and positions — single and
compound references, with and without sign-bias flips.
"""

import numpy as np
import pytest

from svt_av1_psyex_tpu.codec import mvp as mvp_mod
from svt_av1_psyex_tpu.codec.constants import BLOCK_H, BLOCK_W, BlockSize
from svt_av1_psyex_tpu.codec.mvp import MiState, _find_mv_stack_py

BSIZES = [BlockSize.B8X8, BlockSize.B16X16, BlockSize.B32X32,
          BlockSize.B64X64, BlockSize.B16X8, BlockSize.B8X16,
          BlockSize.B32X16, BlockSize.B16X32, BlockSize.B8X32,
          BlockSize.B32X8, BlockSize.B16X64, BlockSize.B64X16]


def _random_mi(rng, mi_rows, mi_cols, n_refs=3, p_intra=0.3):
    """Random but structurally-consistent mi grid: tiles of random bsizes
    with uniform fields (what real encodes produce)."""
    mi = MiState(mi_rows, mi_cols)
    mi.sign_bias[:] = rng.integers(0, 2, 8).astype(bool)
    r = 0
    while r < mi_rows:
        c = 0
        bh4 = 0
        while c < mi_cols:
            bs = BSIZES[rng.integers(0, len(BSIZES))]
            bw4 = int(BLOCK_W[bs]) >> 2
            bh4 = int(BLOCK_H[bs]) >> 2
            if rng.random() < p_intra:
                ref, ref1 = -1, -1
            else:
                ref = int(rng.integers(1, 1 + n_refs))
                ref1 = int(rng.integers(5, 8)) if rng.random() < 0.3 else -1
            mv = (int(rng.integers(-64, 65)) * 2,
                  int(rng.integers(-64, 65)) * 2)
            mv1 = (int(rng.integers(-64, 65)) * 2,
                   int(rng.integers(-64, 65)) * 2)
            mi.set_block(r, c, bs, ref, mv, bool(rng.integers(0, 2)),
                         ref1, mv1, is_gmv=bool(rng.integers(0, 4) == 0))
            c += bw4
        r += max(bh4, 1)
    return mi


@pytest.mark.skipif(not mvp_mod._mvp_lib(), reason="native lib unavailable")
@pytest.mark.parametrize("seed", range(6))
def test_mvp_c_matches_python(seed):
    rng = np.random.default_rng(seed)
    mi = _random_mi(rng, 24, 32)
    for _ in range(120):
        bs = BSIZES[rng.integers(0, len(BSIZES))]
        bw4 = int(BLOCK_W[bs]) >> 2
        bh4 = int(BLOCK_H[bs]) >> 2
        r = int(rng.integers(0, max(1, 24 - bh4)))
        c = int(rng.integers(0, max(1, 32 - bw4)))
        if rng.random() < 0.3:
            ref = (int(rng.integers(1, 5)), int(rng.integers(5, 8)))
        else:
            ref = int(rng.integers(1, 8))
        gm = None
        if rng.random() < 0.5:  # translation-gm padding candidates
            gm = ((int(rng.integers(-32, 33)) * 2,
                   int(rng.integers(-32, 33)) * 2),
                  (int(rng.integers(-32, 33)) * 2,
                   int(rng.integers(-32, 33)) * 2))
        warp = bool(rng.integers(0, 2)) and gm is not None
        a = mvp_mod.find_mv_stack(mi, r, c, bs, ref, gm_mv=gm, gm_warp=warp)
        b = _find_mv_stack_py(mi, r, c, bs, ref,
                              gm if gm is not None else ((0, 0), (0, 0)),
                              gm_warp=warp)
        ctx = f"seed={seed} r={r} c={c} bs={bs} ref={ref}"
        assert a.count == b.count, ctx
        assert a.mode_context == b.mode_context, ctx
        assert a.mvs == b.mvs, ctx
        assert a.comp_mvs == b.comp_mvs, ctx
        assert a.weights == b.weights, ctx


@pytest.mark.skipif(not mvp_mod._mvp_lib(), reason="native lib unavailable")
@pytest.mark.parametrize("seed", range(4))
def test_mvp_c_matches_python_with_mfmv(seed):
    """Same fuzz with a random projected temporal grid attached: the C
    add_tpl_ref_mv/tpl_scan must match the Python MFMV path exactly."""
    from svt_av1_psyex_tpu.codec.mfmv import TplMvs

    rng = np.random.default_rng(1000 + seed)
    mi = _random_mi(rng, 24, 32)
    tpl = TplMvs(12, 16)
    tpl.valid[:] = rng.random((12, 16)) < 0.6
    tpl.mfmv_row[:] = rng.integers(-700, 700, (12, 16)).astype(np.int16)
    tpl.mfmv_col[:] = rng.integers(-700, 700, (12, 16)).astype(np.int16)
    tpl.ref_off[:] = rng.integers(1, 12, (12, 16)).astype(np.int16)
    mi.tpl = tpl
    mi.tpl_cur_off = rng.integers(-8, 9, 8).astype(np.int32)
    for _ in range(120):
        bs = BSIZES[rng.integers(0, len(BSIZES))]
        bw4 = int(BLOCK_W[bs]) >> 2
        bh4 = int(BLOCK_H[bs]) >> 2
        r = int(rng.integers(0, max(1, 24 - bh4)))
        c = int(rng.integers(0, max(1, 32 - bw4)))
        if rng.random() < 0.4:
            ref = (int(rng.integers(1, 5)), int(rng.integers(5, 8)))
        else:
            ref = int(rng.integers(1, 8))
        gm = ((int(rng.integers(-32, 33)) * 2,
               int(rng.integers(-32, 33)) * 2),
              (int(rng.integers(-32, 33)) * 2,
               int(rng.integers(-32, 33)) * 2))
        a = mvp_mod.find_mv_stack(mi, r, c, bs, ref, gm_mv=gm)
        b = _find_mv_stack_py(mi, r, c, bs, ref, gm)
        ctx = f"seed={seed} r={r} c={c} bs={bs} ref={ref}"
        assert a.count == b.count, ctx
        assert a.mode_context == b.mode_context, ctx
        assert a.mvs == b.mvs, ctx
        assert a.comp_mvs == b.comp_mvs, ctx
        assert a.weights == b.weights, ctx
