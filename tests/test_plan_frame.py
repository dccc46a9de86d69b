"""plan_frame/extract_plan (vectorized partition DP) must reproduce the
recursive pick() tree exactly — fuzzed over random lattices, frame dims
(64-aligned and ragged), preset min sizes, and per-SB rdmult grids."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.codec.constants import BLOCK_W, BlockSize
from svt_av1_psyex_tpu.codec.md_device import DeviceIntraMD


class _Md:
    def __init__(self, min_bsize):
        self.min_bsize = min_bsize
        self.hbd_mds = 0


class _Seq:
    bit_depth = 8


def _mk(rng, w, h, min_bsize):
    dmd = object.__new__(DeviceIntraMD)
    dmd.md = _Md(min_bsize)
    dmd.seq = _Seq()
    dmd.mi_rows = h // 4
    dmd.mi_cols = w // 4
    dmd.DEPTHS = DeviceIntraMD.depths_for(min_bsize, dmd.mi_rows,
                                          dmd.mi_cols)
    dmd._hp = (h + 63) & ~63
    dmd._wp = (w + 63) & ~63
    dmd.modes = np.arange(10, dtype=np.int32)
    dmd.part_costs = {blk: rng.randint(10, 2000, 4).astype(np.int64)
                      for blk in (16, 32, 64)}
    dmd.stats = {}
    for blk in dmd.DEPTHS:
        nby, nbx = dmd._hp // blk, dmd._wp // blk
        dmd.stats[blk] = {
            "j": rng.randint(0, 1 << 24, (nby, nbx)).astype(np.float64),
            "mode": rng.randint(0, 10, (nby, nbx)).astype(np.int32)}
    return dmd


@pytest.mark.parametrize("w,h,min_bsize", [
    (128, 128, BlockSize.B8X8),
    (192, 128, BlockSize.B16X16),
    (176, 144, BlockSize.B16X16),    # ragged: 16-aligned only
    (176, 144, BlockSize.B32X32),    # DEPTHS extend below preset min
    (136, 72, BlockSize.B64X64),     # 8-aligned edges
])
def test_plan_matches_pick(w, h, min_bsize):
    rng = np.random.RandomState(hash((w, h, int(min_bsize))) & 0xFFFF)
    dmd = _mk(rng, w, h, min_bsize)
    nsby, nsbx = dmd._hp // 64, dmd._wp // 64
    rdg = rng.randint(50, 5000, (nsby, nsbx)).astype(np.int64)
    dmd.plan_frame(rdg)
    for r in range(0, dmd.mi_rows, 16):
        for c in range(0, dmd.mi_cols, 16):
            rdm = int(rdg[r // 16, c // 16])
            _, want = dmd.pick(r, c, BlockSize.B64X64, min_bsize, rdm)
            got = dmd.extract_plan(r, c, BlockSize.B64X64)
            assert got == want, (r, c)
