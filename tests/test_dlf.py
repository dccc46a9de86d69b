"""Loop filter: kernel bit-exactness vs the reference C kernels + e2e."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.ops.dlf import (
    _apply_pass,
    filter_limits,
    pick_filter_level_by_q,
)

import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="no reference tree")


def _rand_patch(rng, h, w, smooth):
    if smooth:
        base = rng.randint(0, 256)
        p = base + rng.randint(-2, 3, (h, w))
        return np.clip(p, 0, 255).astype(np.uint8)
    return rng.randint(0, 256, (h, w), dtype=np.int64).astype(np.uint8)


@pytest.mark.parametrize("length", [4, 6, 8, 14])
@pytest.mark.parametrize("direction", [0, 1])
def test_lpf_kernels_bitexact(length, direction):
    rng = np.random.RandomState(length * 10 + direction)
    for trial in range(200):
        level = rng.randint(1, 64)
        sharpness = rng.randint(0, 8) if trial % 3 == 0 else 0
        lim, mblim, hev_t = filter_limits(level, sharpness)
        smooth = trial % 2 == 0
        patch = _rand_patch(rng, 16, 32, smooth)

        ref = oracle.lpf_edge(patch, direction, length, lim, mblim, hev_t)

        mine = patch.astype(np.int32)
        if direction == 0:
            ys = np.arange(4)
            xs = np.full(4, 16)
            _apply_pass(mine, ys, xs, np.full(4, length), lim, mblim, hev_t)
        else:
            PT = mine.T
            ys = np.arange(16, 20)
            xs = np.full(4, 8)
            _apply_pass(PT, ys, xs, np.full(4, length), lim, mblim, hev_t)
        assert np.array_equal(mine.astype(np.uint8), ref), (trial, level)


def test_pick_level_by_q_shape():
    lv = pick_filter_level_by_q(140, True, 8, 352 * 288)
    assert len(lv) == 4 and all(0 <= v <= 63 for v in lv)
    assert lv[2] == lv[3] <= lv[0]
    assert pick_filter_level_by_q(1, True, 8, 352 * 288)[0] == 0
