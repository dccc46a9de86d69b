"""Device hierarchical ME: shift recovery + SAD agreement with numpy."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.device.me import (
    GEOMETRIES,
    FrameMotionField,
    run_device_me,
)


def _shifted_pair(h, w, dy, dx, seed=0):
    """ref and a src that equals ref translated by (dy, dx) (src[y] =
    ref[y + dy]) so the true MV of every block is (dy, dx)."""
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 255, (h + 256, w + 256), np.int32)
    # smooth a little so SAD has a clean basin
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, (1, 1), (0, 1))) // 4
    ref = big[128 : 128 + h, 128 : 128 + w]
    src = big[128 + dy : 128 + dy + h, 128 + dx : 128 + dx + w]
    return src.copy(), ref.copy()


@pytest.mark.parametrize("dy,dx", [(0, 0), (3, -5), (-7, 2)])
def test_recovers_small_shift(dy, dx):
    src, ref = _shifted_pair(128, 192, dy, dx)
    field = run_device_me(src, {1: ref})
    for geom in ((64, 64), (16, 16), (8, 8)):
        mv = field.maps[1][geom]["mv"]
        # interior blocks (edge blocks see replicated-padding bias)
        inner = mv[1:-1, 1:-1] if mv.shape[0] > 2 else mv
        assert np.all(inner[..., 0] == dy), geom
        assert np.all(inner[..., 1] == dx), geom


def test_recovers_large_shift_via_hme():
    # 80 px shift: far beyond the +-8 L2 window, needs the HME pyramid.
    # Content with genuine low-frequency structure (bilinear-upsampled
    # coarse noise) — decimated levels carry no signal on white noise.
    rng = np.random.default_rng(3)
    h, w, dy, dx = 192, 256, 48, -80
    coarse = rng.integers(0, 255, ((h + 256) // 32 + 2,
                                   (w + 256) // 32 + 2)).astype(np.float64)
    yy = np.arange(h + 256) / 32.0
    xx = np.arange(w + 256) / 32.0
    y0, x0 = yy.astype(int), xx.astype(int)
    fy, fx = (yy - y0)[:, None], (xx - x0)[None, :]
    big = ((coarse[y0][:, x0] * (1 - fy) * (1 - fx)
            + coarse[y0 + 1][:, x0] * fy * (1 - fx)
            + coarse[y0][:, x0 + 1] * (1 - fy) * fx
            + coarse[y0 + 1][:, x0 + 1] * fy * fx)).astype(np.int32)
    ref = big[128 : 128 + h, 128 : 128 + w].copy()
    src = big[128 + dy : 128 + dy + h, 128 + dx : 128 + dx + w].copy()
    field = run_device_me(src, {1: ref})
    mv = field.maps[1][(64, 64)]["mv"]
    sad = field.maps[1][(64, 64)]["sad"]
    # only blocks whose true match lies fully inside ref can recover it:
    # SB (i, j) covers rows 64i..64i+63, needs 0 <= 64i+dy, 64i+63+dy < h
    for i in range(3):
        for j in range(4):
            if (0 <= 64 * i + dy and 64 * i + 63 + dy < 192
                    and 0 <= 64 * j + dx and 64 * j + 63 + dx < 256):
                assert tuple(mv[i, j]) == (dy, dx), (i, j, mv[i, j])
                assert sad[i, j] == 0


def test_sad_matches_numpy():
    rng = np.random.default_rng(7)
    src = rng.integers(0, 255, (128, 128), np.int32)
    ref = rng.integers(0, 255, (128, 128), np.int32)
    field = run_device_me(src, {1: ref})
    for (gh, gw) in GEOMETRIES:
        m = field.maps[1][(gh, gw)]
        for gy in range(128 // gh):
            for gx in range(128 // gw):
                mvy, mvx = m["mv"][gy, gx]
                y0, x0 = gy * gh, gx * gw
                rows = np.clip(np.arange(y0 + mvy, y0 + mvy + gh), 0, 127)
                cols = np.clip(np.arange(x0 + mvx, x0 + mvx + gw), 0, 127)
                patch = ref[rows[:, None], cols[None, :]]
                sad = np.abs(src[y0 : y0 + gh, x0 : x0 + gw] - patch).sum()
                assert sad == m["sad"][gy, gx], (gh, gw, gy, gx)
                # reported SAD no worse than the zero MV
                z = np.abs(src[y0 : y0 + gh, x0 : x0 + gw]
                           - ref[y0 : y0 + gh, x0 : x0 + gw]).sum()
                assert sad <= z


def test_lookup_units_and_fallback():
    src, ref = _shifted_pair(128, 128, 2, 1)
    field = run_device_me(src, {1: ref})
    mv = field.lookup(1, 64, 64, 64, 64)
    assert mv == (16, 8)  # 1/8-pel units
    assert field.lookup(2, 0, 0, 64, 64) is None
    # unknown geometry falls back to the containing square
    assert field.lookup(1, 0, 0, 48, 24) is not None
