"""Warped motion: ops/warp.py vs the reference C oracle, bit-exact.

Mirrors the reference's warp_filter_test.cc strategy: random valid
affine models over random planes, C reference vs our implementation on
identical inputs (spec 7.11.3.5-7.11.3.7)."""

import numpy as np
import pytest

import oracle
from svt_av1_psyex_tpu.ops import warp

pytestmark = pytest.mark.quick

pytest.importorskip("numpy")
if not oracle.available():  # pragma: no cover
    pytest.skip("reference tree absent", allow_module_level=True)


def _rand_model(rng, kind="affine"):
    """Random warp model in spec units, biased toward valid shears."""
    one = 1 << warp.WARPEDMODEL_PREC_BITS
    m = [0] * 6
    m[0] = int(rng.integers(-(1 << 13), 1 << 13))
    m[1] = int(rng.integers(-(1 << 13), 1 << 13))
    m[2] = one + int(rng.integers(-4000, 4000))
    m[3] = int(rng.integers(-2000, 2000))
    if kind == "rotzoom":
        m[4] = -m[3]
        m[5] = m[2]
    else:
        m[4] = int(rng.integers(-2000, 2000))
        m[5] = one + int(rng.integers(-4000, 4000))
    return m


def test_shear_params_match_reference():
    rng = np.random.default_rng(7)
    n_valid = 0
    for _ in range(300):
        m = _rand_model(rng, "affine" if rng.integers(2) else "rotzoom")
        ok_ref, a_r, b_r, g_r, d_r = oracle.shear_params(m)
        ok, a, b, g, d = warp.get_shear_params(m)
        assert ok == ok_ref, m
        if ok:
            assert (a, b, g, d) == (a_r, b_r, g_r, d_r), m
            n_valid += 1
    assert n_valid > 100  # the generator must actually exercise valid models


@pytest.mark.parametrize("sub", [(0, 0), (1, 1)])
@pytest.mark.parametrize("kind", ["rotzoom", "affine"])
def test_warp_affine_bit_exact(kind, sub):
    rng = np.random.default_rng(11 + sub[0])
    plane = rng.integers(0, 256, (128, 160), dtype=np.uint8)
    n = 0
    while n < 12:
        m = _rand_model(rng, kind)
        ok, *shear = warp.get_shear_params(m)
        if not ok:
            continue
        n += 1
        w, h = int(rng.choice([8, 16, 32])), int(rng.choice([8, 16, 32]))
        x0 = int(rng.integers(0, 160 - w))
        y0 = int(rng.integers(0, 128 - h))
        ref = oracle.warp_affine(m, shear, plane, x0, y0, w, h, *sub)
        got = warp.warp_plane(plane, m, shear, x0, y0, w, h, *sub)
        assert np.array_equal(got, ref), (m, shear, x0, y0, w, h)


@pytest.mark.parametrize("bd", [10])
def test_highbd_warp_affine_bit_exact(bd):
    """10-bit warp uses reduce_bits_horiz = 3 (NOT the 12-bit 5) —
    regression for the round-5 config-3 ±2 recon divergence. (The
    reference's 8b+2b split plane format carries 10-bit samples only,
    so 12-bit can't be oracle-checked through this entry point.)"""
    rng = np.random.default_rng(31 + bd)
    plane = rng.integers(0, 1 << bd, (128, 160), dtype=np.uint16)
    n = 0
    while n < 10:
        m = _rand_model(rng, "affine" if rng.integers(2) else "rotzoom")
        ok, *shear = warp.get_shear_params(m)
        if not ok:
            continue
        n += 1
        w, h = int(rng.choice([8, 16, 32])), int(rng.choice([8, 16, 32]))
        x0 = int(rng.integers(0, 160 - w))
        y0 = int(rng.integers(0, 128 - h))
        ref = oracle.highbd_warp_affine(m, shear, plane, x0, y0, w, h, bd)
        got = warp.warp_plane(plane, m, shear, x0, y0, w, h, bd=bd)
        assert np.array_equal(got, ref), (bd, m, shear, x0, y0, w, h)


def test_project_mv_translation_rounding():
    one = 1 << warp.WARPEDMODEL_PREC_BITS
    # TRANSLATION stores (row, col) in mat[0], mat[1] (libaom/dav1d
    # layout) -> 1/8-pel, lowered to even (allow_hp=False) / fullpel
    m = [3 << (warp.WARPEDMODEL_PREC_BITS - 3),
         -5 << (warp.WARPEDMODEL_PREC_BITS - 3), one, 0, 0, one]
    assert warp.project_mv(m, 1, 0, 0, 16, 16, True, False) == (3, -5)
    r, c = warp.project_mv(m, 1, 0, 0, 16, 16, False, False)
    assert r % 2 == 0 and c % 2 == 0
    r, c = warp.project_mv(m, 1, 0, 0, 16, 16, False, True)
    assert r % 8 == 0 and c % 8 == 0


# block size enum indices for the oracle (codec constants ordering)
from svt_av1_psyex_tpu.codec.constants import BLOCK_H, BLOCK_W  # noqa: E402


def _rand_samples(rng, n, mv, spread=60):
    pts, ptsr = [], []
    for _ in range(n):
        x = int(rng.integers(-256, 512))
        y = int(rng.integers(-256, 512))
        pts.append((x, y))
        ptsr.append((x + mv[1] + int(rng.integers(-spread, spread)),
                     y + mv[0] + int(rng.integers(-spread, spread))))
    return pts, ptsr


def test_select_samples_matches_reference():
    rng = np.random.default_rng(17)
    for bsize in (9, 12, 3, 15):   # 32x32, 64x64, 16x16, 64x32-ish
        bw, bh = int(BLOCK_W[bsize]), int(BLOCK_H[bsize])
        for _ in range(100):
            n = int(rng.integers(1, 9))
            mv = (int(rng.integers(-128, 128)), int(rng.integers(-128, 128)))
            pts, ptsr = _rand_samples(rng, n, mv, spread=100)
            ref = oracle.select_samples(mv, pts, ptsr, bsize)
            got = warp.select_samples(mv, pts, ptsr, bw, bh)
            assert got == ref, (bsize, mv, pts, ptsr)


def test_find_projection_matches_reference():
    rng = np.random.default_rng(23)
    n_ok = 0
    for bsize in (9, 12, 3):
        bw, bh = int(BLOCK_W[bsize]), int(BLOCK_H[bsize])
        for _ in range(150):
            n = int(rng.integers(1, 9))
            mv = (int(rng.integers(-64, 64)) * 2,
                  int(rng.integers(-64, 64)) * 2)
            mi_row = int(rng.integers(0, 40))
            mi_col = int(rng.integers(0, 40))
            pts, ptsr = _rand_samples(rng, n, mv, spread=40)
            ok_r, mat_r, *shear_r = oracle.find_projection(
                pts, ptsr, bsize, mv, mi_row, mi_col)
            got = warp.find_projection(pts, ptsr, bw, bh, mv, mi_row, mi_col)
            if not ok_r:
                assert got is None, (pts, ptsr, mv)
            else:
                assert got is not None, (pts, ptsr, mv)
                assert got[0] == mat_r, (got[0], mat_r)
                assert got[1] == tuple(shear_r)
                n_ok += 1
    assert n_ok > 100
