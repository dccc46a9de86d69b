"""Motion compensation: spec-exact sub-pel convolve (single reference).

Mirrors the normative inter prediction process (spec 7.11.3): the 2D
8-tap separable convolve with round_0=3 / round_1=11 intermediate
rounding for 8-bit (svt_av1_convolve_2d_sr_c semantics,
inter_prediction.c:311), plus the x-only / y-only / copy fast paths.
Kernels are the normative Subpel_Filters (extracted tables).

Out-of-frame reference samples are handled by clamping sample
coordinates to the frame (spec 7.11.3.3), implemented as clipped index
gathers — correct for arbitrarily large MVs.
"""

from __future__ import annotations

import numpy as np

from ..bitstream.tables import get

FILTER_BITS = 7
ROUND0 = 3  # 8-bit single-ref
SUBPEL_MASK = 15

# interp_filter enum: 0 REGULAR, 1 SMOOTH, 2 SHARP, 3 BILINEAR
_FILTER_TABLES_8 = ("sub_pel_filters_8", "sub_pel_filters_8smooth",
                    "sub_pel_filters_8sharp", "bilinear_filters")
_FILTER_TABLES_4 = ("sub_pel_filters_4", "sub_pel_filters_4smooth",
                    "sub_pel_filters_4", "bilinear_filters")


def filter_kernel(interp_filter: int, subpel: int, block_dim: int) -> np.ndarray:
    """Kernel for one phase; 4-tap variants for dims <= 4 (stored 8-wide)."""
    names = _FILTER_TABLES_4 if block_dim <= 4 else _FILTER_TABLES_8
    return get(names[interp_filter])[subpel & SUBPEL_MASK]


def _rp2(x, n: int):
    if n == 0:
        return x
    return (x + (1 << (n - 1))) >> n


def _patch(ref: np.ndarray, x0: int, y0: int, w: int, h: int) -> np.ndarray:
    """Gather a w x h patch with spec coordinate clamping."""
    rh, rw = ref.shape
    rows = np.clip(np.arange(y0, y0 + h), 0, rh - 1)
    cols = np.clip(np.arange(x0, x0 + w), 0, rw - 1)
    return ref[rows[:, None], cols[None, :]].astype(np.int64)


def mc_block(ref: np.ndarray, x: int, y: int, w: int, h: int,
             mv_row: int, mv_col: int, ss_x: int, ss_y: int,
             interp_x: int = 0, interp_y: int = 0,
             bit_depth: int = 8) -> np.ndarray:
    """Predict a w x h block at plane position (x, y) with a luma-units MV
    (1/8 pel). For chroma planes pass ss_x/ss_y=1 (1/16-pel phases).
    `ref` is the unpadded reference plane.
    """
    if ss_x:
        ix = x + (mv_col >> 4)
        subx = mv_col & 15
    else:
        ix = x + (mv_col >> 3)
        subx = (mv_col & 7) << 1
    if ss_y:
        iy = y + (mv_row >> 4)
        suby = mv_row & 15
    else:
        iy = y + (mv_row >> 3)
        suby = (mv_row & 7) << 1

    bd = bit_depth
    maxv = (1 << bd) - 1
    if subx == 0 and suby == 0:
        return _patch(ref, ix, iy, w, h).astype(np.int32)

    if suby == 0:  # x only
        kx = filter_kernel(interp_x, subx, w).astype(np.int64)
        sl = _patch(ref, ix - 3, iy, w + 7, h)
        res = sum(kx[k] * sl[:, k : k + w] for k in range(8))
        res = _rp2(res, ROUND0)
        return np.clip(_rp2(res, FILTER_BITS - ROUND0), 0, maxv).astype(np.int32)
    if subx == 0:  # y only
        ky = filter_kernel(interp_y, suby, h).astype(np.int64)
        sl = _patch(ref, ix, iy - 3, w, h + 7)
        res = sum(ky[k] * sl[k : k + h, :] for k in range(8))
        return np.clip(_rp2(res, FILTER_BITS), 0, maxv).astype(np.int32)

    # 2D: horizontal into intermediate then vertical
    round1 = 2 * FILTER_BITS - ROUND0  # 11
    kx = filter_kernel(interp_x, subx, w).astype(np.int64)
    ky = filter_kernel(interp_y, suby, h).astype(np.int64)
    im_h = h + 7
    sl = _patch(ref, ix - 3, iy - 3, w + 7, im_h)
    horiz = sum(kx[k] * sl[:, k : k + w] for k in range(8))
    horiz = _rp2(horiz + (1 << (bd + FILTER_BITS - 1)), ROUND0)
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    vert = sum(ky[k] * horiz[k : k + h, :] for k in range(8))
    res = _rp2(vert + (1 << offset_bits), round1) - (
        (1 << (offset_bits - round1)) + (1 << (offset_bits - round1 - 1)))
    return np.clip(res, 0, maxv).astype(np.int32)
