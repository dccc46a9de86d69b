"""Intra predictors — spec-exact, batched over blocks of one tx size.

Implements the AV1 prediction processes (spec 7.11.2): DC (with
left-only/top-only/128 fallbacks handled by neighbor fill + availability),
V, H, SMOOTH/SMOOTH_V/SMOOTH_H (spec Sm_Weights), PAETH. Directional
modes land with the edge-filter work. Counterpart:
Source/Lib/Codec/intra_prediction.c (dc_predictor:1060, smooth_*:1090+,
paeth), neighbor fill per enc_intra_prediction.c build_intra_predictors:60.

Batched layout: above (B, w+1) with above[:,0] = top-left, left (B, h).
"""

from __future__ import annotations

import numpy as np

from ..bitstream.tables import get
from ..codec.constants import IntraMode

SM_WEIGHT_LOG2 = 8


def _sm_weights(n: int) -> np.ndarray:
    # spec Sm_Weights, stored in av1_tables.npz via sm_weight_arrays
    return get("sm_weight_arrays")[n : 2 * n]


def predict(mode: int, above: np.ndarray, left: np.ndarray, w: int, h: int,
            have_above: bool = True, have_left: bool = True,
            bit_depth: int = 8) -> np.ndarray:
    """above: (B, w+1) int32 incl. top-left at [:,0]; left: (B, h).

    Neighbor arrays must already be filled per the spec fill rules
    (fill_neighbors below). Returns (B, h, w) int32.
    """
    b = above.shape[0]
    ar = above[:, 1 : w + 1]
    tl = above[:, 0:1]
    if mode == IntraMode.DC:
        if have_above and have_left:
            s = ar.sum(axis=1) + left.sum(axis=1)
            dc = (s + ((w + h) >> 1)) // (w + h)
        elif have_above:
            dc = (ar.sum(axis=1) + (w >> 1)) >> int(np.log2(w))
        elif have_left:
            dc = (left.sum(axis=1) + (h >> 1)) >> int(np.log2(h))
        else:
            dc = np.full(b, 1 << (bit_depth - 1), np.int64)
        return np.broadcast_to(dc[:, None, None], (b, h, w)).astype(np.int32)
    if mode == IntraMode.V:
        return np.broadcast_to(ar[:, None, :], (b, h, w)).astype(np.int32)
    if mode == IntraMode.H:
        return np.broadcast_to(left[:, :, None], (b, h, w)).astype(np.int32)
    if mode == IntraMode.SMOOTH:
        wh = _sm_weights(h).astype(np.int64)  # (h,)
        ww = _sm_weights(w).astype(np.int64)  # (w,)
        below = left[:, h - 1].astype(np.int64)[:, None, None]
        right = ar[:, w - 1].astype(np.int64)[:, None, None]
        a = ar.astype(np.int64)[:, None, :]
        l = left.astype(np.int64)[:, :, None]
        scale = 1 << SM_WEIGHT_LOG2
        p = (wh[None, :, None] * a + (scale - wh)[None, :, None] * below
             + ww[None, None, :] * l + (scale - ww)[None, None, :] * right)
        return ((p + (1 << SM_WEIGHT_LOG2)) >> (SM_WEIGHT_LOG2 + 1)).astype(np.int32)
    if mode == IntraMode.SMOOTH_V:
        wh = _sm_weights(h).astype(np.int64)
        below = left[:, h - 1].astype(np.int64)[:, None, None]
        a = ar.astype(np.int64)[:, None, :]
        scale = 1 << SM_WEIGHT_LOG2
        p = wh[None, :, None] * a + (scale - wh)[None, :, None] * below
        return ((p + (scale >> 1)) >> SM_WEIGHT_LOG2).astype(np.int32)
    if mode == IntraMode.SMOOTH_H:
        ww = _sm_weights(w).astype(np.int64)
        right = ar[:, w - 1].astype(np.int64)[:, None, None]
        l = left.astype(np.int64)[:, :, None]
        scale = 1 << SM_WEIGHT_LOG2
        p = ww[None, None, :] * l + (scale - ww)[None, None, :] * right
        return ((p + (scale >> 1)) >> SM_WEIGHT_LOG2).astype(np.int32)
    if mode == IntraMode.PAETH:
        a = ar.astype(np.int32)[:, None, :]
        l = left.astype(np.int32)[:, :, None]
        t = tl.astype(np.int32)[:, :, None]
        base = a + l - t
        pa = np.abs(base - a)
        pl = np.abs(base - l)
        pt = np.abs(base - t)
        # spec: left if pLeft<=pTop and pLeft<=pTopLeft; else top if
        # pTop<=pTopLeft; else topleft
        out = np.where((pl <= pa) & (pl <= pt), np.broadcast_to(l, base.shape),
                       np.where(pa <= pt, np.broadcast_to(a, base.shape),
                                np.broadcast_to(t, base.shape)))
        return out.astype(np.int32)
    raise NotImplementedError(f"intra mode {mode}")


# spec NEED_* per mode (extend_modes); used by the neighbor fill
_NEEDS = {
    IntraMode.DC: (True, True),
    IntraMode.V: (True, False),
    IntraMode.H: (False, True),
    IntraMode.SMOOTH: (True, True),
    IntraMode.SMOOTH_V: (True, True),
    IntraMode.SMOOTH_H: (True, True),
    IntraMode.PAETH: (True, True),
}


def fill_neighbors(recon: np.ndarray, x: int, y: int, w: int, h: int,
                   have_above: bool, have_left: bool, mode: int,
                   bit_depth: int = 8) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Build (above(w+1 incl TL), left(h)) arrays per the spec fill rules
    for one tx block at (x, y) in `recon` (2D plane array).

    Returns (above, left, flat_fill) — if flat_fill is not None, the
    prediction is a constant fill (early-exit rule) with that value.
    """
    base = 1 << (bit_depth - 1)
    need_above, need_left = _NEEDS[IntraMode(mode)]
    n_top = w if have_above else 0
    n_left = h if have_left else 0

    # early exit: missing everything the mode needs on one side
    if (not need_above and n_left == 0) or (not need_left and n_top == 0):
        if need_left:
            val = int(recon[y - 1, x]) if n_top > 0 else base + 1
        else:
            val = int(recon[y, x - 1]) if n_left > 0 else base - 1
        return None, None, val

    above = np.empty(w + 1, np.int32)
    left = np.empty(h, np.int32)
    if n_left > 0:
        left[:] = recon[y : y + h, x - 1]
    else:
        left[:] = recon[y - 1, x] if n_top > 0 else base + 1
    if n_top > 0:
        above[1:] = recon[y - 1, x : x + w]
    else:
        above[1:] = recon[y, x - 1] if n_left > 0 else base - 1
    if n_top > 0 and n_left > 0:
        above[0] = recon[y - 1, x - 1]
    elif n_top > 0:
        above[0] = recon[y - 1, x]
    elif n_left > 0:
        above[0] = recon[y, x - 1]
    else:
        above[0] = base
    return above, left, None
