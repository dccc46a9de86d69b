"""TPL (temporal dependency model) dispenser on device.

ONE jitted call per lookahead group runs the whole TPL forward pass:
a lax.scan over the group's source frames where each step, fully
batched over the frame's 16x16 blocks,

  * picks the best open-loop intra prediction (device/intra predictors),
  * motion-searches against the previous SOURCE frame (device/me
    lattices — the reference's TPL ME is also source-based),
  * evaluates the residual through the exact integer DCT + analysis
    quantizer twice: once predicting from the source reference
    (srcrf_*) and once from the TPL recon carried through the scan
    (recrf_*), as the reference dispenser does,
  * reconstructs the frame into the scan carry for the next step.

Only the per-block stats grids leave the device (one transfer per
group); the host synthesizer backprop + r0/beta math lives in
codec/tpl.py.

Counterpart: src_ops_process.c tpl_mc_flow_dispenser (:1347) /
tpl_mc_flow_dispenser_sb_generic (:519) — redesigned as whole-frame
batched tensor ops + a device scan over the group (SURVEY §2.1 row 6-7:
"batched per-frame TPL kernels, sequential backprop over frames").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .intra import (
    _block_neighbors,
    _extract_blocks,
    _fwd_dct2d,
    _inv_dct2d,
    _predict_modes,
    _quantize_analysis,
    _rate_dist,
    _rp2,
)
from .me import fullpel_lattice, geometry_best

BLK = 16  # TPL synth block size (tpl_ctrls.synth_blk_size default 16)

# stats row layout per frame (each a (nh, nw) grid)
STAT_FIELDS = ("srcrf_dist", "recrf_dist", "srcrf_rate", "recrf_rate",
               "mv_y", "mv_x", "is_inter")


def _txrd16(resid: jnp.ndarray, qp_row, bit_depth: int):
    """(dist, rate) of a (B, 16, 16) residual batch at the TPL q."""
    coeffs = _fwd_dct2d(resid, BLK)
    qabs, dq = _quantize_analysis(
        coeffs, qp_row[4], qp_row[9],
        _rp2(qp_row[1], 0), _rp2(qp_row[6], 0),
        _rp2(qp_row[0], 0), _rp2(qp_row[5], 0), 0)
    dist, rate, _eob, inv = _rate_dist(qabs, dq, resid, BLK, bit_depth)
    return dist, rate, inv


def _best_intra(src: jnp.ndarray, tiles: jnp.ndarray):
    """Best open-loop intra prediction per 16x16 block (by pred SSE);
    returns the selected predictions (B, 16, 16)."""
    above, left, tl = _block_neighbors(src, BLK)
    preds = _predict_modes(tiles, above, left, tl, BLK)   # (M, B, 16, 16)
    sse = ((tiles[None] - preds).astype(jnp.float32) ** 2).sum(axis=(2, 3))
    sel = jnp.argmin(sse, axis=0)                          # (B,)
    return jnp.take_along_axis(
        preds, sel[None, :, None, None], axis=0)[0]


def _mc16(plane: jnp.ndarray, mv_y: jnp.ndarray, mv_x: jnp.ndarray):
    """Full-pel 16x16 MC gathers; mv grids (nh, nw)."""
    h, w = plane.shape
    nh, nw = mv_y.shape
    y0 = (jnp.arange(nh)[:, None] * BLK + mv_y).reshape(-1)
    x0 = (jnp.arange(nw)[None, :] * BLK + mv_x).reshape(-1)
    rows = jnp.clip(y0[:, None] + jnp.arange(BLK)[None, :], 0, h - 1)
    cols = jnp.clip(x0[:, None] + jnp.arange(BLK)[None, :], 0, w - 1)
    return plane[rows[:, :, None], cols[:, None, :]]


def _recon_from(pred: jnp.ndarray, inv: jnp.ndarray, h: int, w: int,
                maxpix: int) -> jnp.ndarray:
    """Assemble block recons back into a frame plane."""
    nby, nbx = h // BLK, w // BLK
    rec = jnp.clip(pred + inv, 0, maxpix)
    return (rec.reshape(nby, nbx, BLK, BLK).transpose(0, 2, 1, 3)
            .reshape(h, w))


@partial(jax.jit, static_argnames=("bit_depth",))
def tpl_group_stats(srcs: jnp.ndarray, qp_row: jnp.ndarray,
                    bit_depth: int = 8) -> jnp.ndarray:
    """srcs (F, H, W) int (display order, H/W multiples of 64).
    Returns (F, 7, nh, nw) f32 stats grids (STAT_FIELDS order); frame 0
    is intra-only (srcrf == recrf == intra stats, is_inter = 0).

    Distortions are scaled << TPL_DEP_COST_SCALE_LOG2 (4) to match the
    reference synthesizer formulas verbatim (definitions.h:49)."""
    srcs = srcs.astype(jnp.int32)
    f, h, w = srcs.shape
    maxpix = (1 << bit_depth) - 1
    nh, nw = h // BLK, w // BLK

    def frame_stats(cur, prev_src, prev_rec, has_ref):
        tiles = _extract_blocks(cur, BLK)
        ipred = _best_intra(cur, tiles)
        idist, irate, iinv = _txrd16(tiles - ipred, qp_row, bit_depth)

        # source-based full-pel ME (64-SB lattice -> 16x16 grid)
        sad8_h, sad8_z, cyf, cxf = fullpel_lattice(cur, prev_src, maxpix)
        mv_y, mv_x, _ = geometry_best(sad8_h, sad8_z, cyf, cxf, BLK, BLK)
        nby, nbx = h // 64, w // 64
        g = 64 // BLK
        mv_y = (mv_y.reshape(nby, nbx, g, g).transpose(0, 2, 1, 3)
                .reshape(nh, nw))
        mv_x = (mv_x.reshape(nby, nbx, g, g).transpose(0, 2, 1, 3)
                .reshape(nh, nw))

        pred_s = _mc16(prev_src, mv_y, mv_x)
        pred_r = _mc16(prev_rec, mv_y, mv_x)
        sdist, srate, _ = _txrd16(tiles - pred_s, qp_row, bit_depth)
        rdist, rrate, rinv = _txrd16(tiles - pred_r, qp_row, bit_depth)
        # the closed-loop result can't beat the source-ref one (reference
        # enforces recrf >= srcrf)
        rdist = jnp.maximum(rdist, sdist)
        rrate = jnp.maximum(rrate, srate)

        # inter/intra choice in the open-loop prediction domain (the
        # reference dispenser compares source-ref SATDs; closed-loop
        # quantization error must not penalize the inter candidate)
        sse_i = ((tiles - ipred).astype(jnp.float32) ** 2).sum(axis=(1, 2))
        sse_s = ((tiles - pred_s).astype(jnp.float32) ** 2).sum(axis=(1, 2))
        use_inter = has_ref & (sse_s < sse_i)
        srcrf_dist = jnp.where(use_inter, sdist, idist)
        recrf_dist = jnp.where(use_inter, rdist, idist)
        srcrf_rate = jnp.where(use_inter, srate, irate)
        recrf_rate = jnp.where(use_inter, rrate, irate)

        sel = use_inter[:, None, None]
        rec = _recon_from(jnp.where(sel, pred_r, ipred),
                          jnp.where(sel, rinv, iinv), h, w, maxpix)
        gshape = lambda a: a.reshape(nh, nw).astype(jnp.float32)  # noqa: E731
        stats = jnp.stack([
            gshape(srcrf_dist * 16.0), gshape(recrf_dist * 16.0),
            gshape(srcrf_rate), gshape(recrf_rate),
            jnp.where(use_inter, mv_y.reshape(-1),
                      0).reshape(nh, nw).astype(jnp.float32),
            jnp.where(use_inter, mv_x.reshape(-1),
                      0).reshape(nh, nw).astype(jnp.float32),
            gshape(use_inter.astype(jnp.float32)),
        ])
        return rec, stats

    # frame 0: intra only
    tiles0 = _extract_blocks(srcs[0], BLK)
    ipred0 = _best_intra(srcs[0], tiles0)
    idist0, irate0, iinv0 = _txrd16(tiles0 - ipred0, qp_row, bit_depth)
    rec0 = _recon_from(ipred0, iinv0, h, w, maxpix)
    g0 = lambda a: a.reshape(nh, nw).astype(jnp.float32)  # noqa: E731
    stats0 = jnp.stack([g0(idist0 * 16.0), g0(idist0 * 16.0),
                        g0(irate0), g0(irate0),
                        jnp.zeros((nh, nw), jnp.float32),
                        jnp.zeros((nh, nw), jnp.float32),
                        jnp.zeros((nh, nw), jnp.float32)])

    if f == 1:
        return stats0[None]

    def body(carry, xs):
        cur, prev_src = xs
        rec, stats = frame_stats(cur, prev_src, carry,
                                 jnp.asarray(True))
        return rec, stats

    _, rest = jax.lax.scan(body, rec0, (srcs[1:], srcs[:-1]))
    return jnp.concatenate([stats0[None], rest])
