"""Fused analysis full-loop as one Pallas TPU kernel.

The jnp analysis tier (device/intra.py:_analyze_depth) runs the per-
block chain fwd-DCT -> quantize -> dequant -> inv-DCT -> distortion +
rate-proxy as ~6 separate XLA ops, materializing (B, n, n) interme-
diates in HBM between each. This kernel keeps the whole chain in VMEM:

  * The 2-D transforms become ONE Kronecker-product GEMM each:
    C = Fc @ X @ Fr^T  <=>  vec(C) = vec(X) @ kron(Fc, Fr)^T, so a tile
    of TB blocks is a single (TB, n^2) @ (n^2, cn^2) matmul — the batch
    dimension becomes the MXU M dimension instead of XLA's per-block
    batched matmuls with tiny M (counterpart of the reference's
    av1_fwd_txfm2d SIMD family; the matrices come from
    device/matdct.py's probed linear maps).
  * The rate proxy is gather-free: a per-coefficient scan-POSITION
    constant replaces the scan-order gather (eob = max over nonzeros of
    position+1), which Mosaic handles as pure vector ops.

n = 64 stays on the jnp tier: its kron factor is (4096, 1024) f32 =
16 MB, over the VMEM budget.

Outputs per block: dist, rate (bits<<9), eob, sse — packed in one
(B, 8) f32 array — plus optionally the inverse-transformed residual
(for the recon-domain psy energy path).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

def _tb(n: int) -> int:
    """Blocks per grid tile. Grid steps are serial with fixed overhead
    (~25 us each on v5e through the tunnel runtime) — 128-block tiles
    made blk=8 frames 840 steps = 24 ms of pure step latency. Scale the
    tile so VMEM holds ~2-4 MB of residuals per step: n=8 frames drop to
    ~27 steps."""
    # v5e scoped VMEM is 16MB and vmap (the per-frame batch in
    # intra_analysis_batch) roughly doubles the stack footprint: keep a
    # tile's buffers (x, coeffs, inv, outs ~ 4 x TB*n^2*4B) under ~4MB
    return {4: 2048, 8: 1024, 16: 512, 32: 128}.get(n, 128)

# rate-proxy constants — must match device/intra.py
RATE_NZ = 1229
RATE_LOG2 = 614
RATE_ZERO = 154
RATE_EOB = 1946


def use_pallas() -> bool:
    """Pallas kernels on?  Default: on TPU only (on CPU they run in the
    much slower interpret mode — tests opt in via SVT_TPU_PALLAS=1).
    SVT_TPU_PALLAS=0 forces the jnp chain everywhere."""
    val = os.environ.get("SVT_TPU_PALLAS")
    if val is not None:
        return val != "0"
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@lru_cache(maxsize=None)
def kron_mats(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(KF (n^2, cn^2), KI (cn^2, n^2)) f32 with the fwd/inv shift gains
    folded in (from device/matdct.py's probed 1-D maps)."""
    from ...device.matdct import fwd_mats, inv_mats

    fc, fr = fwd_mats(n)   # (cn, n) x2
    gc, gr = inv_mats(n)   # (n, cn) x2
    kf = np.kron(fc.astype(np.float64), fr.astype(np.float64)).T
    ki = np.kron(gc.astype(np.float64), gr.astype(np.float64)).T
    return (np.ascontiguousarray(kf, np.float32),
            np.ascontiguousarray(ki, np.float32))


@lru_cache(maxsize=None)
def scan_pos(cn: int) -> np.ndarray:
    """(cn^2,) int32: scan position of each row-major coefficient."""
    from ...bitstream.tables import scan_table

    tx = {4: 0, 8: 1, 16: 2, 32: 3}[cn]
    scan = scan_table(tx, "default").astype(np.int64)
    pos = np.empty(cn * cn, np.int32)
    pos[scan] = np.arange(cn * cn, dtype=np.int32)
    return pos


def _fullloop_kernel(resid_ref, kf_ref, ki_ref, spos_ref, qp_ref, out_ref,
                     inv_ref, *, n: int, cn: int, log_scale: int,
                     want_inv: bool, tb: int):
    """One TB-block tile. qp_ref (VMEM, (1, 8)): deq_dc, deq_ac, rnd_dc,
    rnd_ac, zbin_dc, zbin_ac (rnd/zbin already >> log_scale). VMEM, not
    SMEM: pallas vmap (the per-frame batch in intra_analysis_batch)
    turns SMEM specs into blocked specs the TPU lowering rejects."""
    x = resid_ref[...]                                   # (TB, n^2) f32
    # HIGHEST: DEFAULT on TPU is one bf16 pass per operand, which skews
    # the transform enough to flip quantize decisions vs the jnp chain
    c = jnp.dot(x, kf_ref[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    qp = qp_ref[0, :]                                    # (8,) f32
    idx = jax.lax.broadcasted_iota(jnp.int32, (tb, cn * cn), 1)
    is_dc = idx == 0
    deq = jnp.where(is_dc, qp[0], qp[1]).astype(jnp.float32)
    rnd = jnp.where(is_dc, qp[2], qp[3]).astype(jnp.float32)
    zbin = jnp.where(is_dc, qp[4], qp[5]).astype(jnp.float32)

    abs_c = jnp.abs(c)
    scale = float(1 << log_scale) / deq
    qabs = jnp.floor((abs_c + rnd) * scale).astype(jnp.int32)
    qabs = jnp.where(abs_c >= zbin, jnp.maximum(qabs, 0), 0)
    sign = jnp.where(c < 0, -1, 1)
    dq = sign * jax.lax.shift_right_arithmetic(
        qabs * deq.astype(jnp.int32), log_scale)

    inv = jnp.dot(dq.astype(jnp.float32), ki_ref[...],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)   # (TB, n^2)
    if want_inv:
        inv_ref[...] = inv
    err = x - inv
    dist = jnp.sum(err * err, axis=1)
    sse = jnp.sum(x * x, axis=1)

    spos = spos_ref[...]                                 # (1, cn^2)
    nz = qabs != 0
    eob = jnp.max(jnp.where(nz, spos + 1, 0), axis=1)
    nnz = jnp.sum(nz.astype(jnp.int32), axis=1)
    log2q = jnp.log2(1.0 + qabs.astype(jnp.float32))
    rate = (RATE_NZ * nnz
            + (RATE_LOG2 * jnp.sum(jnp.where(nz, log2q, 0.0),
                                   axis=1)).astype(jnp.int32)
            + RATE_ZERO * jnp.maximum(eob - nnz, 0)
            + (RATE_EOB
               * jnp.log2(1.0 + eob.astype(jnp.float32))).astype(jnp.int32))

    out_ref[:, 0] = dist
    out_ref[:, 1] = rate.astype(jnp.float32)
    out_ref[:, 2] = eob.astype(jnp.float32)
    out_ref[:, 3] = sse
    out_ref[:, 4:] = jnp.zeros((tb, 4), jnp.float32)


@partial(jax.jit, static_argnames=("n", "log_scale", "want_inv"))
def fullloop(resid: jnp.ndarray, qp6: jnp.ndarray, n: int, log_scale: int,
             want_inv: bool = False):
    """resid (B, n, n) f32/int32; qp6 (6,) f32 = deq_dc, deq_ac, rnd_dc,
    rnd_ac, zbin_dc, zbin_ac (rnd/zbin pre-shifted by log_scale).
    -> (metrics (B, 8) f32, inv (B, n, n) f32 | None).
    Metrics cols: 0 dist, 1 rate(bits<<9), 2 eob, 3 sse."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = resid.shape[0]
    cn = min(n, 32)
    tb = _tb(n)
    bp = -(-b // tb) * tb
    x = resid.reshape(b, n * n).astype(jnp.float32)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
    kf, ki = kron_mats(n)

    out_shapes = [jax.ShapeDtypeStruct((bp, 8), jnp.float32),
                  jax.ShapeDtypeStruct((bp, n * n) if want_inv else (1, 1),
                                       jnp.float32)]
    grid = (bp // tb,)
    outs = pl.pallas_call(
        partial(_fullloop_kernel, n=n, cn=cn, log_scale=log_scale,
                want_inv=want_inv, tb=tb),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, n * n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n * n, cn * cn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cn * cn, n * n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cn * cn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n * n) if want_inv else (1, 1),
                         (lambda i: (i, 0)) if want_inv else
                         (lambda i: (0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        interpret=_interpret(),
    )(x, jnp.asarray(kf), jnp.asarray(ki),
      jnp.asarray(scan_pos(cn))[None, :],
      jnp.pad(qp6.astype(jnp.float32), (0, 2))[None, :])
    metrics = outs[0][:b]
    inv = outs[1][:b].reshape(b, n, n) if want_inv else None
    return metrics, inv
