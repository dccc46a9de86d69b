"""Full-resolution ME SAD pyramid as a Pallas TPU kernel.

The jnp tier (device/me.py fullpel_lattice, L2) lax.scans over the
(2R+1)^2 offset table, dynamic-slicing every SB's candidate from its
gathered search window per step — XLA streams the whole (nSB, 80, 80)
window array from HBM once per offset.  This kernel pins each SB's
window + source tile in VMEM and sweeps all offsets locally, cutting
HBM reads by ~the offset count (289 for R=8) and writing only the
(nSB, O, 8, 8) SAD lattice.

Mosaic constraints shaped the kernel (all hit on real v5e hardware):
  * dynamic slices in the lane dim must be 128-aligned -> the window is
    padded to 128 lanes and the candidate is aligned with dynamic
    rotates (tpu.dynamic_rotate) instead of pl.ds;
  * sublane dynamic rotates mis-handle negative shifts (reduced mod 16
    on v5e) -> always rotate by the positive complement SPAN - dy;
  * (64,64)->(8,8,8,8) reshapes are unsupported -> the 8x8 box sum is
    two pooling matmuls, exact in f32 at HIGHEST precision (inputs
    <=255, sums <=16320 < 2^24; DEFAULT bf16 passes are NOT exact
    because the row-pooled intermediate needs 11 mantissa bits).

Counterpart: the reference's ext_sad_calculation_8x8_16x16 /
_32x32_64x64 pyramid (motion_estimation.c:1568,3076) — same 8x8-
granular lattice the geometry aggregation consumes, computed
whole-frame-batched instead of per-search-point SIMD calls.

Integer arithmetic end to end: results are bit-exact vs the jnp chain
(tests/test_pallas.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

BLK = 64      # SB size
R = 8         # +- full-pel window (device/me.py R2)
NOFF = (2 * R + 1) ** 2
SPAN = BLK + 2 * R


def _sad_kernel(tile_ref, win_ref, out_ref):
    """One SB: tile (1, 64, 64) i32, win (1, 80, 128) i32 (cols >= SPAN
    are pad) -> out (1, NOFF, 8, 8) i32 SAD boxes."""
    from jax.experimental.pallas import tpu as pltpu

    t = tile_ref[0].astype(jnp.float32)             # (64, 64)
    w = win_ref[0]                                  # (80, 128) i32
    pool = (jax.lax.broadcasted_iota(jnp.int32, (8, BLK), 0) ==
            jax.lax.broadcasted_iota(jnp.int32, (8, BLK), 1) // 8
            ).astype(jnp.float32)                   # (8, 64) box pooling

    def body(o, _):
        dy = o // (2 * R + 1)
        dx = o % (2 * R + 1)
        wr = pltpu.roll(w, SPAN - dy, 0)            # positive shift only
        wr = pltpu.roll(wr, -dx, 1)
        cand = wr[:BLK, :BLK].astype(jnp.float32)
        d = jnp.abs(t - cand)
        hi = jax.lax.dot(pool, d, precision=jax.lax.Precision.HIGHEST)
        boxes = jax.lax.dot(hi, pool.T,
                            precision=jax.lax.Precision.HIGHEST)
        out_ref[0, o, :, :] = boxes.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, NOFF, body, 0)


@jax.jit
def sad_lattice(tiles: jnp.ndarray, wins: jnp.ndarray) -> jnp.ndarray:
    """tiles (nSB, 64, 64) i32; wins (nSB, 80, 80) i32 (already gathered
    with spec MC edge clamping) -> (nSB, NOFF, 8, 8) i32 SAD lattice."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .fullloop import _interpret

    nsb = tiles.shape[0]
    wins = jnp.pad(wins.astype(jnp.int32),
                   ((0, 0), (0, 0), (0, 128 - SPAN)))
    out = pl.pallas_call(
        _sad_kernel,
        out_shape=jax.ShapeDtypeStruct((nsb, NOFF, 8, 8), jnp.int32),
        grid=(nsb,),
        in_specs=[
            pl.BlockSpec((1, BLK, BLK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SPAN, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NOFF, 8, 8), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(tiles.astype(jnp.int32), wins)
    return out
