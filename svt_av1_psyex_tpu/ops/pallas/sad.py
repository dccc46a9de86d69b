"""Full-resolution ME SAD pyramid as a Pallas TPU kernel.

The jnp tier (device/me.py fullpel_lattice, L2) lax.scans over the
(2R+1)^2 offset table, dynamic-slicing every SB's candidate from its
gathered search window per step — XLA streams the whole (nSB, 80, 80)
window array from HBM once per offset.  This kernel pins each SB's
window + source tile in VMEM and sweeps all offsets locally, cutting
HBM reads by ~the offset count (289 for R=8) and writing only the
(nSB, O, 8, 8) SAD lattice.

Counterpart: the reference's ext_sad_calculation_8x8_16x16 /
_32x32_64x64 pyramid (motion_estimation.c:1568,3076) — same 8x8-
granular lattice the geometry aggregation consumes, computed
whole-frame-batched instead of per-search-point SIMD calls.

Integer arithmetic end to end: results are bit-exact vs the jnp chain
(tests/test_pallas.py)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BLK = 64      # SB size
R = 8         # +- full-pel window (device/me.py R2)
NOFF = (2 * R + 1) ** 2


def _sad_kernel(tile_ref, win_ref, out_ref):
    """One SB: tile (1, 64, 64) i32, win (1, 80, 80) i32 ->
    out (1, NOFF, 64) i32 — offset-major 8x8 SAD boxes, row-major."""
    t = tile_ref[0]                                 # (64, 64)

    from jax.experimental import pallas as pl

    def body(o, _):
        dy = o // (2 * R + 1)
        dx = o % (2 * R + 1)
        cand = win_ref[0, pl.ds(dy, BLK), pl.ds(dx, BLK)]
        d = jnp.abs(t - cand)
        boxes = d.reshape(8, 8, 8, 8).sum(axis=(1, 3))  # (8, 8)
        out_ref[0, o, :] = boxes.reshape(64)
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
    span = BLK + 2 * R
    out = pl.pallas_call(
        _sad_kernel,
        out_shape=jax.ShapeDtypeStruct((nsb, NOFF, BLK), jnp.int32),
        grid=(nsb,),
        in_specs=[
            pl.BlockSpec((1, BLK, BLK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, span, span), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NOFF, BLK), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(tiles.astype(jnp.int32), wins.astype(jnp.int32))
    return out.reshape(nsb, NOFF, 8, 8)
