"""Pallas TPU kernels for the hottest device-analysis ops.

Each kernel fuses a chain the jnp tier runs as separate XLA ops (with
HBM round-trips between them) into one VMEM-resident program:

  * fullloop — fwd DCT (Kronecker GEMM on MXU) + analysis quantize +
    dequant + inv DCT + distortion/rate/eob metrics, per block batch.
  * sad — the full-resolution ME SAD pyramid over per-SB windows.

On CPU (tests) the kernels run in Pallas interpret mode; on TPU they
compile through Mosaic. `SVT_TPU_PALLAS=0` falls back to the jnp tier.
"""
