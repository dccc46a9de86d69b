#!/usr/bin/env python3
"""Per-stage device timing at real encode shapes (steady state).

Times each device entry point on the current JAX backend at the shapes
the driver configs hit, excluding compile (one warm call first). Use to
pick the next kernel to optimize:

    python tools/tpu_profile_stages.py [--w 1280 --h 720]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, n=3):
    import jax

    jax.device_get(fn())  # warm/compile
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--h", type=int, default=768)
    args = ap.parse_args()
    h = -(-args.h // 64) * 64
    w = -(-args.w // 64) * 64

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} shape={w}x{h}")
    rng = np.random.RandomState(5)
    mk = lambda: jnp.asarray(rng.randint(0, 256, (h, w)).astype(np.int32))
    src, r0, r1, r2 = mk(), mk(), mk(), mk()

    from svt_av1_psyex_tpu.device.me import fullpel_lattice

    fl = jax.jit(lambda s, r: fullpel_lattice(s, r, 255))
    t = timeit(lambda: fl(src, r0))
    print(f"fullpel_lattice (1 ref, jit)     {t*1e3:8.1f} ms")

    from svt_av1_psyex_tpu.device.intra import qp_row_for
    from svt_av1_psyex_tpu.device.inter import N_MODES, inter_analysis

    qp_row = jnp.asarray(qp_row_for(100, 0, 0, 8))
    rd_row = jnp.asarray(
        np.concatenate([[60, 100, 80], np.full(N_MODES, 500),
                        np.full(8, 800), np.full(8, 300), [900, 400],
                        [int(1.5 * 256)]]).astype(np.int32))
    for nref in (1, 2, 3):
        refs = jnp.stack([r0, r1, r2][:nref])
        t = timeit(lambda: (
            inter_analysis(src, refs, qp_row, rd_row, psy=True)))
        print(f"inter_analysis refs={nref} psy=1      {t*1e3:8.1f} ms")

    from svt_av1_psyex_tpu.device.intra import intra_analysis_batch

    lumas = jnp.stack([src] * 4)
    qp_rows = jnp.stack([qp_row] * 4)
    rd = jnp.asarray(np.concatenate(
        [[60, 100, 80], np.full(N_MODES, 500)]).astype(np.int32))
    rd_rows = jnp.stack([rd] * 4)
    t = timeit(lambda: (
        intra_analysis_batch(lumas, qp_rows, rd_rows, psy=True)))
    print(f"intra_analysis_batch F=4 psy=1   {t*1e3:8.1f} ms")

    from svt_av1_psyex_tpu.device.tf import n_bucket, tf_filter

    ch, cw = h // 2, w // 2
    mkc = lambda: jnp.asarray(
        rng.randint(0, 256, (ch, cw)).astype(np.int32))
    center = (src, mkc(), mkc())
    for n in (3, 7):
        nb = n_bucket(n)
        nbrs = (jnp.stack([mk() for _ in range(nb)]),
                jnp.stack([mkc() for _ in range(nb)]),
                jnp.stack([mkc() for _ in range(nb)]))
        nv = jnp.int32(n)
        t = timeit(lambda: (
            tf_filter(center, nbrs, nv, jnp.float32(120.0), 8,
                      ((0, 0), (1, 1), (1, 1)))))
        print(f"tf_filter n={n} (bucket {nb})      {t*1e3:8.1f} ms")

    from svt_av1_psyex_tpu.device.tpl import tpl_group_stats

    for f in (8, 16):
        srcs = jnp.stack([mk() for _ in range(f)])
        t = timeit(lambda: (
            tpl_group_stats(srcs, qp_row, 8)))
        print(f"tpl_group_stats F={f}            {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
