#!/usr/bin/env python3
"""Micro-benchmark: Pallas kernels vs their jnp/XLA chains.

Run on the TPU (default backend) or CPU (JAX_PLATFORMS=cpu; the Pallas
side then uses interpret mode and the comparison is meaningless — this
tool exists for on-chip numbers).

Prints per kernel: jnp ms, pallas ms, speedup, and a roofline estimate
(HBM GB/s touched and MXU GFLOP/s for the fullloop)."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t) / reps, out


def bench_fullloop():
    from svt_av1_psyex_tpu.device import intra as di
    from svt_av1_psyex_tpu.ops.pallas.fullloop import fullloop

    rng = np.random.RandomState(0)
    qp_row = di.qp_row_for(80, 0, 0, 8)
    for n, b in ((8, 32768), (16, 8192), (32, 2048)):
        resid = rng.randint(-80, 81, (b, n, n)).astype(np.int32)
        ls = 1 if n == 32 else 0
        qp6 = jnp.asarray([qp_row[4], qp_row[9],
                           di._rp2(qp_row[1], ls), di._rp2(qp_row[6], ls),
                           di._rp2(qp_row[0], ls), di._rp2(qp_row[5], ls)],
                          jnp.float32)
        x = jnp.asarray(resid)

        @jax.jit
        def jnp_chain(resid):
            coeffs = di._fwd_dct2d(resid, n)
            qabs, dq = di._quantize_analysis(
                coeffs, qp_row[4], qp_row[9], di._rp2(qp_row[1], ls),
                di._rp2(qp_row[6], ls), di._rp2(qp_row[0], ls),
                di._rp2(qp_row[5], ls), ls)
            return di._rate_dist(qabs, dq, resid, n, 8)[:3]

        t_j, _ = timeit(jnp_chain, x)
        t_p, _ = timeit(lambda v: fullloop(v, qp6, n, ls)[0], x)
        cn = min(n, 32)
        flops = 2 * b * n * n * cn * cn * 2  # fwd + inv GEMMs
        hbm = b * n * n * 4 * 2              # resid in, metrics out (approx)
        print(f"fullloop n={n:2d} B={b}: jnp {t_j*1e3:7.2f} ms  "
              f"pallas {t_p*1e3:7.2f} ms  speedup {t_j/t_p:5.2f}x  "
              f"({flops/t_p/1e9:6.1f} GFLOP/s, {hbm/t_p/2**30:6.1f} GiB/s)")


def bench_sad():
    from svt_av1_psyex_tpu.device.me import R2, _offset_table
    from svt_av1_psyex_tpu.ops.pallas.sad import sad_lattice

    rng = np.random.RandomState(1)
    for nsb in (240,):  # 720p worth of SBs
        tiles = jnp.asarray(rng.randint(0, 256, (nsb, 64, 64)), jnp.int32)
        wins = jnp.asarray(
            rng.randint(0, 256, (nsb, 64 + 2 * R2, 64 + 2 * R2)), jnp.int32)

        @jax.jit
        def jnp_chain(t1, win):
            def body2(_, off):
                cand = jax.lax.dynamic_slice(win, (0, off[0], off[1]),
                                             (nsb, 64, 64))
                d = jnp.abs(t1 - cand)
                return None, d.reshape(-1, 8, 8, 8, 8).sum(axis=(2, 4))

            _, lat = jax.lax.scan(body2, None, _offset_table(R2))
            return lat.transpose(1, 0, 2, 3)

        t_j, a = timeit(jnp_chain, tiles, wins)
        t_p, b = timeit(sad_lattice, tiles, wins)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        noff = (2 * R2 + 1) ** 2
        ops = nsb * noff * 64 * 64 * 2
        print(f"sad_lattice nSB={nsb}: jnp {t_j*1e3:7.2f} ms  "
              f"pallas {t_p*1e3:7.2f} ms  speedup {t_j/t_p:5.2f}x  "
              f"({ops/t_p/1e9:6.1f} Gop/s)")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    bench_fullloop()
    bench_sad()
