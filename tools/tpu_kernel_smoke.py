#!/usr/bin/env python3
"""On-hardware Mosaic smoke test for every Pallas kernel.

The pytest tier runs the kernels in interpret mode on CPU (conftest
pins jax to a virtual CPU mesh), which does NOT exercise Mosaic's
layout/alignment rules — kernels that pass the suite can still fail to
compile on a real chip (seen on v5e: dynamic lane slices, negative
sublane rotates, unaligned shape casts).  Run this on the TPU before
trusting a kernel change:

    python tools/tpu_kernel_smoke.py

Checks each kernel compiles through Mosaic AND matches its jnp/numpy
reference on device, and prints per-kernel wall time at realistic
batch sizes.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def check_sad() -> str:
    import jax
    import jax.numpy as jnp

    from svt_av1_psyex_tpu.device.me import R2, _offset_table
    from svt_av1_psyex_tpu.ops.pallas.sad import sad_lattice

    rng = np.random.RandomState(11)
    nsb = 4
    tiles = rng.randint(0, 256, (nsb, 64, 64)).astype(np.int32)
    wins = rng.randint(0, 256, (nsb, 64 + 2 * R2, 64 + 2 * R2)).astype(
        np.int32)
    got = np.asarray(sad_lattice(jnp.asarray(tiles), jnp.asarray(wins)))

    def body2(_, off):
        cand = jax.lax.dynamic_slice(jnp.asarray(wins),
                                     (0, off[0], off[1]), (nsb, 64, 64))
        d = jnp.abs(jnp.asarray(tiles) - cand)
        return None, d.reshape(-1, 8, 8, 8, 8).sum(axis=(2, 4))

    _, lat = jax.lax.scan(body2, None, _offset_table(R2))
    want = np.asarray(lat.transpose(1, 0, 2, 3))
    assert np.array_equal(got, want), "sad_lattice mismatch on device"

    big_t = jnp.asarray(rng.randint(0, 256, (240, 64, 64)).astype(np.int32))
    big_w = jnp.asarray(rng.randint(0, 256, (240, 80, 80)).astype(np.int32))
    sad_lattice(big_t, big_w).block_until_ready()
    t0 = time.perf_counter()
    sad_lattice(big_t, big_w).block_until_ready()
    return f"bit-exact; 240 SBs x 289 offs = {time.perf_counter()-t0:.3f}s"


def check_fullloop() -> str:
    import jax.numpy as jnp

    from svt_av1_psyex_tpu.device import intra as di
    from svt_av1_psyex_tpu.ops.pallas.fullloop import fullloop

    rng = np.random.RandomState(7)
    report = []
    for n in (4, 8, 16, 32):
        b = 300
        resid = (rng.randint(-64, 65, (b, n, n))
                 + rng.randint(-2, 3, (b, n, n)) * 40).astype(np.int32)
        qp_row = di.qp_row_for(80, 0, 0, 8)
        ls = 1 if n == 32 else 0
        qp6 = jnp.asarray([qp_row[4], qp_row[9], di._rp2(qp_row[1], ls),
                           di._rp2(qp_row[6], ls), di._rp2(qp_row[0], ls),
                           di._rp2(qp_row[5], ls)], jnp.float32)
        t0 = time.perf_counter()
        metrics, _ = fullloop(jnp.asarray(resid), qp6, n, ls)
        metrics = np.asarray(metrics)
        dt = time.perf_counter() - t0

        coeffs = di._fwd_dct2d(jnp.asarray(resid), n)
        qabs, dq = di._quantize_analysis(
            coeffs, qp_row[4], qp_row[9], di._rp2(qp_row[1], ls),
            di._rp2(qp_row[6], ls), di._rp2(qp_row[0], ls),
            di._rp2(qp_row[5], ls), ls)
        dist, rate, eob, _ = di._rate_dist(qabs, dq, jnp.asarray(resid),
                                           n, 8)
        assert np.allclose(metrics[:, 0], np.asarray(dist), rtol=1e-3,
                           atol=2.0), f"n={n} dist mismatch"
        eob_eq = np.mean(metrics[:, 2] == np.asarray(eob))
        assert eob_eq > 0.98, f"n={n} eob agreement {eob_eq}"
        report.append(f"n{n}:{dt*1e3:.0f}ms")
    return "matches jnp chain; first-call " + " ".join(report)


def check_fullloop_vmap() -> str:
    """intra_analysis_batch vmaps the kernel over frames — pallas's
    vmap rule rewrites every BlockSpec, which has its own Mosaic
    constraints (an SMEM spec broke here on v5e)."""
    import jax
    import jax.numpy as jnp

    from svt_av1_psyex_tpu.device import intra as di
    from svt_av1_psyex_tpu.ops.pallas.fullloop import fullloop

    rng = np.random.RandomState(3)
    f, b, n = 3, 256, 16
    resid = rng.randint(-64, 65, (f, b, n, n)).astype(np.int32)
    qp_row = di.qp_row_for(96, 0, 0, 8)
    qp6 = jnp.asarray([qp_row[4], qp_row[9], qp_row[1], qp_row[6],
                       qp_row[0], qp_row[5]], jnp.float32)
    qp6s = jnp.stack([qp6, qp6 * 1.25, qp6 * 0.75])

    batched = jax.vmap(lambda r, q: fullloop(r, q, n, 0)[0])(
        jnp.asarray(resid), qp6s)
    for i in range(f):
        single, _ = fullloop(jnp.asarray(resid[i]), qp6s[i], n, 0)
        assert np.allclose(np.asarray(batched)[i], np.asarray(single),
                           rtol=1e-4, atol=1.0), f"frame {i} mismatch"
    return "vmapped == per-frame"


def main() -> None:
    import jax

    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev.device_kind}")
    if dev.platform != "tpu":
        print("WARNING: not on TPU — this run does NOT validate Mosaic")
    failures = 0
    for name, fn in (("sad_lattice", check_sad),
                     ("fullloop", check_fullloop),
                     ("fullloop_vmap", check_fullloop_vmap)):
        try:
            note = fn()
            print(f"PASS {name}: {note}")
        except Exception as e:  # noqa: BLE001 — report every kernel
            failures += 1
            msg = str(e).splitlines()[0][:200] if str(e) else repr(e)
            print(f"FAIL {name}: {msg}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
