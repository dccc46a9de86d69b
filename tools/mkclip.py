#!/usr/bin/env python3
"""Synthesize deterministic test clips (y4m) — gradients + moving blobs.

Mirrors the role of the reference's DummyVideoSource (test/e2e_test/
DummyVideoSource.h): fast, file-free-ish synthetic content for e2e tests.
"""

from __future__ import annotations

import argparse
import sys
from fractions import Fraction
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from svt_av1_psyex_tpu.utils.y4m import VideoFormat, Y4MWriter


def synth_frame(fmt: VideoFormat, t: int, kind: str = "blobs") -> list[np.ndarray]:
    h, w = fmt.height, fmt.width
    maxv = (1 << fmt.bit_depth) - 1
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    if kind == "flat":
        y = np.full((h, w), maxv // 2, np.float32)
    elif kind == "gradient":
        y = (xx / w + yy / h) * 0.5 * maxv
    elif kind == "texture":
        # band-limited texture translating at a subpel rate: stresses
        # interpolation filters, TF and grain tools
        rng = np.random.RandomState(99)
        big = rng.normal(0, 1, (h + 64, w + 64)).astype(np.float32)
        for _ in range(2):  # cheap low-pass to band-limit
            big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
                   + np.roll(big, (1, 1), (0, 1))) * 0.25
        ox, oy = (t * 5) % 48, (t * 3) % 48
        tex = big[oy : oy + h, ox : ox + w]
        y = (0.5 + 0.28 * np.sin(2 * np.pi * (xx + 2.0 * t) / 97.0)) * maxv
        y += tex * 0.18 * maxv
    elif kind == "noise":
        # static structured scene + heavy frame-varying gaussian noise:
        # stresses the noise model, TF decay and grain synthesis
        rng = np.random.RandomState(1000 + t)
        y = (0.5 + 0.3 * np.sin(2 * np.pi * xx / 53.0)
             * np.cos(2 * np.pi * yy / 41.0)) * maxv
        y += rng.normal(0, 0.03 * maxv, (h, w)).astype(np.float32)
    else:  # blobs: smooth moving gaussians over a gradient
        y = (xx / w) * 0.35 * maxv + (yy / h) * 0.15 * maxv
        rng = np.random.RandomState(1234)
        for i in range(4):
            cx = (0.2 + 0.15 * i) * w + 6.0 * t * (1 + i * 0.3)
            cy = (0.3 + 0.12 * i) * h + 3.0 * t * (1 - i * 0.2)
            cx %= w
            cy %= h
            sig = 0.08 * min(w, h) * (1 + 0.5 * i)
            y += (0.45 * maxv) * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sig**2)))
        y += rng.normal(0, 0.003 * maxv, (h, w)).astype(np.float32)
    y = np.clip(y, 0, maxv).astype(fmt.dtype)
    if fmt.subsampling == "400":
        return [y]
    ch, cw = fmt.chroma_size
    cyy, cxx = np.mgrid[0:ch, 0:cw].astype(np.float32)
    u = (0.5 + 0.25 * np.sin(2 * np.pi * (cxx / cw + 0.02 * t))) * maxv
    v = (0.5 + 0.25 * np.cos(2 * np.pi * (cyy / ch - 0.015 * t))) * maxv
    return [y, np.clip(u, 0, maxv).astype(fmt.dtype), np.clip(v, 0, maxv).astype(fmt.dtype)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="64x64")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--subsampling", default="420")
    ap.add_argument("--kind", default="blobs",
                    choices=["blobs", "gradient", "flat", "texture",
                             "noise"])
    ap.add_argument("-o", "--output", required=True)
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    fmt = VideoFormat(w, h, args.depth, args.subsampling, Fraction(30, 1))
    with open(args.output, "wb") as fh:
        wr = Y4MWriter(fh, fmt)
        for t in range(args.frames):
            wr.write_frame(synth_frame(fmt, t, args.kind))
    print(f"wrote {args.frames} frames {w}x{h} {args.depth}bit {args.subsampling} -> {args.output}")


if __name__ == "__main__":
    main()
