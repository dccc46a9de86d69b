#!/usr/bin/env python3
"""BD-rate harness: this encoder vs the reference build, matched settings.

For each clip and each CRF point, encodes with both encoders, decodes the
streams with dav1d, computes weighted YUV PSNR (6/1/1) against the source,
and integrates the classic Bjontegaard cubic-log-rate delta.

Usage:
  python tools/bdrate.py [--preset 6] [--crfs 25,32,39,46]
      [--clips blobs:320x180:48,texture:320x180:48]
      [--ref /root/repo/.refbin/SvtAv1EncApp] [-o bdrate.json]

Negative BD-rate = we need fewer bits for the same quality.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from fractions import Fraction
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import numpy as np


def _psnr_yuv(dec_frames, src_frames, bit_depth=8) -> float:
    """Weighted 6/1/1 PSNR over all frames."""
    maxv = (1 << bit_depth) - 1
    num = den = 0.0
    for dec, src in zip(dec_frames, src_frames):
        for i, wgt in enumerate((6.0, 1.0, 1.0)[: len(dec)]):
            dh, dw = dec[i].shape
            d = dec[i].astype(np.float64) - src[i][:dh, :dw]
            num += wgt * float((d * d).mean())
            den += wgt
    mse = max(num / den, 1e-10)
    return 10.0 * np.log10(maxv * maxv / mse)


def _ssim_luma(dec_frames, src_frames, bit_depth=8) -> float:
    """Mean luma SSIM (8x8 windows stepping 4, aom_ssim2 convention)."""
    maxv = (1 << bit_depth) - 1
    c1 = (0.01 * maxv) ** 2
    c2 = (0.03 * maxv) ** 2
    tot = n = 0.0
    for dec, src in zip(dec_frames, src_frames):
        a = dec[0].astype(np.float64)
        dh, dw = a.shape
        b = src[0][:dh, :dw].astype(np.float64)
        # 8x8 windows stepping 4: integral-image means/moments
        ii = lambda x: x.cumsum(0).cumsum(1)  # noqa: E731
        pad = lambda x: np.pad(x, ((1, 0), (1, 0)))  # noqa: E731
        sa, sb = pad(ii(a)), pad(ii(b))
        saa, sbb = pad(ii(a * a)), pad(ii(b * b))
        sab = pad(ii(a * b))
        ys = np.arange(0, dh - 7, 4)
        xs = np.arange(0, dw - 7, 4)
        if len(ys) == 0 or len(xs) == 0:
            continue
        Y, X = np.meshgrid(ys, xs, indexing="ij")

        def win(s):
            return (s[Y + 8, X + 8] - s[Y, X + 8] - s[Y + 8, X]
                    + s[Y, X]) / 64.0

        ma, mb = win(sa), win(sb)
        va = win(saa) - ma * ma
        vb = win(sbb) - mb * mb
        cab = win(sab) - ma * mb
        ssim = ((2 * ma * mb + c1) * (2 * cab + c2)
                / ((ma * ma + mb * mb + c1) * (va + vb + c2)))
        tot += float(ssim.mean())
        n += 1
    return tot / max(n, 1)


def bd_rate(rate_a, psnr_a, rate_b, psnr_b) -> float:
    """Bjontegaard delta rate (%) of B vs A (negative = B cheaper).

    PCHIP integration (the modern BD convention, e.g. JVET/libaom
    tools): cubic polyfit explodes on clustered quality points."""
    from scipy.interpolate import PchipInterpolator

    def prep(psnr, rate):
        order = np.argsort(psnr)
        p = np.asarray(psnr, float)[order]
        r = np.log(np.asarray(rate, float))[order]
        # strictly increasing x for pchip
        keep = np.concatenate([[True], np.diff(p) > 1e-9])
        return p[keep], r[keep]

    pa_x, la = prep(psnr_a, rate_a)
    pb_x, lb = prep(psnr_b, rate_b)
    lo = max(pa_x.min(), pb_x.min())
    hi = min(pa_x.max(), pb_x.max())
    if hi <= lo or len(pa_x) < 2 or len(pb_x) < 2:
        return float("nan")
    ia = PchipInterpolator(pa_x, la).antiderivative()
    ib = PchipInterpolator(pb_x, lb).antiderivative()
    va = float(ia(hi) - ia(lo))
    vb = float(ib(hi) - ib(lo))
    avg = (vb - va) / (hi - lo)
    return float((np.exp(avg) - 1.0) * 100.0)


def make_clip(kind: str, w: int, h: int, frames: int, path: Path):
    from mkclip import synth_frame

    from svt_av1_psyex_tpu.utils.y4m import VideoFormat, Y4MWriter

    fmt = VideoFormat(w, h, fps=Fraction(30, 1))
    src = []
    with open(path, "wb") as fh:
        wr = Y4MWriter(fh, fmt)
        for t in range(frames):
            f = synth_frame(fmt, t, kind)
            src.append(f)
            wr.write_frame(f)
    return src


def run_ref(ref_bin: str, y4m: Path, ivf: Path, preset: int, crf: int):
    env = dict(os.environ, LD_LIBRARY_PATH=str(Path(ref_bin).parent))
    t0 = time.perf_counter()
    subprocess.run([ref_bin, "-i", str(y4m), "-b", str(ivf),
                    "--preset", str(preset), "--crf", str(crf),
                    "--lp", "1"],
                   check=True, capture_output=True, env=env)
    return time.perf_counter() - t0


def run_ours(y4m: Path, ivf: Path, preset: int, crf: int,
             extra_env: dict | None = None):
    env = dict(os.environ)
    extra_args = []
    if extra_env:
        for k, v in extra_env.items():
            if k == "ARGS":  # extra CLI tokens, space-separated
                extra_args = v.split()
            else:
                env[k] = v
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-m", "svt_av1_psyex_tpu.app.main",
                    "-i", str(y4m), "-b", str(ivf),
                    "--preset", str(preset), "--crf", str(crf)]
                   + extra_args,
                   check=True, capture_output=True, cwd=REPO, env=env)
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", type=int, default=6)
    ap.add_argument("--crfs", default="25,32,39,46")
    ap.add_argument("--clips", default="blobs:448x256:48")
    ap.add_argument("--ref", default=str(REPO / ".refbin" / "SvtAv1EncApp"))
    ap.add_argument("--encoders", default="ref,ours",
                    help="comma list of name[=ENV1:v1;ENV2:v2]; name "
                         "'ref' runs the reference binary, anything else "
                         "runs our CLI with the given env overrides. "
                         "BD-rates are reported vs the FIRST encoder.")
    ap.add_argument("-o", "--output", default="")
    args = ap.parse_args()

    from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf

    encs = []  # (name, env_or_None); None env = reference binary
    for tok in args.encoders.split(","):
        if "=" in tok:
            name, envs = tok.split("=", 1)
            env = dict(kv.split(":", 1) for kv in envs.split(";") if kv)
        else:
            name, env = tok, {}
        encs.append((name, None if name == "ref" else env))

    crfs = [int(x) for x in args.crfs.split(",")]
    results = {}
    with tempfile.TemporaryDirectory() as td:
        tdp = Path(td)
        for spec in args.clips.split(","):
            kind, size, n = spec.split(":")
            w, h = (int(x) for x in size.split("x"))
            y4m = tdp / f"{kind}.y4m"
            src = make_clip(kind, w, h, int(n), y4m)
            pts = {name: {"rate": [], "psnr": [], "ssim": [],
                          "ssim_db": [], "fps": []}
                   for name, _ in encs}
            for crf in crfs:
                for who, env in encs:
                    ivf = tdp / f"{kind}_{who}_{crf}.ivf"
                    if env is None:
                        dt = run_ref(args.ref, y4m, ivf, args.preset, crf)
                    else:
                        dt = run_ours(y4m, ivf, args.preset, crf, env)
                    dec = decode_ivf(ivf)
                    pts[who]["rate"].append(ivf.stat().st_size)
                    pts[who]["psnr"].append(_psnr_yuv(dec, src))
                    ssim = _ssim_luma(dec, src)
                    pts[who]["ssim"].append(ssim)
                    # SSIM in dB so the Bjontegaard integral behaves
                    pts[who]["ssim_db"].append(
                        -10.0 * np.log10(max(1.0 - ssim, 1e-10)))
                    pts[who]["fps"].append(int(n) / dt)
                    print(f"{kind} crf{crf} {who}: "
                          f"{ivf.stat().st_size}B "
                          f"{pts[who]['psnr'][-1]:.3f}dB "
                          f"ssim {ssim:.5f} "
                          f"{pts[who]['fps'][-1]:.2f}fps", flush=True)
            base = encs[0][0]
            bds = {}
            bds_ssim = {}
            for who, _ in encs[1:]:
                bds[who] = bd_rate(pts[base]["rate"], pts[base]["psnr"],
                                   pts[who]["rate"], pts[who]["psnr"])
                bds_ssim[who] = bd_rate(
                    pts[base]["rate"], pts[base]["ssim_db"],
                    pts[who]["rate"], pts[who]["ssim_db"])
                print(f"== {kind}: BD-rate ({who} vs {base}) = "
                      f"{bds[who]:+.2f}% (PSNR) / "
                      f"{bds_ssim[who]:+.2f}% (SSIM)", flush=True)
            results[kind] = {"points": pts,
                             "bd_rate_pct_vs_" + base: bds,
                             "bd_rate_ssim_pct_vs_" + base: bds_ssim}
    if args.output:
        Path(args.output).write_text(json.dumps(results, indent=1))
    print(json.dumps({k: {w: round(b, 2)
                          for w, b in next(iter(
                              vv for kk, vv in v.items()
                              if kk.startswith("bd_rate"))).items()}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
