#!/usr/bin/env python3
"""Transcribe the normative AV1 transform butterfly networks to data tables.

The AV1 specification (section 7.13.3, "Inverse transform process" and its
1D sub-processes) normatively defines the integer butterfly networks for
DCT4..64 / ADST8,16 with exact cospi weights and per-stage rounding. The
reference tree carries these networks as straight-line C (libaom heritage:
Source/Lib/Codec/inv_transforms.c, transforms.c). This tool parses that
straight-line form into compact op tables so the runtime can execute them
vectorized (numpy/JAX) — transcription of normative math, not code reuse.

Each op: [dst, src0, w0, src1, w1, kind]
  w = ["c", idx, sign]  cospi[idx] * sign
      ["i", val]        integer weight val (covers plain add/sub/pass/neg)
      ["z"]             zero (unused operand)
  kind = "btf"  -> round_shift(w0*s0 + w1*s1, cos_bit)
         "raw"  -> w0*s0 + w1*s1, clamped on the inverse side (clamp_value)
         "rawnc"-> w0*s0 + w1*s1, no clamp (forward side)

Output: svt_av1_psyex_tpu/bitstream/tables/txfm_networks.json
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REF = Path("/root/reference/Source/Lib/Codec")
OUT = Path(__file__).resolve().parent.parent / "svt_av1_psyex_tpu" / "bitstream" / "tables" / "txfm_networks.json"

FUNCS = {
    "inv_transforms.c": [
        ("svt_av1_idct4_new", "idct4"),
        ("svt_av1_idct8_new", "idct8"),
        ("svt_av1_idct16_new", "idct16"),
        ("svt_av1_idct32_new", "idct32"),
        ("svt_av1_idct64_new", "idct64"),
        ("svt_av1_iadst8_new", "iadst8"),
        ("svt_av1_iadst16_new", "iadst16"),
    ],
    "transforms.c": [
        ("svt_av1_fdct4_new", "fdct4"),
        ("svt_av1_fdct8_new", "fdct8"),
        ("svt_av1_fdct16_new", "fdct16"),
        ("svt_av1_fdct32_new", "fdct32"),
        ("svt_av1_fdct64_new", "fdct64"),
        ("svt_av1_fadst8_new", "fadst8"),
        ("svt_av1_fadst16_new", "fadst16"),
    ],
}

_ASSIGN = re.compile(r"bf1\[(\d+)\]\s*=\s*(.+?);")
_BTF = re.compile(
    r"half_btf\(\s*(-?)cospi\[(\d+)\]\s*,\s*bf0\[(\d+)\]\s*,\s*(-?)cospi\[(\d+)\]\s*,\s*bf0\[(\d+)\]\s*,\s*cos_bit\s*\)"
)
_CLAMP = re.compile(r"clamp_value\(\s*(.+?)\s*,\s*stage_range\[stage\]\s*\)")
_ADDSUB = re.compile(r"^(-?)\s*(?:bf0|input)\[(\d+)\]\s*(?:([+-])\s*(?:bf0|input)\[(\d+)\])?$")


def _w(sign: str, idx: str):
    return ["c", int(idx), -1 if sign == "-" else 1]


def parse_function(text: str, cname: str):
    m = re.search(rf"void {re.escape(cname)}\(", text)
    assert m, cname
    # function body up to next function definition
    body_start = text.index("{", m.end())
    depth = 0
    for i in range(body_start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                body = text[body_start : i + 1]
                break
    # split into stages on "stage++" (inverse style) or "// stage N" comments
    # (forward style); protect markers, then drop remaining // comments
    # Some functions advance stages with `stage++`, some with `// stage N`
    # comments, some mix both (iadst8/16) — a marker of either kind starts a
    # new stage, but `stage++` immediately following a comment marker is the
    # same stage.
    body = re.sub(r"//\s*stage\s*\d+;?(\s*stage\+\+;)?", "@STAGE@", body)
    body = body.replace("stage++", "@STAGE@")
    body = re.sub(r"//[^\n]*", " ", body)
    chunks = body.split("@STAGE@")
    stages = []
    for chunk in chunks[1:]:
        ops = []
        for am in _ASSIGN.finditer(chunk):
            dst = int(am.group(1))
            rhs = am.group(2).strip()
            kind = "rawnc"
            cm = _CLAMP.fullmatch(rhs)
            if cm:
                rhs = cm.group(1).strip()
                kind = "raw"
            bm = _BTF.fullmatch(rhs)
            if bm:
                ops.append([dst, int(bm.group(3)), _w(bm.group(1), bm.group(2)),
                            int(bm.group(6)), _w(bm.group(4), bm.group(5)), "btf"])
                continue
            am2 = _ADDSUB.fullmatch(rhs)
            if not am2:
                raise ValueError(f"{cname}: unparsed rhs {rhs!r}")
            s0 = -1 if am2.group(1) == "-" else 1
            src0 = int(am2.group(2))
            if am2.group(3):
                s1 = -1 if am2.group(3) == "-" else 1
                ops.append([dst, src0, ["i", s0], int(am2.group(4)), ["i", s1], kind])
            else:
                ops.append([dst, src0, ["i", s0], 0, ["z"], kind])
        if ops:  # "// stage 0;" markers introduce empty chunks
            stages.append(ops)
    return stages


def main() -> None:
    nets = {}
    for fname, funcs in FUNCS.items():
        text = (REF / fname).read_text()
        text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
        # // comments are handled per-function (stage markers must survive)
        for cname, outname in funcs:
            nets[outname] = parse_function(text, cname)
            n_ops = sum(len(s) for s in nets[outname])
            print(f"{outname}: {len(nets[outname])} stages, {n_ops} ops")
    OUT.write_text(json.dumps(nets))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
