#!/usr/bin/env python3
"""Extract normative AV1 specification constant tables into .npz data.

The AV1 specification *mandates* exact values for: default CDF
initialization tables, quantizer step lookup tables, and coefficient scan
orders. Every conformant implementation carries bit-identical copies of
these constants (spec sections 5.9/7.x and the Default_* tables). This
tool parses them out of the reference tree's table files (which in turn
carry libaom's verbatim copies of the spec tables) and stores them as
numpy arrays. No executable code is derived from the reference; only
normative constant data required for bitstream conformance.

Sources parsed:
  Source/Lib/Codec/cabac_context_model.c  (default CDFs, spec: Default_* tables)
  Source/Lib/Codec/coefficients.h         (scan orders, spec 5.x scan tables)
  Source/Lib/Codec/inv_transforms.c       (dc/ac qlookup, spec dc_q/ac_q tables)

Output: svt_av1_psyex_tpu/bitstream/tables/av1_tables.npz

CDF convention in the output: spec orientation (increasing cumulative
probabilities, last entry 32768); the trailing adaptation counter slot is
NOT stored (runtime state, always initialized to zero).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/Source/Lib/Codec")
OUT_DIR = Path(__file__).resolve().parent.parent / "svt_av1_psyex_tpu" / "bitstream" / "tables"

PROB_TOP = 1 << 15


def _strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def _balanced_braces(text: str, start: int) -> tuple[str, int]:
    """Return the {...} block starting at text[start] and the end index."""
    assert text[start] == "{"
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return text[start : i + 1], i + 1
    raise ValueError("unbalanced braces")


_ARITH = re.compile(r"^[\d\s+*/()\-]+$")


def _eval_int(expr: str) -> int:
    expr = expr.strip()
    if not _ARITH.match(expr):
        raise ValueError(f"non-arithmetic initializer entry: {expr!r}")
    return int(eval(expr, {"__builtins__": {}}))  # noqa: S307 - arithmetic only


def _parse_init(block: str):
    """Parse a C initializer {..} into nested python lists of ints.

    AOM_CDFn(a1,...,a_{n-1}) expands to [a1,...,a_{n-1}, 32768].
    """
    block = re.sub(
        r"AOM_CDF\d+\s*\(([^()]*(?:\([^()]*\)[^()]*)*)\)",
        lambda m: m.group(1) + f", {PROB_TOP}",
        block,
    )

    pos = 0

    def parse(i: int):
        assert block[i] == "{"
        i += 1
        items = []
        buf = ""
        while True:
            c = block[i]
            if c == "{":
                sub, i = parse(i)
                items.append(sub)
            elif c == "}":
                if buf.strip():
                    items.append(_eval_int(buf))
                return items, i + 1
            elif c == ",":
                if buf.strip():
                    items.append(_eval_int(buf))
                buf = ""
                i += 1
            else:
                buf += c
                i += 1

    out, _ = parse(pos)
    return out


def _pad_ragged(nested):
    """Pad ragged innermost lists with -1 (several AV1 CDF families have
    per-context alphabet sizes, e.g. partition/tx_size/palette/ext_tx).
    Runtime trims each row at its 32768 terminator."""
    if isinstance(nested, int):
        return nested
    if all(isinstance(x, int) for x in nested):
        return nested

    def max_len(node, depth, acc):
        if isinstance(node[0], int):
            acc[depth] = max(acc.get(depth, 0), len(node))
        else:
            for sub in node:
                max_len(sub, depth + 1, acc)

    acc: dict[int, int] = {}
    max_len(nested, 0, acc)

    def pad(node, depth):
        if isinstance(node[0], int):
            return node + [-1] * (acc[depth] - len(node))
        return [pad(sub, depth + 1) for sub in node]

    return pad(nested, 0)


def _to_array(nested, name: str) -> np.ndarray:
    try:
        return np.array(nested, dtype=np.int32)
    except ValueError:
        return np.array(_pad_ragged(nested), dtype=np.int32)


def extract_cdfs(text: str) -> dict[str, np.ndarray]:
    out = {}
    decl = re.compile(r"(?:static\s+)?const\s+AomCdfProb\s+(\w+)\s*((?:\[[^\]]*\]\s*)+)=\s*\{")
    for m in decl.finditer(text):
        name = m.group(1)
        block, _ = _balanced_braces(text, m.end() - 1)
        try:
            nested = _parse_init(block)
            out[name] = _to_array(nested, name)
        except ValueError as e:
            print(f"  skip {name}: {e}", file=sys.stderr)
    return out


def extract_nmv(text: str) -> dict[str, np.ndarray]:
    """Parse default_nmv_context (struct layout per AV1 spec MV coding).

    Field order (matches both spec Default_Mv_* tables and the C struct):
      joints_cdf[4]; then per component (vertical, horizontal):
        classes_cdf[11], class0_fp_cdf[2][4], fp_cdf[4], sign_cdf[2],
        class0_hp_cdf[2], hp_cdf[2], class0_cdf[2], bits_cdf[10][2]
    """
    m = re.search(r"const\s+NmvContext\s+default_nmv_context\s*=\s*\{", text)
    if not m:
        return {}
    block, _ = _balanced_braces(text, m.end() - 1)
    nested = _parse_init(block)
    joints = np.array(nested[0], dtype=np.int32)
    comps = nested[1]
    fields = [
        ("classes", (11,)),
        ("class0_fp", (2, 4)),
        ("fp", (4,)),
        ("sign", (2,)),
        ("class0_hp", (2,)),
        ("hp", (2,)),
        ("class0", (2,)),
        ("bits", (10, 2)),
    ]
    out = {"nmv_joints_cdf": joints}
    for fi, (fname, shape) in enumerate(fields):
        stacked = np.stack(
            [np.array(comps[c][fi], dtype=np.int32).reshape(shape) for c in range(2)]
        )
        out[f"nmv_{fname}_cdf"] = stacked
    return out


def extract_scans(text: str) -> dict[str, np.ndarray]:
    out = {}
    decl = re.compile(
        r"DECLARE_ALIGNED\(\s*\d+\s*,\s*static\s+const\s+int16_t\s*,\s*(\w+)\[(\d+)\]\s*\)\s*=\s*\{"
    )
    for m in decl.finditer(text):
        name, n = m.group(1), int(m.group(2))
        if not (name.startswith(("default_scan", "mcol_scan", "mrow_scan"))):
            continue
        block, _ = _balanced_braces(text, m.end() - 1)
        vals = _parse_init(block)
        arr = np.array(vals, dtype=np.int32)
        assert arr.size == n, (name, arr.size, n)
        out[name] = arr
    return out


def extract_qlookup(text: str) -> dict[str, np.ndarray]:
    out = {}
    decl = re.compile(r"static\s+const\s+int16_t\s+((?:dc|ac)_qlookup(?:_1[02])?_QTX)\[[^\]]*\]\s*=\s*\{")
    for m in decl.finditer(text):
        name = m.group(1)
        block, _ = _balanced_braces(text, m.end() - 1)
        vals = _parse_init(block)
        arr = np.array(vals, dtype=np.int32)
        assert arr.size == 256, (name, arr.size)
        key = {
            "dc_qlookup_QTX": "dc_qlookup_8",
            "dc_qlookup_10_QTX": "dc_qlookup_10",
            "dc_qlookup_12_QTX": "dc_qlookup_12",
            "ac_qlookup_QTX": "ac_qlookup_8",
            "ac_qlookup_10_QTX": "ac_qlookup_10",
            "ac_qlookup_12_QTX": "ac_qlookup_12",
        }[name]
        out[key] = arr
    return out


def extract_trig(text: str) -> dict[str, np.ndarray]:
    """cospi/sinpi tables (normative transform constants, spec 7.13.3)."""
    out = {}
    for cname, key, shape in [
        ("svt_aom_eb_av1_cospi_arr_data", "cospi_arr_data", (7, 64)),
        ("svt_aom_eb_av1_sinpi_arr_data", "sinpi_arr_data", (7, 5)),
    ]:
        m = re.search(rf"{cname}\s*\[\d+\]\s*\[\d+\]\s*=\s*\{{", text)
        if not m:
            continue
        block, _ = _balanced_braces(text, m.end() - 1)
        arr = np.array(_parse_init(block), dtype=np.int32)
        assert arr.shape == shape, (cname, arr.shape)
        out[key] = arr
    return out


def extract_subpel_filters(text: str) -> dict[str, np.ndarray]:
    """Normative sub-pel interpolation kernels (spec 7.11.3.5 Subpel_Filters)."""
    out = {}
    for name in ("sub_pel_filters_8", "sub_pel_filters_8smooth", "sub_pel_filters_8sharp",
                 "bilinear_filters", "sub_pel_filters_4", "sub_pel_filters_4smooth"):
        m = re.search(rf"InterpKernel,\s*{name}\[SUBPEL_SHIFTS\]\)\s*=\s*\{{", text)
        if not m:
            continue
        block, _ = _balanced_braces(text, m.end() - 1)
        arr = np.array(_parse_init(block), dtype=np.int32)
        assert arr.shape == (16, 8), (name, arr.shape)
        out[name] = arr
    return out


def extract_warp_filter(text: str) -> dict[str, np.ndarray]:
    """Normative warp interpolation kernels (spec 7.11.3.7 Warp_Filters,
    193 x 8 int16 covering offsets [-1, 2) * 64).  The source carries two
    preprocessor variants; the spec one is WARPEDPIXEL_PREC_BITS == 6."""
    m = re.search(r"svt_aom_warped_filter\[[^\]]*\]\[8\]\s*=\s*\{", text)
    assert m, "warped_filter not found"
    start = text.index("WARPEDPIXEL_PREC_BITS == 6", m.end())
    end = text.index("WARPEDPIXEL_PREC_BITS == 5", start)
    rows = re.findall(r"\{([^{}]+)\}", text[start:end])
    arr = np.array([[_eval_int(v) for v in r.split(",")] for r in rows],
                   dtype=np.int32)
    assert arr.shape == (193, 8), arr.shape
    assert (arr.sum(axis=1) == 128).all()
    return {"warped_filter": arr}


def main() -> None:
    tables: dict[str, np.ndarray] = {}

    cc = _strip_comments((REF / "cabac_context_model.c").read_text())
    cdfs = extract_cdfs(cc)
    print(f"cabac_context_model.c: {len(cdfs)} CDF arrays")
    tables.update(cdfs)
    nmv = extract_nmv(cc)
    print(f"nmv context: {len(nmv)} arrays")
    tables.update(nmv)

    co = _strip_comments((REF / "coefficients.h").read_text())
    scans = extract_scans(co)
    print(f"coefficients.h: {len(scans)} scan arrays")
    tables.update(scans)

    wm = _strip_comments((REF / "warped_motion.c").read_text())
    wf = extract_warp_filter(wm)
    print("warped_motion.c: warped_filter")
    tables.update(wf)

    it = _strip_comments((REF / "inv_transforms.c").read_text())
    ql = extract_qlookup(it)
    print(f"inv_transforms.c: {len(ql)} qlookup arrays")
    tables.update(ql)
    trig = extract_trig(it)
    print(f"inv_transforms.c: {len(trig)} trig arrays")
    tables.update(trig)

    # smooth-prediction weights (spec Sm_Weights table)
    ip = _strip_comments((REF / "intra_prediction.c").read_text())
    m = re.search(r"sm_weight_arrays\[[^\]]*\]\s*=\s*\{", ip)
    assert m
    block, _ = _balanced_braces(ip, m.end() - 1)
    arr = np.array(_parse_init(block), dtype=np.int32)
    assert arr.size == 128, arr.size
    tables["sm_weight_arrays"] = arr
    print("intra_prediction.c: sm_weight_arrays")

    # directional-prediction derivative table (spec Dr_Intra_Derivative)
    m = re.search(r"eb_dr_intra_derivative\[90\]\s*=\s*\{", ip)
    assert m
    block, _ = _balanced_braces(ip, m.end() - 1)
    arr = np.array(_parse_init(block), dtype=np.int32)
    assert arr.size == 90
    tables["dr_intra_derivative"] = arr
    print("intra_prediction.c: dr_intra_derivative")

    # has_top_right / has_bottom_left availability bitmaps (spec-derived
    # z-order coding-precedence tables, per block size + vert-partition
    # variants)
    n_avail = 0
    for m in re.finditer(r"static uint8_t (has_(?:tr|bl)(?:_vert)?_\d+x\d+)\[(\d+)\]\s*=\s*\{", ip):
        name, size = m.group(1), int(m.group(2))
        block, _ = _balanced_braces(ip, m.end() - 1)
        arr = np.array(_parse_init(block), dtype=np.int32)
        assert arr.size == size, (name, arr.size, size)
        tables[name] = arr
        n_avail += 1
    print(f"intra_prediction.c: {n_avail} has_tr/has_bl tables")

    inter = _strip_comments((REF / "inter_prediction.c").read_text())
    sp = extract_subpel_filters(inter)
    print(f"inter_prediction.c: {len(sp)} subpel filter tables")
    tables.update(sp)

    # quantizer matrices (spec Quantizer_Matrix tables; q_matrices.h
    # wt/iwt concatenated per level x plane-class over adjusted tx sizes)
    qmtext = _strip_comments((REF / "q_matrices.h").read_text())
    for cname, key in (("wt_matrix_ref", "qm_wt"),
                       ("iwt_matrix_ref", "qm_iwt")):
        m = re.search(rf"{cname}\[NUM_QM_LEVELS\]\[2\]\[QM_TOTAL_SIZE\]\s*=\s*\{{", qmtext)
        assert m, cname
        block, _ = _balanced_braces(qmtext, m.end() - 1)
        arr = np.array(_parse_init(block), dtype=np.int32)
        assert arr.shape == (16, 2, 3344), (cname, arr.shape)
        tables[key] = arr
    print("q_matrices.h: qm_wt + qm_iwt")

    # film-grain gaussian sequence (spec 7.18.3.1 Gaussian_Sequence)
    gs = _strip_comments((REF / "grainSynthesis.c").read_text())
    m = re.search(r"gaussian_sequence\[2048\]\s*=\s*\{", gs)
    assert m
    block, _ = _balanced_braces(gs, m.end() - 1)
    arr = np.array(_parse_init(block), dtype=np.int32)
    assert arr.size == 2048, arr.size
    tables["gaussian_sequence"] = arr
    print("grainSynthesis.c: gaussian_sequence")

    # recursive filter-intra taps (spec 7.11.2.3 Intra_Filter_Taps)
    fi = _strip_comments(
        (REF.parent / "C_DEFAULT" / "filterintra_c.c").read_text())
    m = re.search(r"eb_av1_filter_intra_taps\[FILTER_INTRA_MODES\]\[8\]\[8\]\)\s*=\s*\{", fi)
    assert m
    block, _ = _balanced_braces(fi, m.end() - 1)
    arr = np.array(_parse_init(block), dtype=np.int32)
    assert arr.shape == (5, 8, 8), arr.shape
    tables["filter_intra_taps"] = arr
    print("filterintra_c.c: filter_intra_taps")

    OUT_DIR.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT_DIR / "av1_tables.npz", **tables)
    manifest = {k: list(v.shape) for k, v in sorted(tables.items())}
    (OUT_DIR / "manifest.json").write_text(json.dumps(manifest, indent=1))
    print(f"wrote {len(tables)} tables to {OUT_DIR / 'av1_tables.npz'}")


if __name__ == "__main__":
    main()
