"""Global-motion parameter coding: encoder vs a spec-literal decoder.

The writer in bitstream/headers.py inverts the spec's decode_subexp /
decode_unsigned_subexp_with_ref / decode_signed_subexp_with_ref /
read_global_param chain (5.9.24-5.9.27); this test decodes its output
with a line-by-line transcription of those decode processes."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.bitstream.bitw import BitReader, BitWriter
from svt_av1_psyex_tpu.bitstream.headers import (
    GM_AFFINE,
    GM_ROTZOOM,
    GM_TRANSLATION,
    _write_global_param,
    _write_signed_subexp_ref,
    quantize_gm_param,
)

pytestmark = pytest.mark.quick


def _floor_log2(n):
    return n.bit_length() - 1


def _read_ns(r, n):
    w = _floor_log2(n) + 1
    m = (1 << w) - n
    v = r.f(w - 1)
    if v < m:
        return v
    return (v << 1) - m + r.f(1)


def _decode_subexp(r, num_syms):
    i = 0
    mk = 0
    k = 3
    while True:
        b2 = k + i - 1 if i else k
        a = 1 << b2
        if num_syms <= mk + 3 * a:
            return _read_ns(r, num_syms - mk) + mk
        if r.f(1):
            i += 1
            mk += a
        else:
            return r.f(b2) + mk


def _inverse_recenter(rr, v):
    # dav1d/libaom parity: even -> rr + v/2, odd -> rr - (v+1)/2
    if v > 2 * rr:
        return v
    if v & 1:
        return rr - ((v + 1) >> 1)
    return rr + (v >> 1)


def _decode_signed_subexp_with_ref(r, low, high, ref):
    mx = high - low
    v = _decode_subexp(r, mx)
    ref -= low
    if (ref << 1) <= mx:
        return _inverse_recenter(ref, v) + low
    return mx - 1 - _inverse_recenter(mx - 1 - ref, v) + low


def _decode_global_param(r, gm_type, idx, prev, allow_hp=False):
    abs_bits, prec_bits = 12, 15
    if idx < 2:
        if gm_type == GM_TRANSLATION:
            abs_bits = 9 - (0 if allow_hp else 1)
            prec_bits = 3 - (0 if allow_hp else 1)
        else:
            abs_bits, prec_bits = 12, 6
    prec_diff = 16 - prec_bits
    rnd = (1 << 16) if (idx % 3) == 2 else 0
    sub = (1 << prec_bits) if (idx % 3) == 2 else 0
    mx = 1 << abs_bits
    rr = (prev >> prec_diff) - sub
    return (_decode_signed_subexp_with_ref(r, -mx, mx + 1, rr)
            << prec_diff) + rnd  # sub only recenters the reference


def test_signed_subexp_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(500):
        mx = int(rng.integers(2, 1 << 13))
        low, high = -mx, mx + 1
        r = int(rng.integers(low, high))
        x = int(rng.integers(low, high))
        w = BitWriter()
        _write_signed_subexp_ref(w, x, low, high, r)
        w.f(1, 1)  # stop bit so flush padding can't be misread
        rd = BitReader(w.data_unaligned())
        got = _decode_signed_subexp_with_ref(rd, low, high, r)
        assert got == x, (x, r, mx, got)


@pytest.mark.parametrize("gm_type", [GM_TRANSLATION, GM_ROTZOOM, GM_AFFINE])
def test_global_param_roundtrip(gm_type):
    rng = np.random.default_rng(5 + gm_type)
    one = 1 << 16
    for _ in range(300):
        idx = int(rng.integers(0, 6))
        if gm_type == GM_TRANSLATION and idx >= 2:
            continue
        raw = (one if idx in (2, 5) else 0) + int(rng.integers(-9000, 9000))
        val = quantize_gm_param(gm_type, idx, raw)
        prev_raw = (one if idx in (2, 5) else 0) + int(
            rng.integers(-9000, 9000))
        prev = quantize_gm_param(gm_type, idx, prev_raw)
        w = BitWriter()
        _write_global_param(w, gm_type, idx, val, prev, False)
        w.f(1, 1)
        rd = BitReader(w.data_unaligned())
        got = _decode_global_param(rd, gm_type, idx, prev)
        assert got == val, (gm_type, idx, raw, val, got)
