"""Round-trip tests for the raw bit writer/reader (spec descriptor codes)."""

import random

from svt_av1_psyex_tpu.bitstream.bitw import BitReader, BitWriter


def test_f_roundtrip():
    rnd = random.Random(0)
    vals = [(rnd.randrange(1 << n), n) for n in range(1, 33) for _ in range(8)]
    w = BitWriter()
    for v, n in vals:
        w.f(v, n)
    w.byte_align()
    r = BitReader(w.data())
    for v, n in vals:
        assert r.f(n) == v


def test_su_roundtrip():
    w = BitWriter()
    vals = [(-4, 3), (3, 3), (0, 3), (-64, 7), (63, 7), (-1, 1)]
    for v, n in vals:
        w.su(v, n)
    w.byte_align()
    r = BitReader(w.data())
    for v, n in vals:
        assert r.su(n) == v


def test_ns_roundtrip():
    for n in [1, 2, 3, 5, 7, 8, 11, 16, 100]:
        w = BitWriter()
        for v in range(n):
            w.ns(v, n)
        w.byte_align()
        r = BitReader(w.data())
        for v in range(n):
            assert r.ns(n) == v, (v, n)


def test_uvlc_roundtrip():
    vals = [0, 1, 2, 3, 4, 7, 8, 100, 1000, (1 << 20) - 2]
    w = BitWriter()
    for v in vals:
        w.uvlc(v)
    w.byte_align()
    r = BitReader(w.data())
    for v in vals:
        assert r.uvlc() == v


def test_leb128_roundtrip():
    vals = [0, 1, 127, 128, 300, 1 << 20, (1 << 32) - 1]
    w = BitWriter()
    for v in vals:
        w.leb128(v)
    r = BitReader(w.data())
    for v in vals:
        assert r.leb128() == v


def test_leb128_fixed_size():
    b = BitWriter.leb128_bytes(5, fixed_size=2)
    assert b == bytes([0x85, 0x00])
    r = BitReader(b)
    assert r.leb128() == 5


def test_trailing_bits():
    w = BitWriter()
    w.f(0b101, 3)
    w.trailing_bits()
    assert w.data() == bytes([0b10110000])
