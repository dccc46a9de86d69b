"""Round-trip and adaptation tests for the AV1 range coder."""

import random

import numpy as np

from svt_av1_psyex_tpu.bitstream.ec import (
    PROB_TOP,
    EntropyDecoder,
    EntropyEncoder,
    update_cdf,
)


def _random_cdf(rnd, n):
    """Random strictly-increasing spec-orientation CDF over n symbols."""
    while True:
        cuts = sorted(rnd.sample(range(1, PROB_TOP), n - 1))
        cdf = cuts + [PROB_TOP]
        if all(b > a for a, b in zip(cdf, cdf[1:])):
            return np.array(cdf, dtype=np.uint16)


def test_static_symbols_roundtrip():
    rnd = random.Random(42)
    alphabet_sizes = [2, 3, 4, 5, 8, 13, 16]
    cdfs = {n: _random_cdf(rnd, n) for n in alphabet_sizes}
    seq = []
    for _ in range(5000):
        n = rnd.choice(alphabet_sizes)
        s = rnd.randrange(n)
        seq.append((n, s))
    enc = EntropyEncoder()
    for n, s in seq:
        enc.encode_symbol(s, cdfs[n])
    data = enc.done()
    dec = EntropyDecoder(data)
    for n, s in seq:
        assert dec.decode_symbol(cdfs[n]) == s


def test_skewed_cdf_roundtrip():
    # Extremely skewed probabilities exercise EC_MIN_PROB floors.
    cdf = np.array([1, 2, 3, PROB_TOP], dtype=np.uint16)
    seq = [0, 1, 2, 3, 3, 3, 0, 3, 1, 3, 2] * 50
    enc = EntropyEncoder()
    for s in seq:
        enc.encode_symbol(s, cdf)
    data = enc.done()
    dec = EntropyDecoder(data)
    for s in seq:
        assert dec.decode_symbol(cdf) == s


def test_literals_roundtrip():
    rnd = random.Random(7)
    vals = [(rnd.randrange(1 << n), n) for n in range(1, 17) for _ in range(20)]
    enc = EntropyEncoder()
    for v, n in vals:
        enc.encode_literal(v, n)
    data = enc.done()
    dec = EntropyDecoder(data)
    for v, n in vals:
        assert dec.decode_literal(n) == v


def test_adaptive_roundtrip():
    """Encoder and decoder adapt CDFs identically symbol by symbol."""
    rnd = random.Random(3)
    n = 6
    base = _random_cdf(rnd, n)
    seq = [rnd.choices(range(n), weights=[10, 5, 1, 1, 1, 30])[0] for _ in range(3000)]

    enc = EntropyEncoder()
    cdf_e = base.copy()
    cnt_e = np.zeros(1, dtype=np.int32)
    for s in seq:
        enc.encode_symbol(s, cdf_e)
        update_cdf(cdf_e, s, cnt_e)
    data = enc.done()

    dec = EntropyDecoder(data)
    cdf_d = base.copy()
    cnt_d = np.zeros(1, dtype=np.int32)
    for s in seq:
        got = dec.decode_symbol(cdf_d)
        assert got == s
        update_cdf(cdf_d, got, cnt_d)
    assert np.array_equal(cdf_e, cdf_d)


def test_mixed_stream_roundtrip():
    rnd = random.Random(11)
    cdf2 = _random_cdf(rnd, 2)
    cdf9 = _random_cdf(rnd, 9)
    ops = []
    for _ in range(2000):
        k = rnd.randrange(3)
        if k == 0:
            ops.append(("sym", rnd.randrange(2), cdf2))
        elif k == 1:
            ops.append(("sym", rnd.randrange(9), cdf9))
        else:
            ops.append(("lit", rnd.randrange(256), 8))
    enc = EntropyEncoder()
    for op in ops:
        if op[0] == "sym":
            enc.encode_symbol(op[1], op[2])
        else:
            enc.encode_literal(op[1], op[2])
    data = enc.done()
    dec = EntropyDecoder(data)
    for op in ops:
        if op[0] == "sym":
            assert dec.decode_symbol(op[2]) == op[1]
        else:
            assert dec.decode_literal(op[2]) == op[1]


def test_short_streams():
    """Tiny payloads (few symbols) still round-trip."""
    cdf = np.array([PROB_TOP >> 1, PROB_TOP], dtype=np.uint16)
    for nsym in range(1, 20):
        seq = [(i * 7) & 1 for i in range(nsym)]
        enc = EntropyEncoder()
        for s in seq:
            enc.encode_symbol(s, cdf)
        data = enc.done()
        dec = EntropyDecoder(data)
        for s in seq:
            assert dec.decode_symbol(cdf) == s
