"""Native (C) entropy coder backend: bit-identical to the Python EC."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.native.ecenc import NativeEntropyEncoder, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no C toolchain")


def test_symbol_stream_equality():
    from svt_av1_psyex_tpu.bitstream.ec import EntropyEncoder

    rng = np.random.RandomState(3)
    pe = EntropyEncoder()
    ne = NativeEntropyEncoder()
    cdfs = []
    for _ in range(40):
        n = rng.randint(2, 12)
        cuts = np.sort(rng.choice(np.arange(1, 1 << 15), n - 1, replace=False))
        cdfs.append(np.concatenate([cuts, [1 << 15]]).astype(np.int32))
    # two independent copies so adaptation evolves separately but identically
    cdfs_p = [c.copy() for c in cdfs]
    cdfs_n = [c.copy() for c in cdfs]
    cnt_p = [np.zeros(1, np.int32) for _ in cdfs]
    cnt_n = [np.zeros(1, np.int32) for _ in cdfs]
    for t in range(4000):
        i = rng.randint(len(cdfs))
        sym = rng.randint(len(cdfs[i]))
        adapt = (t % 3) != 0
        pe.symbol_adapt(sym, cdfs_p[i], cnt_p[i], len(cdfs_p[i]), adapt)
        ne.symbol_adapt(sym, cdfs_n[i], cnt_n[i], len(cdfs_n[i]), adapt)
        if t % 7 == 0:
            v, nb = rng.randint(0, 256), rng.randint(1, 9)
            pe.encode_literal(v, nb)
            ne.encode_literal(v, nb)
    for i in range(len(cdfs)):
        assert np.array_equal(cdfs_p[i], cdfs_n[i]), i
    assert pe.done() == ne.done()


@pytest.mark.slow
def test_frame_stream_equality(monkeypatch, tmp_path):
    """Same frame encoded with both backends produces identical bytes."""
    import os

    from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
    from svt_av1_psyex_tpu.codec.encoder import Av1Encoder

    rng = np.random.RandomState(1)
    planes = [rng.randint(0, 255, (96, 128)).astype(np.uint8),
              rng.randint(0, 255, (48, 64)).astype(np.uint8),
              rng.randint(0, 255, (48, 64)).astype(np.uint8)]

    def encode():
        seq = SequenceConfig(width=128, height=96)
        enc = Av1Encoder(seq, preset=10)
        tu0 = enc.encode_frame(planes, 120, force_key=True)
        tu1 = enc.encode_frame(planes, 120)
        return tu0 + tu1

    native = encode()
    monkeypatch.setenv("SVT_TPU_PY_EC", "1")
    pure = encode()
    assert native == pure
