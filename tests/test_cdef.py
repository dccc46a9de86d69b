"""CDEF: kernel bit-exactness vs the reference C + e2e conformance."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.ops.cdef import (
    CDEF_VERY_LARGE,
    candidate_strengths,
    filter_blocks,
    find_dir_batch,
)

import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="no reference tree")


def test_find_dir_bitexact():
    rng = np.random.RandomState(7)
    blocks = rng.randint(0, 256, (200, 8, 8)).astype(np.int64)
    blocks[50:120] = np.clip(
        rng.randint(60, 70, (70, 1, 1)) + rng.randint(-3, 4, (70, 8, 8)), 0, 255)
    dirs, var = find_dir_batch(blocks)
    for i in range(200):
        d, v = oracle.cdef_find_dir(blocks[i])
        assert (d, v) == (dirs[i], var[i]), i


def test_filter_block_bitexact():
    rng = np.random.RandomState(11)
    for trial in range(300):
        h = w = 8 if trial % 2 == 0 else 4
        patch = rng.randint(0, 256, (h + 4, w + 4)).astype(np.int32)
        if trial % 3 == 0:
            base = rng.randint(0, 250)
            patch = np.clip(base + rng.randint(-4, 5, patch.shape), 0, 255).astype(np.int32)
        # frame-border sentinels only in the 2px ring (driver invariant)
        if trial % 5 == 0:
            patch[:2] = CDEF_VERY_LARGE
        if trial % 7 == 0:
            patch[:, -2:] = CDEF_VERY_LARGE
        pri = int(rng.choice([0, 1, 2, 3, 5, 9, 15]))
        sec = int(rng.choice([0, 1, 2, 4]))
        d = int(rng.randint(0, 8))
        pd = int(rng.randint(3, 7))
        sd = pd - int(rng.randint(0, 2))
        ref = oracle.cdef_filter_block(patch, pri, sec, d, pd, sd, h == 8)
        mine = filter_blocks(patch, np.array([2]), np.array([2]), h, w,
                             pri, sec, np.array([d]), pd, sd)[0]
        assert np.array_equal(mine, ref), trial


def test_candidate_sets():
    for lvl in (1, 2, 3, 4):
        c = candidate_strengths(lvl)
        assert 0 in c and all(0 <= gi < 64 for gi in c)


@pytest.mark.slow
def test_cdef_e2e_bits_nonzero(tmp_path):
    """Mixed content drives nb_strengths > 1: per-fb literal syntax +
    nonzero filtering, verified bit-exact against dav1d."""
    from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
    from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
    from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
    from svt_av1_psyex_tpu.utils.ivf import IvfWriter

    rng = np.random.RandomState(5)
    y = np.zeros((128, 256), np.uint8)
    y[10:50, 20:100] = 220
    y[:64, 128:] = 128
    y[64:, :128] = rng.randint(0, 255, (64, 128))
    y[64:, 128:] = (np.mgrid[0:64, 0:128][1] * 2).astype(np.uint8)
    u = np.full((64, 128), 100, np.uint8)
    v = np.full((64, 128), 150, np.uint8)
    seq = SequenceConfig(width=256, height=128)
    enc = Av1Encoder(seq, preset=8)
    path = tmp_path / "cdef.ivf"
    recons = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 256, 128)
        for t in range(2):
            yy = np.roll(y, t, axis=1)
            wr.write_frame(enc.encode_frame([yy, u, v], 180, force_key=(t == 0)), t)
            recons.append([p.copy() for p in enc.last_recon])
        wr.close()
    dec = decode_ivf(path)
    for t in range(2):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
