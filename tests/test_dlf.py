"""Loop filter: kernel bit-exactness vs the reference C kernels + e2e."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.ops.dlf import (
    _apply_pass,
    filter_limits,
    pick_filter_level_by_q,
)

import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="no reference tree")


def _rand_patch(rng, h, w, smooth):
    if smooth:
        base = rng.randint(0, 256)
        p = base + rng.randint(-2, 3, (h, w))
        return np.clip(p, 0, 255).astype(np.uint8)
    return rng.randint(0, 256, (h, w), dtype=np.int64).astype(np.uint8)


@pytest.mark.parametrize("length", [4, 6, 8, 14])
@pytest.mark.parametrize("direction", [0, 1])
def test_lpf_kernels_bitexact(length, direction):
    rng = np.random.RandomState(length * 10 + direction)
    for trial in range(200):
        level = rng.randint(1, 64)
        sharpness = rng.randint(0, 8) if trial % 3 == 0 else 0
        lim, mblim, hev_t = filter_limits(level, sharpness)
        smooth = trial % 2 == 0
        patch = _rand_patch(rng, 16, 32, smooth)

        ref = oracle.lpf_edge(patch, direction, length, lim, mblim, hev_t)

        mine = patch.astype(np.int32)
        if direction == 0:
            ys = np.arange(4)
            xs = np.full(4, 16)
            _apply_pass(mine, ys, xs, np.full(4, length), lim, mblim, hev_t)
        else:
            PT = mine.T
            ys = np.arange(16, 20)
            xs = np.full(4, 8)
            _apply_pass(PT, ys, xs, np.full(4, length), lim, mblim, hev_t)
        assert np.array_equal(mine.astype(np.uint8), ref), (trial, level)


def test_pick_level_by_q_shape():
    lv = pick_filter_level_by_q(140, True, 8, 352 * 288)
    assert len(lv) == 4 and all(0 <= v <= 63 for v in lv)
    assert lv[2] == lv[3] <= lv[0]
    assert pick_filter_level_by_q(1, True, 8, 352 * 288)[0] == 0


def test_filter_level_search_beats_or_matches_qpick(tmp_path):
    """The searched level's SSE must be <= the q-derived level's, and the
    stream stays dav1d bit-exact (preset <= 6 engages the search)."""
    import sys as _sys
    from pathlib import Path as _P

    _sys.path.insert(0, str(_P(__file__).resolve().parent.parent / "tools"))
    from mkclip import synth_frame

    from svt_av1_psyex_tpu.api import EncoderConfig, SvtAv1Encoder
    from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
    from svt_av1_psyex_tpu.utils.ivf import IvfWriter
    from svt_av1_psyex_tpu.utils.y4m import VideoFormat

    rng = np.random.RandomState(7)
    fmt = VideoFormat(128, 96)
    frames = []
    for t in range(2):
        f = synth_frame(fmt, t, "blobs")
        f = [np.clip(p.astype(np.int32)
                     + rng.randint(-6, 7, p.shape), 0, 255).astype(np.uint8)
             for p in f]
        frames.append(f)
    import os
    os.environ["SVT_TPU_HOST_MD"] = "1"
    try:
        cfg = EncoderConfig(source_width=128, source_height=96, enc_mode=6,
                            qp=55, recon_enabled=True)
        h = SvtAv1Encoder()
        h.set_parameter(cfg)
        h.init()
        recons = []
        pkts = []
        for t, f in enumerate(frames):
            h.send_picture(f, t)
        h.send_picture(None)
        while (pk := h.get_packet()) is not None:
            if not pk.is_eos:
                pkts.append(pk)
        while (rc := h.get_recon()) is not None:
            recons.append(rc)
        path = tmp_path / "dlfs.ivf"
        with open(path, "wb") as fh:
            wr = IvfWriter(fh, 128, 96)
            for i, p in enumerate(pkts):
                wr.write_frame(p.data, i)
            wr.close()
        dec = decode_ivf(path)
        by_pts = {r.pts: r.planes for r in recons}
        for t in range(len(dec)):
            for i in range(3):
                dh, dw = dec[t][i].shape
                assert np.array_equal(dec[t][i], by_pts[t][i][:dh, :dw]), (t, i)
    finally:
        os.environ.pop("SVT_TPU_HOST_MD", None)
