"""Global motion e2e: panning content encodes with TRANSLATION gm and
stays dav1d bit-exact (header syntax + MVP gm padding + GLOBALMV MV)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
from svt_av1_psyex_tpu.utils.ivf import IvfWriter

pytestmark = pytest.mark.slow

W, H = 128, 96


def _pan_frames(n, dy, dx, seed=3):
    """A textured scene panning (dy, dx) px/frame (uint8 4:2:0)."""
    rng = np.random.RandomState(seed)
    big = rng.randint(0, 255, (H + 64, W + 64)).astype(np.float64)
    # low-pass so subpel interpolation is sane and ME locks on

    # separable blur without scipy: cumsum box filter
    def blur(a):
        for ax in (0, 1):
            a = (np.take(a, np.arange(a.shape[ax]), axis=ax)
                 + np.roll(a, 1, axis=ax) + np.roll(a, -1, axis=ax)) / 3.0
        return a

    big = blur(blur(big))
    frames = []
    for t in range(n):
        y0, x0 = 32 + t * dy, 32 + t * dx
        y = big[y0:y0 + H, x0:x0 + W].astype(np.uint8)
        u = y[::2, ::2] // 2 + 40
        v = y[1::2, ::2] // 2 + 60
        frames.append([y, u.astype(np.uint8), v.astype(np.uint8)])
    return frames


@pytest.mark.parametrize("pan", [(1, -2), (-2, 3)])
def test_gm_translation_dav1d_exact(tmp_path, pan, monkeypatch):
    # host MD at a fast preset: gm runs on the host path only
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    frames = _pan_frames(4, *pan)
    seq = SequenceConfig(width=W, height=H)
    enc = Av1Encoder(seq, preset=10)
    path = tmp_path / "gm.ivf"
    recons = []
    gm_seen = False
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, W, H)
        for t, fs in enumerate(frames):
            tu = enc.encode_frame(fs, 120, force_key=(t == 0))
            wr.write_frame(tu, t)
            recons.append([p.copy() for p in enc.last_recon])
            if enc.last_frame_gm is not None:
                gm_seen = True
                ent = [e for e in enc.last_frame_gm if e is not None][0]
                assert ent[0] == 1  # TRANSLATION
        wr.close()
    assert gm_seen, "estimator never produced a global model on a pan"
    dec = decode_ivf(path)
    assert len(dec) == len(frames)
    for t in range(len(frames)):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)


def test_gm_identity_on_static(tmp_path, monkeypatch):
    """A static scene must not signal global motion."""
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    rng = np.random.RandomState(0)
    y = rng.randint(0, 255, (H, W)).astype(np.uint8)
    planes = [y, y[::2, ::2].copy(), y[1::2, ::2].copy()]
    seq = SequenceConfig(width=W, height=H)
    enc = Av1Encoder(seq, preset=10)
    path = tmp_path / "st.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, W, H)
        for t in range(3):
            tu = enc.encode_frame(planes, 120, force_key=(t == 0))
            wr.write_frame(tu, t)
            assert enc.last_frame_gm is None
        wr.close()
    assert len(decode_ivf(path)) == 3


@pytest.mark.slow
def test_gm_with_switchable_filters(tmp_path):
    """preset 5 host path: SWITCHABLE interp filters + gm — exercises the
    needs_interp_filter TRANSLATION rule (large GLOBALMV blocks CODE the
    filter symbol when GmType == TRANSLATION)."""
    frames = _pan_frames(3, 1, -2)
    seq = SequenceConfig(width=W, height=H)
    enc = Av1Encoder(seq, preset=5)
    path = tmp_path / "gm5.ivf"
    recons = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, W, H)
        for t, fs in enumerate(frames):
            tu = enc.encode_frame(fs, 120, force_key=(t == 0))
            wr.write_frame(tu, t)
            recons.append([p.copy() for p in enc.last_recon])
        wr.close()
    assert enc.last_frame_gm is not None
    dec = decode_ivf(path)
    for t in range(len(frames)):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)


def _zoom_frames(n, scale_per_frame=1.03, seed=9):
    """A textured scene zooming in around the frame center (bilinear
    resample of a blurred texture; uint8 4:2:0)."""
    rng = np.random.RandomState(seed)
    big = rng.randint(0, 255, (H * 2, W * 2)).astype(np.float64)

    def blur(a):
        for ax in (0, 1):
            a = (a + np.roll(a, 1, axis=ax) + np.roll(a, -1, axis=ax)) / 3.0
        return a

    big = blur(blur(blur(big)))
    cy, cx = H, W
    frames = []
    for t in range(n):
        s = scale_per_frame ** (-t)  # sample coords shrink = zoom in
        ys = cy + (np.arange(H) - H / 2) * s
        xs = cx + (np.arange(W) - W / 2) * s
        y0 = np.floor(ys).astype(int)
        x0 = np.floor(xs).astype(int)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        p = (big[y0][:, x0] * (1 - fy) * (1 - fx)
             + big[y0 + 1][:, x0] * fy * (1 - fx)
             + big[y0][:, x0 + 1] * (1 - fy) * fx
             + big[y0 + 1][:, x0 + 1] * fy * fx)
        y = np.clip(p, 0, 255).astype(np.uint8)
        u = (y[::2, ::2] // 2 + 40).astype(np.uint8)
        v = (y[1::2, ::2] // 2 + 60).astype(np.uint8)
        frames.append([y, u, v])
    return frames


def test_gm_rotzoom_warp_dav1d_exact(tmp_path, monkeypatch):
    """Zooming content: ROTZOOM/AFFINE gm + spec warp prediction,
    dav1d bit-exact (warp filter + shear + MVP gm substitution)."""
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    frames = _zoom_frames(4)
    seq = SequenceConfig(width=W, height=H)
    enc = Av1Encoder(seq, preset=10)
    path = tmp_path / "zoom.ivf"
    recons = []
    types = []
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, W, H)
        for t, fs in enumerate(frames):
            tu = enc.encode_frame(fs, 120, force_key=(t == 0))
            wr.write_frame(tu, t)
            recons.append([p.copy() for p in enc.last_recon])
            if enc.last_frame_gm is not None:
                types += [e[0] for e in enc.last_frame_gm if e is not None]
        wr.close()
    assert any(t >= 2 for t in types), f"no warp-class model fit: {types}"
    dec = decode_ivf(path)
    for t in range(len(frames)):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recons[t][i][:dh, :dw]), (t, i)
