"""Parameter-dictionary breadth: fixed qindex offsets, direct delta-q
offsets, qp-file, multi-channel CLI."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.api import EncoderConfig, SvtAv1Encoder  # noqa: E402
from svt_av1_psyex_tpu.api.params import parse_parameter  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402



W, H = 128, 96


def _frames(n):
    fmt = VideoFormat(W, H)
    return [synth_frame(fmt, t, "blobs") for t in range(n)]


def _encode(cfg, frames, tmp_path, name, qps=None):
    h = SvtAv1Encoder()
    h.set_parameter(cfg)
    h.init()
    recons = []
    pkts = []
    for t, f in enumerate(frames):
        h.send_picture(f, t, qp=(qps[t] if qps else None))
    h.send_picture(None)
    while (pk := h.get_packet()) is not None:
        if not pk.is_eos:
            pkts.append(pk)
    while (rc := h.get_recon()) is not None:
        recons.append(rc)
    path = tmp_path / name
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, W, H)
        for i, p in enumerate(pkts):
            wr.write_frame(p.data, i)
        wr.close()
    return path, pkts, recons


def _base_cfg(**kw):
    cfg = EncoderConfig(source_width=W, source_height=H, enc_mode=10,
                        qp=35, recon_enabled=True, **kw)
    return cfg


def test_new_param_names_parse():
    cfg = EncoderConfig()
    for name, val, attr, want in [
        ("intra-period", "31", "intra_period_length", 31),
        ("film-grain", "7", "film_grain_denoise_strength", 7),
        ("chroma-qm-min", "4", "min_chroma_qm_level", 4),
        ("use-fixed-qindex-offsets", "1", "use_fixed_qindex_offsets", 1),
        ("qindex-offsets", "[0,8,16,24]", "qindex_offsets", (0, 8, 16, 24)),
        ("key-frame-qindex-offset", "-12", "key_frame_qindex_offset", -12),
        ("luma-y-dc-qindex-offset", "-5", "luma_y_dc_qindex_offset", -5),
        ("use-q-file", "1", "use_qp_file", True),
        ("startup-qp-offset", "3", "startup_qp_offset", 3),
        ("tier", "1", "tier", 1),
    ]:
        parse_parameter(cfg, name, val)
        assert getattr(cfg, attr) == want, name


def test_fixed_qindex_offsets_honored(tmp_path):
    frames = _frames(5)
    base, _, _ = _encode(_base_cfg(), frames, tmp_path, "a.ivf")
    cfg = _base_cfg(use_fixed_qindex_offsets=1,
                    qindex_offsets=(0, 40, 60),
                    key_frame_qindex_offset=-20)
    fix, pkts, _ = _encode(cfg, frames, tmp_path, "b.ivf")
    assert len(decode_ivf(fix)) == 5
    assert Path(fix).stat().st_size != Path(base).stat().st_size


def test_delta_q_offsets_dav1d_exact(tmp_path):
    frames = _frames(3)
    cfg = _base_cfg(luma_y_dc_qindex_offset=-8,
                    chroma_u_dc_qindex_offset=6,
                    chroma_u_ac_qindex_offset=6,
                    chroma_v_dc_qindex_offset=6,
                    chroma_v_ac_qindex_offset=6)
    path, pkts, recons = _encode(cfg, frames, tmp_path, "dq.ivf")
    dec = decode_ivf(path)
    assert len(dec) == 3
    by_pts = {r.pts: r.planes for r in recons}
    for t in range(3):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], by_pts[t][i][:dh, :dw]), (t, i)


def test_qp_file_per_frame(tmp_path):
    frames = _frames(4)
    cfg = _base_cfg(use_qp_file=True, pred_structure=1)
    qps = [20, 55, 20, 55]
    path, pkts, _ = _encode(cfg, frames, tmp_path, "qf.ivf", qps=qps)
    assert len(decode_ivf(path)) == 4
    # high-qp frames must be much smaller than low-qp ones
    sizes = {p.pts: len(p.data) for p in pkts}
    assert sizes[1] < sizes[2]


def test_cli_channels(tmp_path):
    from svt_av1_psyex_tpu.app.main import main as app_main

    from svt_av1_psyex_tpu.utils.y4m import Y4MWriter

    fmt = VideoFormat(64, 64)
    clips = []
    for k in range(2):
        path = tmp_path / f"in{k}.y4m"
        with open(path, "wb") as fh:
            wr = Y4MWriter(fh, fmt)
            for t in range(2):
                wr.write_frame(synth_frame(fmt, t, "blobs"))
        clips.append(str(path))
    outs = [str(tmp_path / "o0.ivf"), str(tmp_path / "o1.ivf")]
    rc = app_main(["-i", ",".join(clips), "-b", ",".join(outs),
                   "--preset", "12", "--crf", "35", "--nch", "2",
                   "--progress", "0"])
    assert rc == 0
    for o in outs:
        assert len(decode_ivf(o)) == 2
