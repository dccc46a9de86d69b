"""Switchable interpolation filter tests: forced-choice dav1d round
trips per filter + the RD search end to end.

Counterpart behavior: write_mb_interp_filter / get_pred_context_
switchable_interp (reference entropy_coding.c:1564-1656) and
interpolation_filter_search (enc_inter_prediction.c:2276)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from mkclip import synth_frame  # noqa: E402

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402


def _encode_gop(tmp_path, name, preset=6, frames=3, size=(128, 96),
                q=120):
    """Host-path inter GOP (IPP via encode_frame) -> dav1d check."""
    w, h = size
    fmt = VideoFormat(w, h)
    seq = SequenceConfig(width=w, height=h)
    enc = Av1Encoder(seq, preset=preset)
    tus = []
    for t in range(frames):
        f = synth_frame(fmt, t, "blobs")
        tus.append(enc.encode_frame([p.copy() for p in f], q))
    path = tmp_path / f"{name}.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        for t, tu in enumerate(tus):
            wr.write_frame(tu, t)
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == frames
    rec = enc.last_recon
    for i in range(3):
        dh, dw = dec[-1][i].shape
        assert np.array_equal(dec[-1][i], rec[i][:dh, :dw]), i
    return b"".join(tus)


@pytest.mark.parametrize("flt", [0, 1, 2])
def test_forced_filter_dav1d_bitexact(tmp_path, monkeypatch, flt):
    """Force every searched inter block to one filter: the SWITCHABLE
    syntax + MC with that filter must round-trip bit-exactly."""
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    monkeypatch.setenv("SVT_TPU_FORCE_INTERP", str(flt))
    _encode_gop(tmp_path, f"forced{flt}")


def test_filter_search_engages_and_decodes(tmp_path, monkeypatch):
    """The RD search picks per-block filters (stream differs from the
    IFS-off encode) and stays dav1d bit-exact."""
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    on = _encode_gop(tmp_path, "ifs_on")
    monkeypatch.setenv("SVT_TPU_NO_IFS", "1")
    off = _encode_gop(tmp_path, "ifs_off")
    assert on != off


def test_fast_presets_keep_fixed_header(tmp_path, monkeypatch):
    """Presets above the IFS gate (and device-path frames) signal a
    fixed REGULAR filter: no per-block syntax, stream decodes."""
    monkeypatch.setenv("SVT_TPU_HOST_MD", "1")
    _encode_gop(tmp_path, "fast", preset=9)
