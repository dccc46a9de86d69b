"""Alt-ref temporal filtering (codec/tf.py).

Counterpart: temporal_filtering.c. Encoder-side only — checks are (a) the
filter genuinely denoises toward the clean signal, (b) the RA pipeline
with TF spends fewer bits on noisy content while staying dav1d bit-exact.
"""

import numpy as np


def _noisy_frames(w, h, n, sigma=8.0, seed=5):
    rng = np.random.RandomState(seed)
    base = np.add.outer(np.linspace(40, 200, h), np.linspace(0, 55, w))
    frames = []
    for _ in range(n):
        y = np.clip(base + rng.normal(0, sigma, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(120 + rng.normal(0, 4, (h // 2, w // 2)), 0, 255).astype(np.uint8)
        v = np.clip(130 + rng.normal(0, 4, (h // 2, w // 2)), 0, 255).astype(np.uint8)
        frames.append([y, u, v])
    return base, frames


def test_temporal_filter_denoises():
    from svt_av1_psyex_tpu.codec.tf import temporal_filter

    base, frames = _noisy_frames(64, 48, 4)
    out = temporal_filter(frames[0], frames[1:], qindex=120)
    err_before = np.mean((frames[0][0].astype(np.float64) - base) ** 2)
    err_after = np.mean((out[0].astype(np.float64) - base) ** 2)
    assert err_after < 0.7 * err_before, (err_before, err_after)
    assert out[0].dtype == np.uint8 and out[0].shape == frames[0][0].shape


def test_tf_saves_bits_and_stays_conformant(tmp_path):
    from svt_av1_psyex_tpu.api.config import EncoderConfig
    from svt_av1_psyex_tpu.api.encoder import SvtAv1Encoder
    from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
    from svt_av1_psyex_tpu.utils.ivf import IvfWriter

    w, h, n = 96, 64, 5
    _, frames = _noisy_frames(w, h, n)

    def run(tf):
        henc = SvtAv1Encoder()
        cfg = EncoderConfig()
        cfg.source_width, cfg.source_height = w, h
        cfg.enc_mode = 8
        cfg.qp = 30
        cfg.pred_structure = 2
        cfg.intra_period_length = -1
        cfg.enable_tf = tf
        cfg.recon_enabled = True
        henc.set_parameter(cfg)
        henc.init()
        for t, fr in enumerate(frames):
            henc.send_picture([p.copy() for p in fr], t)
        henc.send_picture(None)
        pkts, recs = [], {}
        while True:
            pkt = henc.get_packet()
            if pkt is None or pkt.is_eos:
                break
            pkts.append(pkt)
        while True:
            r = henc.get_recon()
            if r is None:
                break
            recs[r.pts] = r.planes
        return pkts, recs

    pkts_off, _ = run(False)
    pkts_on, recs = run(True)
    bits_off = sum(len(p.data) for p in pkts_off) * 8
    bits_on = sum(len(p.data) for p in pkts_on) * 8
    assert bits_on < bits_off, (bits_on, bits_off)

    path = tmp_path / "tf.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        for i, pkt in enumerate(pkts_on):
            wr.write_frame(pkt.data, i)
        wr.close()
    dec = decode_ivf(path)
    assert len(dec) == n
    for t in range(n):
        for i in range(3):
            dh, dw = dec[t][i].shape
            assert np.array_equal(dec[t][i], recs[t][i][:dh, :dw]), (t, i)


def test_device_tf_matches_host_quality():
    """The device TF lattice (device/tf.py) must denoise as well as the
    per-block host loop on moving noisy content, for Y and chroma, at
    odd plane sizes (pad/crop path)."""
    import os
    from unittest import mock

    from svt_av1_psyex_tpu.codec.tf import temporal_filter

    rng = np.random.RandomState(5)
    base = np.add.outer(np.linspace(40, 200, 96), np.linspace(0, 55, 130))
    frames = []
    for i in range(6):
        y = np.clip(np.roll(base, i, axis=1) + rng.normal(0, 8, (96, 130)),
                    0, 255).astype(np.uint8)
        u = np.clip(120 + rng.normal(0, 4, (48, 65)), 0, 255).astype(np.uint8)
        frames.append([y, u, u.copy()])

    out_dev = temporal_filter(frames[0], frames[1:], 120)
    with mock.patch.dict(os.environ, {"SVT_TPU_HOST_TF": "1"}):
        out_host = temporal_filter(frames[0], frames[1:], 120)

    mse_in = np.mean((frames[0][0].astype(np.float64) - base) ** 2)
    mse_dev = np.mean((out_dev[0].astype(np.float64) - base) ** 2)
    mse_host = np.mean((out_host[0].astype(np.float64) - base) ** 2)
    assert mse_dev < 0.5 * mse_in
    assert mse_dev < mse_host * 1.1, (mse_dev, mse_host)
    for p in range(3):
        assert out_dev[p].shape == frames[0][p].shape
        assert out_dev[p].dtype == frames[0][p].dtype
