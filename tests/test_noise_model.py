"""Film-grain noise model tests: flat-block finder, AR fit recovery,
grain-parameter conversion, and the adaptive --film-grain e2e path.

Counterpart behavior: noise_model.c (flat_block_finder_run :507, AR fit
:792/:943, get_grain_parameters :1117)."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.ops.noise_model import (
    COORDS,
    N_COORDS,
    estimate_grain_params,
    flat_blocks_and_planes,
)


def _synth_noise(h, w, coeffs, sigma, rng):
    """Generate causal-AR noise with the model's neighborhood."""
    n = rng.normal(0, sigma, (h + 8, w + 8))
    out = n.copy()
    for y in range(4, h + 8):
        for x in range(4, w + 4):
            acc = 0.0
            for (dx, dy), c in zip(COORDS, coeffs):
                acc += c * out[y + dy, x + dx]
            out[y, x] = n[y, x] + acc
    return out[8:, 4 : w + 4][:h, :w]


def test_flat_block_finder_separates():
    """Smooth + noisy blocks are flat; strong texture is not."""
    rng = np.random.default_rng(3)
    h, w = 128, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 100 + 0.2 * xx + 0.1 * yy + rng.normal(0, 2.0, (h, w))
    img[:64, :64] += 60 * np.sin(xx[:64, :64] / 2.5)  # texture quadrant
    plane = np.clip(img, 0, 255).astype(np.uint8)
    mask, den, nby, nbx = flat_blocks_and_planes(plane)
    assert mask.shape == (4, 4)
    assert mask[2:, 2:].all(), "smooth+noise blocks must be flat"
    assert not (mask[:2, :2] == 255).any(), "texture must not be flat"
    assert den.shape == plane.shape


def test_ar_fit_recovers_known_grain():
    """Known AR coefficients + strength are recovered from a synthetic
    flat frame with that grain applied."""
    rng = np.random.default_rng(5)
    h, w = 256, 256
    true = np.zeros(N_COORDS)
    # a simple isotropic short-range correlation
    for i, (dx, dy) in enumerate(COORDS):
        if abs(dx) + abs(dy) == 1:
            true[i] = 0.25
    noise = _synth_noise(h, w, true, 2.0, rng)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 90 + 0.1 * xx + 0.05 * yy
    y = np.clip(base + noise, 0, 255).astype(np.uint8)
    u = np.clip(128 + noise[::2, ::2] * 0.5, 0, 255).astype(np.uint8)
    v = np.clip(128 + noise[1::2, ::2] * 0.5, 0, 255).astype(np.uint8)
    fit = estimate_grain_params([y, u, v])
    assert fit is not None
    sc = 1 << fit["ar_coeff_shift"]
    got = np.array(fit["ar_coeffs_y"], np.float64) / sc
    for i, (dx, dy) in enumerate(COORDS):
        if abs(dx) + abs(dy) == 1:
            assert 0.10 < got[i] < 0.40, (i, got[i])
    # scaling strength should be nonzero and roughly flat
    ys = [s for _, s in fit["scaling_points_y"]]
    assert max(ys) > 0
    assert len(fit["ar_coeffs_cb"]) == N_COORDS + 1


def test_quiet_content_yields_low_strength():
    rng = np.random.default_rng(9)
    y = np.clip(rng.normal(120, 0.4, (128, 128)), 0, 255).astype(np.uint8)
    u = np.full((64, 64), 128, np.uint8)
    v = np.full((64, 64), 128, np.uint8)
    noisy = np.clip(y.astype(np.float64)
                    + rng.normal(0, 6.0, y.shape), 0, 255).astype(np.uint8)
    quiet = estimate_grain_params([y, u, v])
    loud = estimate_grain_params([noisy, u, v])
    assert loud is not None
    max_loud = max(s for _, s in loud["scaling_points_y"])
    if quiet is not None:
        max_quiet = max(s for _, s in quiet["scaling_points_y"])
        assert max_loud > max_quiet


def test_adaptive_film_grain_e2e(tmp_path):
    """--film-grain with the model fit: params track content noise and
    the stream decodes bit-exactly in dav1d."""
    from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
    from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
    from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
    from svt_av1_psyex_tpu.utils.ivf import IvfWriter

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float64)
    base = 110 + 0.3 * xx + 0.2 * yy
    y = np.clip(base + rng.normal(0, 5.0, (96, 128)), 0, 255).astype(np.uint8)
    u = np.clip(128 + rng.normal(0, 2.0, (48, 64)), 0, 255).astype(np.uint8)
    v = np.clip(128 + rng.normal(0, 2.0, (48, 64)), 0, 255).astype(np.uint8)

    seq = SequenceConfig(width=128, height=96)
    enc = Av1Encoder(seq, preset=10, film_grain=8)
    tu = enc.encode_frame([y, u, v], 120)
    fg = enc.last_film_grain
    assert fg is not None and fg.apply_grain
    assert fg.ar_coeff_lag == 3, "model fit (not the flat ladder) expected"
    assert fg.num_y_points >= 2
    path = tmp_path / "grain.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 128, 96)
        wr.write_frame(tu, 0)
        wr.close()
    dec = decode_ivf(path)
    grained = enc.grained_output()  # dav1d applies the fitted grain
    for i in range(3):
        dh, dw = dec[0][i].shape
        assert np.array_equal(dec[0][i], grained[i][:dh, :dw])
