"""Palette mode (screen-content tools): search, syntax, conformance.

Counterpart: palette.c (search), entropy_coding.c:4134-4290 (syntax),
cabac_context_model.c:2458 (color-index contexts). Streams must decode
bit-exactly with dav1d; palette leaves must actually be chosen on
screen content (no silent no-op)."""

import numpy as np
import pytest

from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf
from svt_av1_psyex_tpu.utils.ivf import IvfWriter



def _sc_frame(w=128, h=128, seed=0):
    rng = np.random.default_rng(seed)
    y = np.full((h, w), 32, np.uint8)
    y[0 : h // 2, :] = 200
    for _ in range(12):
        r0, c0 = rng.integers(0, min(w, h) - 24, 2)
        y[r0 : r0 + 3, c0 : c0 + 24] = 90
        y[r0 : r0 + 20, c0 : c0 + 2] = 140
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    return [y, u, v]


def _count_palette(monkey_state):
    import svt_av1_psyex_tpu.bitstream.tile_writer as tw

    orig = tw.TileWriter._write_palette_tokens
    monkey_state["count"] = 0

    def spy(self, leaf, r, c):
        monkey_state["count"] += 1
        return orig(self, leaf, r, c)

    tw.TileWriter._write_palette_tokens = spy
    return lambda: setattr(tw.TileWriter, "_write_palette_tokens", orig)


def _roundtrip(tmp_path, tus, w, h, recs):
    path = tmp_path / "pal.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, w, h)
        for t, tu in enumerate(tus):
            wr.write_frame(tu, t)
        wr.close()
    frames = decode_ivf(path)
    assert len(frames) == len(recs)
    for fr, rec in zip(frames, recs):
        for p in range(3):
            dh, dw = fr[p].shape
            assert np.array_equal(fr[p], rec[p][:dh, :dw]), "dav1d mismatch"


@pytest.mark.quick
@pytest.mark.parametrize("q", [100])
def test_palette_keyframe_dav1d_exact(tmp_path, q):
    st = {}
    restore = _count_palette(st)
    try:
        planes = _sc_frame()
        seq = SequenceConfig(width=128, height=128)
        enc = Av1Encoder(seq, preset=6, screen_content_mode=1)
        tu = enc.encode_keyframe([p.copy() for p in planes], q)
        rec = [p.copy() for p in enc.last_recon]
    finally:
        restore()
    assert st["count"] > 0, "no palette leaves chosen on screen content"
    _roundtrip(tmp_path, [tu], 128, 128, [rec])


def test_palette_beats_plain_on_sc_content(tmp_path):
    """Same content, SC tools off vs on: palette must not lose rate at
    matched (identical-q) settings on hard screen content."""
    planes = _sc_frame(seed=3)
    outs = {}
    for scm in (0, 1):
        seq = SequenceConfig(width=128, height=128)
        enc = Av1Encoder(seq, preset=6, screen_content_mode=scm)
        outs[scm] = enc.encode_keyframe([p.copy() for p in planes], 140)
    assert len(outs[1]) <= len(outs[0])


def test_palette_inter_frame_intra_blocks(tmp_path):
    """SC inter frames: palette on intra blocks inside inter frames +
    palette neighbor cache across blocks, dav1d bit-exact."""
    from svt_av1_psyex_tpu.codec.gop import plan_minigop

    planes0 = _sc_frame(seed=1)
    planes1 = [p.copy() for p in planes0]
    # new UI element appears -> intra-coded region in the inter frame
    planes1[0][40:72, 40:72] = 250
    seq = SequenceConfig(width=128, height=128)
    enc = Av1Encoder(seq, preset=6, screen_content_mode=1)
    tus = [enc.encode_keyframe([p.copy() for p in planes0], 120)]
    recs = [[p.copy() for p in enc.last_recon]]
    plan = plan_minigop(0, 1, 1, future_slot=1)[0]
    tus.append(enc.encode_frame([p.copy() for p in planes1], 120,
                                plan=plan))
    recs.append([p.copy() for p in enc.last_recon])
    _roundtrip(tmp_path, tus, 128, 128, recs)


@pytest.mark.quick
def test_screen_content_autodetect():
    from svt_av1_psyex_tpu.ops.palette import is_screen_content

    assert is_screen_content(_sc_frame()[0])
    rng = np.random.default_rng(0)
    photo = rng.integers(0, 256, (128, 128)).astype(np.uint8)
    assert not is_screen_content(photo)


@pytest.mark.quick
def test_palette_search_exact_and_dominant():
    from svt_av1_psyex_tpu.ops.palette import palette_search

    blk = np.array([[10, 10, 40], [40, 200, 200], [10, 40, 200]], np.int64)
    colors, cmap = palette_search(blk)
    assert list(colors) == [10, 40, 200]
    assert np.array_equal(colors[cmap], blk)
    # dominant-color path: 12 distinct values -> top-8 nearest mapping
    rng = np.random.default_rng(1)
    vals = np.arange(0, 240, 20)  # 12 values
    blk = vals[rng.integers(0, 12, (16, 16))]
    res = palette_search(blk)
    assert res is not None
    colors, cmap = res
    assert len(colors) == 8 and np.all(np.diff(colors) > 0)
    # flat block: no palette
    assert palette_search(np.full((8, 8), 7)) is None


@pytest.mark.quick
def test_config5_knobs_conformant(tmp_path):
    """--complex-hvs 1 + --hbd-mds 3 (config 5's defining knobs) stay
    dav1d bit-exact on a 10-bit keyframe; complex-hvs must actually be
    able to change decisions (no silent no-op) on some content."""
    rng = np.random.default_rng(2)
    y = (rng.integers(0, 1024, (128, 128))).astype(np.uint16)
    u = np.full((64, 64), 512, np.uint16)
    enc = Av1Encoder(SequenceConfig(width=128, height=128, bit_depth=10),
                     preset=8, hbd_mds=3, complex_hvs=1)
    tu = enc.encode_keyframe([y.copy(), u.copy(), u.copy()], 120)
    rec = [p.copy() for p in enc.last_recon]
    path = tmp_path / "c5.ivf"
    with open(path, "wb") as fh:
        wr = IvfWriter(fh, 128, 128)
        wr.write_frame(tu, 0)
        wr.close()
    dec = decode_ivf(path)
    for p in range(3):
        dh, dw = dec[0][p].shape
        assert np.array_equal(dec[0][p], rec[p][:dh, :dw])
