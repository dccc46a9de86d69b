"""Distance-weighted compound (compound_idx = 0): seq gates, syntax,
dist-wtd blend — dav1d bit-exact (forced-choice + natural selection).

Counterparts: svt_av1_dist_wtd_comp_weight_assign
(inter_prediction.c:273), read_compound_type syntax writing
(entropy_coding.c:5141-5200).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from mkclip import synth_frame  # noqa: E402

import svt_av1_psyex_tpu.codec.md as mdmod  # noqa: E402
from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig  # noqa: E402
from svt_av1_psyex_tpu.bitstream.tile_writer import TileWriter  # noqa: E402
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder  # noqa: E402
from svt_av1_psyex_tpu.codec.gop import plan_key, plan_minigop  # noqa: E402
from svt_av1_psyex_tpu.conformance.dav1d import decode_ivf  # noqa: E402
from svt_av1_psyex_tpu.utils.ivf import IvfWriter  # noqa: E402
from svt_av1_psyex_tpu.utils.y4m import VideoFormat  # noqa: E402


def test_dist_wtd_weights_reference_values():
    from svt_av1_psyex_tpu.ops.mc import dist_wtd_weights

    # equal distances -> first lookup row
    assert dist_wtd_weights(7, 4, 2, 6) == (7, 9)
    # d0 (fwd) = 0 -> last row
    assert dist_wtd_weights(7, 4, 1, 4) == (3, 13)
    # strongly asymmetric: list-0 ref much closer -> it takes the heavy
    # weight (the fwd offset scales the list-0 conv buffer)
    assert dist_wtd_weights(7, 8, 7, 16) == (13, 3)


def _encode_ra(tmp_path, tag, force_dw):
    """KF + two 4-frame mini-GOPs with the compound seq gates on;
    force_dw makes the avg arm of the internal comp-idx trial
    prohibitively expensive so every weighted candidate picks dist-wtd.
    Host MD forced: the dist-wtd trial is a host-RDO tool (reference
    gates it to preset <= 2, which rides our host path)."""
    import os

    os.environ["SVT_TPU_HOST_MD"] = "1"
    w, h = 96, 64
    fmt = VideoFormat(w, h)
    frames = [synth_frame(fmt, t, "blobs") for t in range(9)]
    seq = SequenceConfig(width=w, height=h)
    seq.enable_jnt_comp = True
    seq.enable_masked_compound = True
    enc = Av1Encoder(seq, preset=8)

    n_dw = [0]
    orig_wb = TileWriter._write_block

    def spy(self, leaf, r, c, bsize):
        if leaf.is_inter and leaf.ref_frame1 >= 1 and leaf.compound_idx == 0:
            n_dw[0] += 1
        return orig_wb(self, leaf, r, c, bsize)

    TileWriter._write_block = spy
    orig_costs = mdmod.ModeDecision._comp_idx_costs
    if force_dw:
        def pricey(self, ctx):
            t = orig_costs(self, ctx).copy()
            t[1] = 1 << 28  # average arm never wins
            return t

        mdmod.ModeDecision._comp_idx_costs = pricey
    try:
        plans = [plan_key(0)]
        plans += plan_minigop(0, 1, 4, future_slot=1, mid_slot=2)
        plans += plan_minigop(1, 5, 4, future_slot=0, mid_slot=2)
        path = tmp_path / f"dw_{tag}.ivf"
        recons = {}
        with open(path, "wb") as fh:
            wr = IvfWriter(fh, w, h)
            n = 0
            for pl in plans:
                src = frames[pl.disp_idx] if pl.show_existing_slot is None else None
                tu = enc.encode_frame(src, 120, plan=pl)
                wr.write_frame(tu, n)
                n += 1
                if pl.show_frame or pl.show_existing_slot is not None:
                    recons[pl.disp_idx] = [q.copy() for q in enc.last_recon]
            wr.close()
    finally:
        TileWriter._write_block = orig_wb
        mdmod.ModeDecision._comp_idx_costs = orig_costs
        os.environ.pop("SVT_TPU_HOST_MD", None)
    dec = decode_ivf(path)
    for disp in range(9):
        for i in range(3):
            dh, dw_ = dec[disp][i].shape
            assert np.array_equal(dec[disp][i],
                                  recons[disp][i][:dh, :dw_]), (tag, disp, i)
    return n_dw[0]


def test_dist_wtd_forced_bitexact(tmp_path):
    n = _encode_ra(tmp_path, "forced", force_dw=True)
    assert n > 0, "no dist-wtd compound blocks coded"


def test_dist_wtd_natural_bitexact(tmp_path):
    _encode_ra(tmp_path, "nat", force_dw=False)


def _encode_masked(tmp_path, tag, want_type):
    """Force the masked compound group (and one masked type) by making
    the competing syntax arms prohibitively expensive; dav1d-exact."""
    import os

    from svt_av1_psyex_tpu.codec.constants import (
        COMPOUND_DIFFWTD,
        COMPOUND_WEDGE,
    )

    os.environ["SVT_TPU_HOST_MD"] = "1"
    w, h = 96, 64
    fmt = VideoFormat(w, h)
    frames = [synth_frame(fmt, t, "blobs") for t in range(6)]
    seq = SequenceConfig(width=w, height=h)
    seq.enable_jnt_comp = True
    seq.enable_masked_compound = True
    enc = Av1Encoder(seq, preset=8)

    counts = {COMPOUND_WEDGE: 0, COMPOUND_DIFFWTD: 0}
    orig_wb = TileWriter._write_block

    def spy(self, leaf, r, c, bsize):
        if (leaf.is_inter and leaf.ref_frame1 >= 1
                and leaf.comp_group_idx == 1):
            counts[leaf.comp_type] += 1
        return orig_wb(self, leaf, r, c, bsize)

    TileWriter._write_block = spy
    orig_cg = mdmod.ModeDecision._comp_group_costs
    orig_ct = mdmod.ModeDecision._comp_type_costs

    def cheap_masked(self):
        t = orig_cg(self).copy()
        t[0] = 1 << 28  # group-0 arms (avg / dist-wtd) never win
        return t

    def pick_type(self, bsize):
        t = orig_ct(self, bsize).copy()
        if want_type == COMPOUND_WEDGE:
            # negative rate: wedge candidates dominate the partition
            # search too (32x64 can't wedge, so splits must win)
            t[0] = -(1 << 26)
            t[1] = 1 << 28
        else:
            t[0] = 1 << 28
        return t

    mdmod.ModeDecision._comp_group_costs = cheap_masked
    mdmod.ModeDecision._comp_type_costs = pick_type
    try:
        plans = [plan_key(0)]
        plans += plan_minigop(0, 1, 4, future_slot=1, mid_slot=2)
        path = tmp_path / f"mk_{tag}.ivf"
        recons = {}
        with open(path, "wb") as fh:
            wr = IvfWriter(fh, w, h)
            n = 0
            for pl in plans:
                src = frames[pl.disp_idx] if pl.show_existing_slot is None else None
                tu = enc.encode_frame(src, 120, plan=pl)
                wr.write_frame(tu, n)
                n += 1
                if pl.show_frame or pl.show_existing_slot is not None:
                    recons[pl.disp_idx] = [q.copy() for q in enc.last_recon]
            wr.close()
    finally:
        TileWriter._write_block = orig_wb
        mdmod.ModeDecision._comp_group_costs = orig_cg
        mdmod.ModeDecision._comp_type_costs = orig_ct
        os.environ.pop("SVT_TPU_HOST_MD", None)
    dec = decode_ivf(path)
    for disp in range(5):
        for i in range(3):
            dh, dw_ = dec[disp][i].shape
            assert np.array_equal(dec[disp][i],
                                  recons[disp][i][:dh, :dw_]), (tag, disp, i)
    return counts


def test_wedge_forced_bitexact(tmp_path):
    from svt_av1_psyex_tpu.codec.constants import COMPOUND_WEDGE

    counts = _encode_masked(tmp_path, "wedge", COMPOUND_WEDGE)
    assert counts[COMPOUND_WEDGE] > 0, counts


def test_diffwtd_forced_bitexact(tmp_path):
    from svt_av1_psyex_tpu.codec.constants import COMPOUND_DIFFWTD

    counts = _encode_masked(tmp_path, "diffwtd", COMPOUND_DIFFWTD)
    assert counts[COMPOUND_DIFFWTD] > 0, counts


def _encode_interintra(tmp_path, tag, force_wedge_ii):
    """Force inter-intra by making the ii=0 arm prohibitively expensive
    (and, for the wedge variant, the smooth-mask arm too)."""
    import os

    os.environ["SVT_TPU_HOST_MD"] = "1"
    w, h = 96, 64
    fmt = VideoFormat(w, h)
    frames = [synth_frame(fmt, t, "blobs") for t in range(4)]
    seq = SequenceConfig(width=w, height=h)
    seq.enable_interintra_compound = True
    enc = Av1Encoder(seq, preset=8)

    n_ii = [0, 0]  # smooth, wedge
    orig_wb = TileWriter._write_block

    def spy(self, leaf, r, c, bsize):
        if leaf.is_inter and leaf.interintra_mode >= 0:
            n_ii[1 if leaf.wedge_interintra else 0] += 1
        return orig_wb(self, leaf, r, c, bsize)

    TileWriter._write_block = spy
    orig_f = mdmod.ModeDecision._ii_flag_costs
    orig_w = mdmod.ModeDecision._ii_wedge_costs

    def pricey_off(self, grp):
        # force ii on two fronts: the off arm is prohibitive AND the on
        # arm carries a rate discount so ii-eligible candidates also win
        # the overall leaf competition (vs GLOBALMV/compound/intra)
        t = orig_f(self, grp).copy()
        t[0] = 1 << 28
        t[1] = -(1 << 22)
        return t

    def wedge_bias(self, bsize):
        t = orig_w(self, bsize).copy()
        if force_wedge_ii:
            t[0] = 1 << 28
        else:
            t[1] = 1 << 28
        return t

    mdmod.ModeDecision._ii_flag_costs = pricey_off
    mdmod.ModeDecision._ii_wedge_costs = wedge_bias
    try:
        plans = [plan_key(0)]
        plans += plan_minigop(0, 1, 2, future_slot=1, mid_slot=2)
        path = tmp_path / f"ii_{tag}.ivf"
        recons = {}
        with open(path, "wb") as fh:
            wr = IvfWriter(fh, w, h)
            n = 0
            for pl in plans:
                src = frames[pl.disp_idx] if pl.show_existing_slot is None else None
                tu = enc.encode_frame(src, 120, plan=pl)
                wr.write_frame(tu, n)
                n += 1
                if pl.show_frame or pl.show_existing_slot is not None:
                    recons[pl.disp_idx] = [q.copy() for q in enc.last_recon]
            wr.close()
    finally:
        TileWriter._write_block = orig_wb
        mdmod.ModeDecision._ii_flag_costs = orig_f
        mdmod.ModeDecision._ii_wedge_costs = orig_w
        os.environ.pop("SVT_TPU_HOST_MD", None)
    dec = decode_ivf(path)
    for disp in sorted(recons):
        for i in range(3):
            dh, dw_ = dec[disp][i].shape
            assert np.array_equal(dec[disp][i],
                                  recons[disp][i][:dh, :dw_]), (tag, disp, i)
    return n_ii


def test_interintra_smooth_forced_bitexact(tmp_path):
    n_smooth, _ = _encode_interintra(tmp_path, "smooth", False)
    assert n_smooth > 0


def test_interintra_wedge_forced_bitexact(tmp_path):
    _, n_wedge = _encode_interintra(tmp_path, "wedge", True)
    assert n_wedge > 0


def test_wedge_mask_properties():
    """Mask + complement = 64 everywhere; sign flips swap them."""
    from svt_av1_psyex_tpu.ops.wedge import wedge_mask

    for bsize in (3, 4, 5, 6, 7, 8, 9, 18, 19):
        for wi in (0, 4, 7, 12, 15):
            m0 = wedge_mask(bsize, wi, 0).astype(int)
            m1 = wedge_mask(bsize, wi, 1).astype(int)
            assert m0.shape == m1.shape
            assert ((m0 + m1) == 64).all(), (bsize, wi)
            assert m0.min() >= 0 and m0.max() <= 64
