"""TPL: device dispenser stats + host synthesizer/r0/q-ladder."""

import numpy as np

from svt_av1_psyex_tpu.codec.tpl import (
    TplModel,
    run_tpl,
    tpl_frame_qindex,
    qindex_from_qstep_ratio,
)


def _pan_clip(f, h, w, step=4, seed=0):
    """Translating textured content: every frame predicts well from the
    previous one, so early frames accumulate dependency."""
    rng = np.random.default_rng(seed)
    hh, ww = h + f * step + 16, w + 16
    noise = rng.integers(0, 255, (hh, ww)).astype(float)
    # band-limit: 5x5 box blur twice -> smooth but non-flat texture
    k = np.ones(5) / 5
    for _ in range(2):
        noise = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 1, noise)
        noise = np.apply_along_axis(
            lambda col: np.convolve(col, k, mode="same"), 0, noise)
    big = (noise * 2).astype(np.int32) % 256
    return [big[i * step : i * step + h, : w].astype(np.int32)
            for i in range(f)]


def test_group_stats_shapes_and_inter_choice():
    lumas = _pan_clip(4, 128, 192)
    model = run_tpl(lumas, base_qindex=120)
    assert model.f == 4
    assert model.nh == 128 // 16 and model.nw == 192 // 16
    # frame 0 is intra-only
    assert not model.is_inter[0].any()
    # translating content: the later frames overwhelmingly choose inter
    assert model.is_inter[1:].mean() > 0.7
    # and source-ref inter residuals are far cheaper than intra coding
    assert model.srcrf_dist[1].sum() < model.srcrf_dist[0].sum() / 4


def test_dependency_flows_backward():
    lumas = _pan_clip(6, 128, 128)
    model = run_tpl(lumas, base_qindex=120)
    # every frame except the last should accumulate some dependency
    for i in range(model.f - 1):
        assert model.mc_dep_dist[i].sum() >= 0
    # the first frame carries more accumulated dependency than the
    # second-to-last (it feeds the whole chain)
    assert model.mc_dep_dist[0].sum() >= model.mc_dep_dist[model.f - 2].sum()
    # r0 of the depended-upon first frame is lower (more propagation)
    assert model.r0(0) <= model.r0(model.f - 1) + 1e-9
    assert 0.0 < model.r0(0) <= 1.0


def test_static_scene_propagates_hard():
    """Identical frames: every future block depends on frame 0's recon
    (srcrf == 0, recrf = accumulated quant error), so frame 0's r0 drops
    well below the chain tail — the signal behind the reference's large
    kf_boost on static content."""
    luma = np.random.default_rng(1).integers(0, 255, (128, 128))
    model = run_tpl([luma] * 3, base_qindex=100)
    assert model.is_inter[1:].all()
    assert model.srcrf_dist[1:].sum() == 0
    assert model.r0(0) < 0.5
    assert model.r0(model.f - 1) == 1.0


def test_qindex_ladder():
    # intra with strong propagation gets a much lower q than base
    q_kf = tpl_frame_qindex(160, 0.2, 0, 4, True)
    assert q_kf < 160
    q_base = tpl_frame_qindex(160, 0.5, 0, 4, False)
    assert q_kf < q_base <= 160
    # non-base layers step from arf_q toward the worst quality
    q1 = tpl_frame_qindex(160, 0.5, 1, 4, False, arf_q=q_base)
    q2 = tpl_frame_qindex(160, 0.5, 2, 4, False, arf_q=q_base)
    assert q_base <= q1 <= q2 <= 160
    # ratio 1 maps a qindex to (nearly) itself
    assert abs(qindex_from_qstep_ratio(120, 1.0, 8) - 120) <= 1


def test_sb_rdmult_scale_shape():
    lumas = _pan_clip(3, 128, 192)
    model = run_tpl(lumas, base_qindex=120)
    s = model.sb_rdmult_scale(0, width=192, height=128)
    assert s.shape == (2, 3)
    assert (s >= 1.2).all()


def test_tpl_changes_anchor_allocation():
    """API-level: with TPL on, anchors (key/ARF) get lower q -> more bits,
    and the stream still decodes (covered by dav1d tests elsewhere)."""
    from svt_av1_psyex_tpu.api.encoder import SvtAv1Encoder

    rng = np.random.default_rng(2)
    base = rng.integers(0, 220, (96 + 64, 128)).astype(np.uint8)

    def frames(n):
        out = []
        for i in range(n):
            y = base[i * 2 : i * 2 + 96, :]
            u = np.full((48, 64), 120, np.uint8)
            v = np.full((48, 64), 130, np.uint8)
            out.append([y, u, v])
        return out

    def encode(tpl):
        h = SvtAv1Encoder()
        cfg = h.config
        cfg.source_width, cfg.source_height = 128, 96
        cfg.enc_mode = 10
        cfg.qp = 45
        cfg.enable_tpl_la = tpl
        cfg.intra_period_length = 15
        h.init()
        sizes = []
        for f in frames(8):
            h.send_picture(f)
        h.send_picture(None)
        while True:
            p = h.get_packet()
            if p is None or p.is_eos:
                break
            sizes.append((p.frame_type, len(p.data)))
        return sizes

    with_tpl = encode(1)
    without = encode(0)
    assert len(with_tpl) == len(without)
    # the keyframe gets a lower q (more bits) under TPL on this
    # temporally-correlated clip
    assert with_tpl[0][1] > without[0][1]
