"""IVF/OBU frame-header inspector (debug tool).

Parses sequence + uncompressed frame headers per spec 5.5/5.9 for the
feature range our encoder and the reference emit at the presets we use.
Prints one line of fields per frame — used to diff our header choices
against the reference encoder's when chasing conformance issues.
"""

from __future__ import annotations

import struct
import sys

sys.path.insert(0, "/root/repo")
from svt_av1_psyex_tpu.bitstream.bitw import BitReader  # noqa: E402


def parse_ivf(path):
    data = open(path, "rb").read()
    off = 32
    frames = []
    while off < len(data):
        sz = struct.unpack("<I", data[off : off + 4])[0]
        frames.append(data[off + 12 : off + 12 + sz])
        off += 12 + sz
    return frames


def parse_obus(tu):
    off = 0
    out = []
    while off < len(tu):
        b = tu[off]
        t = (b >> 3) & 15
        off += 1
        if b & 4:
            off += 1
        sz = 0
        shift = 0
        if (b >> 1) & 1:
            while True:
                c = tu[off]
                off += 1
                sz |= (c & 127) << shift
                shift += 7
                if not (c & 128):
                    break
        else:
            sz = len(tu) - off
        out.append((t, tu[off : off + sz]))
        off += sz
    return out


class Seq:
    pass


def parse_seq(payload):
    r = BitReader(payload)
    s = Seq()
    r.f(3)  # profile
    r.f(1)  # still
    assert r.f(1) == 0, "reduced hdr unsupported"
    if r.f(1):  # timing info present
        raise NotImplementedError("timing info")
    r.f(1)  # initial_display_delay
    ops = r.f(5)
    for _ in range(ops + 1):
        r.f(12)
        sl = r.f(5)
        if sl > 7:
            r.f(1)
    fwb = r.f(4) + 1
    fhb = r.f(4) + 1
    s.w = r.f(fwb) + 1
    s.h = r.f(fhb) + 1
    s.frame_id = r.f(1)
    if s.frame_id:
        s.delta_frame_id_len = r.f(4) + 2
        s.frame_id_len = r.f(3) + s.delta_frame_id_len + 1
    s.sb128 = r.f(1)
    s.filter_intra = r.f(1)
    s.intra_edge = r.f(1)
    s.interintra = r.f(1)
    s.masked = r.f(1)
    s.warped = r.f(1)
    s.dual_filter = r.f(1)
    s.order_hint = r.f(1)
    if s.order_hint:
        s.jnt = r.f(1)
        s.ref_frame_mvs = r.f(1)
    else:
        s.jnt = s.ref_frame_mvs = 0
    s.force_sc = 2 if r.f(1) else r.f(1)
    if s.force_sc > 0:
        s.force_imv = 2 if r.f(1) else r.f(1)
    else:
        s.force_imv = 2
    if s.order_hint:
        s.order_hint_bits = r.f(3) + 1
    else:
        s.order_hint_bits = 0
    s.superres = r.f(1)
    s.cdef = r.f(1)
    s.restoration = r.f(1)
    # color config
    hb = r.f(1)
    s.bit_depth = 10 if hb else 8  # profile 0
    s.mono = r.f(1)
    if r.f(1):  # color desc present
        r.f(8), r.f(8), r.f(8)
    if not s.mono:
        r.f(1)  # range
        # 420 implied profile 0
        r.f(2)  # chroma sample position
        r.f(1)  # separate uv delta q
    s.film_grain = r.f(1)
    return s


def parse_frame(payload, s, seen_seq):
    r = BitReader(payload)
    i = {}
    if r.f(1):  # show_existing_frame
        return {"show_existing": True, "slot": r.f(3)}
    ft = i["frame_type"] = r.f(2)
    show = i["show"] = r.f(1)
    frame_is_intra = ft in (0, 2)
    key_shown = ft == 0 and show
    if not show:
        r.f(1)
    if not key_shown:
        i["err_res"] = r.f(1)
    else:
        i["err_res"] = 0
    i["disable_cdf_update"] = r.f(1)
    if s.force_sc == 2:
        i["allow_sc"] = r.f(1)
    else:
        i["allow_sc"] = s.force_sc
    if i["allow_sc"] and s.force_imv == 2:
        i["force_imv"] = r.f(1)
    if s.frame_id:
        i["frame_id"] = r.f(s.frame_id_len)
    if ft != 3:
        i["size_override"] = r.f(1)
    else:
        i["size_override"] = 1
    if s.order_hint:
        i["order_hint"] = r.f(s.order_hint_bits)
    if frame_is_intra or i["err_res"]:
        i["primary_ref"] = 7
    else:
        i["primary_ref"] = r.f(3)
    if not key_shown:
        if ft == 3:
            i["refresh"] = 0xFF
        else:
            i["refresh"] = r.f(8)
    else:
        i["refresh"] = 0xFF
    if (not key_shown) and (i["refresh"] != 0xFF) and i["err_res"] and s.order_hint:
        for _ in range(8):
            r.f(s.order_hint_bits)
    if frame_is_intra:
        # frame_size + render_size
        if i["size_override"]:
            raise NotImplementedError
        if s.superres and r.f(0) == 1:
            pass
        i["render_diff"] = r.f(1)
        if i["render_diff"]:
            r.f(16), r.f(16)
        if i["allow_sc"]:  # and upscaled == frame w
            i["allow_intrabc"] = r.f(1)
    else:
        if s.order_hint:
            i["short_sig"] = r.f(1)
        else:
            i["short_sig"] = 0
        refs = []
        if i["short_sig"]:
            i["last_idx"] = r.f(3)
            i["gold_idx"] = r.f(3)
            raise NotImplementedError("set_frame_refs")
        for j in range(7):
            refs.append(r.f(3))
            if s.frame_id:
                r.f(s.delta_frame_id_len)
        i["ref_idx"] = refs
        if i["size_override"] and not i["err_res"]:
            raise NotImplementedError
        i["render_diff"] = r.f(1)
        if i["render_diff"]:
            r.f(16), r.f(16)
        if s.force_imv != 1:
            i["hp_mv"] = r.f(1)
        i["filter_switchable"] = r.f(1)
        if not i["filter_switchable"]:
            i["interp"] = r.f(2)
        i["motion_mode_sw"] = r.f(1)
        if not i["err_res"] and s.ref_frame_mvs:
            i["use_ref_mvs"] = r.f(1)
    if not i["disable_cdf_update"]:
        i["disable_frame_end_update_cdf"] = r.f(1)
    else:
        i["disable_frame_end_update_cdf"] = 1
    # tile info (uniform): the unary increments stop early at max_log2
    # (no terminating 0 is coded when the value reaches the maximum)
    i["uniform_tiles"] = r.f(1)
    mi_cols = 2 * ((s.w + 7) >> 3)
    mi_rows = 2 * ((s.h + 7) >> 3)
    sb_shift = 5 if s.sb128 else 4
    sb_cols = (mi_cols + (1 << sb_shift) - 1) >> sb_shift
    sb_rows = (mi_rows + (1 << sb_shift) - 1) >> sb_shift
    sb_size_log2 = sb_shift + 2

    def tile_log2(blk, target):
        k = 0
        while (blk << k) < target:
            k += 1
        return k

    max_tw_sb = 4096 >> sb_size_log2
    min_cols_log2 = tile_log2(max_tw_sb, sb_cols)
    max_cols_log2 = tile_log2(1, min(sb_cols, 64))
    max_rows_log2 = tile_log2(1, min(sb_rows, 64))
    if i["uniform_tiles"]:
        tl = min_cols_log2
        while tl < max_cols_log2 and r.f(1):
            tl += 1
        i["tile_cols_log2"] = tl
        tr = 0
        while tr < max_rows_log2 and r.f(1):
            tr += 1
        i["tile_rows_log2"] = tr
        if (1 << (tl + tr)) > 1:
            i["context_update_tile_id"] = r.f(tl + tr)
    else:
        raise NotImplementedError
    i["base_q"] = r.f(8)
    i["dcy_delta"] = r.f(1) and r.su_read(7) if hasattr(r, "su_read") else r.f(1)
    # (stop here: quantization tail varies; fields above cover the diff)
    return i


def main(path):
    frames = parse_ivf(path)
    s = None
    for n, tu in enumerate(frames):
        for t, payload in parse_obus(tu):
            if t == 1:
                s = parse_seq(payload)
                print("SEQ:", {k: v for k, v in vars(s).items()})
            elif t in (3, 6):
                i = parse_frame(payload, s, True)
                print(f"frame {n}:", i)


if __name__ == "__main__":
    main(sys.argv[1])
