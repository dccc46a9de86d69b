"""Mirror-decode a frame's tile against the writer's symbol log and compare
end-of-tile CDF states — finds encoder/decoder adaptation divergence without
needing decoder internals. Debug tool for CDF-forwarding conformance.

Usage: run as a script; prints the first CDF row whose post-tile state
differs between the writer and a causal reader.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from svt_av1_psyex_tpu.bitstream.ec import EntropyDecoder, update_cdf  # noqa: E402
from svt_av1_psyex_tpu.bitstream.tables import FrameCdfs, trim, scan_table  # noqa: E402
from svt_av1_psyex_tpu.bitstream import coeff_writer as CW  # noqa: E402
from svt_av1_psyex_tpu.bitstream.tile_writer import TileWriter  # noqa: E402
from svt_av1_psyex_tpu.constants_compat import *  # noqa: F401,F403,E402  (optional)


def capture_encode(planes, q, w, h):
    """Encode one keyframe; capture the adaptive-symbol schedule, txb
    schedule, tile bytes, and the writer's final cdf state."""
    from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
    from svt_av1_psyex_tpu.codec.encoder import Av1Encoder

    log = []
    orig_sym = TileWriter._sym_at
    orig_lit = None

    def spy_sym(self, symbol, cdf_pair, *idx):
        name = None
        for k, v in self.cdfs.__dict__.items():
            if isinstance(v, list) and v and (v[0] is cdf_pair[0]):
                name = k
                break
            if isinstance(v, dict):
                for kk, vv in v.items():
                    if isinstance(vv, list) and vv[0] is cdf_pair[0]:
                        name = (k, kk)
                        break
        log.append(("sym", name, idx, int(symbol)))
        return orig_sym(self, symbol, cdf_pair, *idx)

    TileWriter._sym_at = spy_sym

    # force pure-python EC so literal calls are visible + coeffs go through
    # the python loop (which uses _sym_at + encode_literal)
    import os

    os.environ["SVT_TPU_PY_EC"] = "1"
    from svt_av1_psyex_tpu.bitstream import ec as ecmod

    orig_el = ecmod.EntropyEncoder.encode_literal

    def spy_lit(self, value, n):
        log.append(("lit", None, (), (int(value), int(n))))
        return orig_el(self, value, n)

    ecmod.EntropyEncoder.encode_literal = spy_lit

    tiles = {}
    orig_finish = TileWriter.finish if hasattr(TileWriter, "finish") else None

    seq = SequenceConfig(width=w, height=h, enable_cdef=False)
    enc = Av1Encoder(seq, preset=10, enable_dlf=False)
    enc.saved_cdfs = None
    tu = enc.encode_frame(planes, q, force_key=True)
    state = enc.saved_cdfs

    TileWriter._sym_at = orig_sym
    ecmod.EntropyEncoder.encode_literal = orig_el
    del os.environ["SVT_TPU_PY_EC"]
    return log, state, tu


def replay(log, q, tu):
    """Re-decode the symbol schedule with a fresh CDF set + EntropyDecoder,
    adapting as a decoder would; returns the reader's end state."""
    # extract the tile payload: last OBU (FRAME) payload after the
    # byte-aligned uncompressed header. Rather than re-parse the header,
    # exploit that the writer's EC payload is the TAIL of the frame OBU.
    # We re-derive it by encoding the symbol schedule into a fresh encoder
    # and matching its length against the tu tail.
    from svt_av1_psyex_tpu.bitstream.ec import EntropyEncoder

    enc = EntropyEncoder()
    cdfs_w = FrameCdfs(q)

    def pair(name):
        if isinstance(name, tuple):
            return getattr(cdfs_w, name[0])[name[1]]
        return getattr(cdfs_w, name)

    for kind, name, idx, val in log:
        if kind == "sym":
            p = pair(name)
            row = p[0][idx] if idx else p[0]
            cnt = p[1][idx] if idx else p[1]
            n = int(p[2][idx]) if idx else int(p[2])
            enc.symbol_adapt(val, row, cnt, n, True)
        else:
            enc.encode_literal(*val)
    payload = enc.done()
    # locate payload in tu
    pos = tu.rfind(payload)
    assert pos >= 0, "re-encoded tile not found in TU; schedule incomplete"

    dec = EntropyDecoder(tu[pos : pos + len(payload)])
    cdfs_r = FrameCdfs(q)

    def pair_r(name):
        if isinstance(name, tuple):
            return getattr(cdfs_r, name[0])[name[1]]
        return getattr(cdfs_r, name)

    for i, (kind, name, idx, val) in enumerate(log):
        if kind == "sym":
            p = pair_r(name)
            row = p[0][idx] if idx else p[0]
            cnt = p[1][idx] if idx else p[1]
            n = int(p[2][idx]) if idx else int(p[2])
            got = dec.decode_symbol(row[:n])
            if got != val:
                print(f"symbol #{i} {name}{idx}: wrote {val} read {got}")
                return None
            update_cdf(row[:n], got, cnt)
        else:
            v, nbits = val
            got = 0
            for _ in range(nbits):
                got = (got << 1) | dec.decode_symbol(
                    np.array([1 << 14, 1 << 15], np.int32))
            if got != v:
                print(f"literal #{i}: wrote {v} read {got}")
                return None
    return cdfs_r


def compare_states(a, b):
    bad = []
    for name, va in a.__dict__.items():
        vb = b.__dict__[name]
        if isinstance(va, list) and va and isinstance(va[0], np.ndarray):
            if not np.array_equal(va[0], vb[0]):
                w = np.argwhere(va[0] != vb[0])
                bad.append((name, w[:3]))
            if not np.array_equal(va[1], vb[1]):
                bad.append((name + ".cnt", np.argwhere(va[1] != vb[1])[:3]))
        elif isinstance(va, dict):
            for k in va:
                if not np.array_equal(va[k][0], vb[k][0]):
                    bad.append(((name, k), np.argwhere(va[k][0] != vb[k][0])[:3]))
                if not np.array_equal(va[k][1], vb[k][1]):
                    bad.append(((name, k, "cnt"), None))
    return bad
