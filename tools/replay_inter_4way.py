"""Causal coefficient replay of the failing 4-way inter frame."""
import sys, os, copy
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
os.environ["SVT_TPU_PY_EC"] = "1"

import svt_av1_psyex_tpu.codec.md as mdmod
from svt_av1_psyex_tpu.bitstream.tile_writer import Partition, TileWriter
from svt_av1_psyex_tpu.bitstream import ec as ecmod
from svt_av1_psyex_tpu.bitstream import coeff_writer as CW
import coeff_replay as CR

orig_try = mdmod.ModeDecision._try_multi
def patched(self, part, r, c, bsize, part_rates, blocks, best):
    if part == Partition.HORZ_4 and bsize == 9:
        got = orig_try(self, part, r, c, bsize, part_rates, blocks, None)
        if got is not None and got[1].partition == part:
            return (-(10**15), got[1], got[2])
    return orig_try(self, part, r, c, bsize, part_rates, blocks, best)
mdmod.ModeDecision._try_multi = patched
oi = mdmod.ModeDecision.__init__
def ini(self, *a, **kw):
    kw["try_4way"] = True
    oi(self, *a, **kw)
mdmod.ModeDecision.__init__ = ini

log = []
start_cdfs = []
orig_sym = TileWriter._sym_at
orig_lit = ecmod.EntropyEncoder.encode_literal
orig_txb = CW.CoeffWriter.write_txb
orig_init = TileWriter.__init__

def famname(self, cdf_pair):
    for k, v in self.cdfs.__dict__.items():
        if isinstance(v, list) and v and (v[0] is cdf_pair[0]):
            return k
        if isinstance(v, dict):
            for kk, vv in v.items():
                if isinstance(vv, list) and vv[0] is cdf_pair[0]:
                    return (k, kk)
    return None

def spy_sym(self, symbol, cdf_pair, *idx):
    if type(self) is TileWriter and capture_on[0]:
        log.append(("sym", famname(self, cdf_pair), idx, int(symbol)))
    return orig_sym(self, symbol, cdf_pair, *idx)

def spy_lit(self, value, n):
    if capture_on[0]:
        log.append(("lit", None, (), (int(value), int(n))))
    return orig_lit(self, value, n)

def spy_txb(self, plane, plane_bsize, tx_size, tx_type, qcoeff, eob, ux, uy,
            write_tx_type_fn=None):
    if isinstance(self.tw, TileWriter) and capture_on[0]:
        log.append(("txb", (plane, plane_bsize, tx_size, tx_type, ux, uy),
                    (), (np.asarray(qcoeff).copy(), int(eob))))
    return orig_txb(self, plane, plane_bsize, tx_size, tx_type, qcoeff,
                    eob, ux, uy, write_tx_type_fn)

def spy_init(self, seq, fr, cdfs, *a, **kw):
    if capture_on[0]:
        start_cdfs.append(cdfs.clone())
    return orig_init(self, seq, fr, cdfs, *a, **kw)

capture_on = [False]
TileWriter._sym_at = spy_sym
ecmod.EntropyEncoder.encode_literal = spy_lit
CW.CoeffWriter.write_txb = spy_txb
TileWriter.__init__ = spy_init

from mkclip import synth_frame
from svt_av1_psyex_tpu.bitstream.headers import SequenceConfig
from svt_av1_psyex_tpu.codec.encoder import Av1Encoder
from svt_av1_psyex_tpu.codec.gop import plan_key, plan_minigop
from svt_av1_psyex_tpu.utils.y4m import VideoFormat

fmt = VideoFormat(32, 32)
frames = [synth_frame(t_, 0, "blobs") for t_ in [fmt]][0]
frames = [synth_frame(fmt, t, "blobs") for t in range(2)]
seq = SequenceConfig(width=32, height=32)
seq.enable_cdef = False
enc = Av1Encoder(seq, preset=5, enable_dlf=False)
plans = [plan_key(0)] + plan_minigop(0, 1, 1, future_slot=1, mid_slot=2)
for pl in plans:
    src = frames[pl.disp_idx] if pl.show_existing_slot is None else None
    capture_on[0] = (pl.disp_idx == 1)
    enc.encode_frame(src, 105, plan=pl)
capture_on[0] = False
print("log entries:", len(log), "start cdfs captured:", len(start_cdfs))

# Build the reader with forwarded CDF state on both sides
rd = object.__new__(CR.Reader)
rd.cdfs = start_cdfs[0].clone()
enc2 = ecmod.EntropyEncoder()
cw2 = start_cdfs[0].clone()
for kind, name, idx, val in log:
    if kind == "sym":
        p = CR.Reader._pair(cw2, name)
        row = p[0][idx] if idx else p[0]
        cnt = p[1][idx] if idx else p[1]
        n = int(p[2][idx]) if idx else int(p[2])
        enc2.symbol_adapt(val, row, cnt, n, True)
    elif kind == "lit":
        enc2.encode_literal(*val)
rd.data = enc2.done()
rd.dec = CR.EntropyDecoder(rd.data)
rd.above = [np.zeros(8 >> (1 if p else 0), np.int32) for p in range(3)]
rd.left = [np.zeros(8 >> (1 if p else 0), np.int32) for p in range(3)]
rd.mismatches = []
rd.run(log)
print("mismatches:", rd.mismatches[:5])
if not rd.mismatches:
    # diff end-of-tile CDF state vs writer's
    import numpy as np
    diffs = []
    # writer-side end state: re-derive by replaying log on another clone
    # (cw2 already IS the writer-equivalent end state)
    for k, v in cw2.__dict__.items():
        if isinstance(v, list) and v and isinstance(v[0], np.ndarray):
            if not np.array_equal(v[0], getattr(rd.cdfs, k)[0]):
                diffs.append(k)
        elif isinstance(v, dict):
            for kk, vv in v.items():
                if isinstance(vv, list) and not np.array_equal(
                        vv[0], getattr(rd.cdfs, k)[kk][0]):
                    diffs.append(f"{k}[{kk}]")
    print("end-of-tile CDF diffs:", diffs)
