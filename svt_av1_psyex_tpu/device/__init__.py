"""Device (TPU/XLA) compute plane of the encoder.

Everything here is batched over all blocks/superblocks of a frame and
jit-compiled; the host keeps only the sequential, context-exact work
(argmin tree walks, conformant commit, entropy coding). This is the
SURVEY §7 split: device = candidate cost evaluation, host = selection.
"""
import os as _os

import jax as _jax

# Persistent XLA compilation cache, OPT-IN via SVT_TPU_XLA_CACHE=1.
# Measured on the axon-tunnelled TPU: the backend compiles server-side at
# first *execution* and ignores locally-deserialized executables, so the
# cache does not survive a process restart there (cold tpl_group_stats =
# 208s with a fully-populated cache dir). On CPU the cache hits but the
# AOT loader warns about machine-feature mismatches (SIGILL risk). The
# supported path for compile latency is Av1Encoder's program warm-up
# (encoder.py warm_device), which overlaps the server compiles with each
# other and with host-side work.
if _os.environ.get("SVT_TPU_XLA_CACHE") == "1":
    _cache = _os.environ.get(
        "SVT_TPU_XLA_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "svt_tpu_xla"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
