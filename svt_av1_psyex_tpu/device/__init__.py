"""Device (TPU/XLA) compute plane of the encoder.

Everything here is batched over all blocks/superblocks of a frame and
jit-compiled; the host keeps only the sequential, context-exact work
(argmin tree walks, conformant commit, entropy coding). This is the
SURVEY §7 split: device = candidate cost evaluation, host = selection.
"""
