"""Writer-level differential fuzz vs dav1d (tools/mvp_fuzz.py).

A small deterministic seed set of forced-leaf streams: compound/single
NEAREST/NEAR/GLOBAL/NEW over 3 refs with real fwd/bwd sign bias, random
quadtrees, and (coeffs mode) real residuals + random inter tx depths.
Every decoded pixel must equal the harness's MC/commit recon.

Regression net for the round-5 finds: the single-ref relaxed-rescan
DRL-count divergence and the vartx coverage gaps.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import mvp_fuzz  # noqa: E402

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("seed", [3, 5, 7])
def test_forced_leaf_streams_skip(seed):
    assert mvp_fuzz.run_seed(seed, 192, 128) == []


@pytest.mark.parametrize("seed", [5, 11])
def test_forced_leaf_streams_coeffs(seed):
    assert mvp_fuzz.run_seed(seed, 192, 128, with_coeffs=True) == []
