"""Real 2-process DCN execution test (SURVEY.md §5.8, VERDICT r2 #3).

Unlike tests/test_parallel.py::TestDistributedBringup (which monkeypatches
``jax.distributed.initialize``), this spawns two actual OS processes, forms
a localhost ``jax.distributed`` group (4 virtual CPU devices each), builds
the global (data=4, model=2) mesh with DP crossing the process boundary,
runs one sharded DETR train step, and asserts the loss matches a
single-process 8-device run. Reference analog: none — the reference has no
distributed story at all (SURVEY.md §2.9); this is the TPU-native DCN
equivalent the rebuild adds.

Slow-marked: ~2-4 min on CPU (three subprocess compiles). Also wired as
``make dryrun-multihost``.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))


@pytest.mark.slow
def test_two_process_dcn_group_matches_single_process():
    import dcn_dryrun

    assert dcn_dryrun.parent(timeout=560.0) == 0
