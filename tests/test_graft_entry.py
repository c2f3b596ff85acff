"""Driver entry points (__graft_entry__.py).

The driver compile-checks ``jax.jit(fn)(*args)`` on entry()'s return, so
fn must be a purely traceable function — returning the host dispatch
wrapper (which coerces conf via np.float32 and mutates chunk state)
breaks the gate with a TracerArrayConversionError. These tests pin both
contracts on the CPU backend.
"""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_entry_is_rejittable():
    from __graft_entry__ import entry

    fn, args = entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered.compile() is not None


def test_entry_executes():
    import numpy as np

    from __graft_entry__ import entry

    fn, args = entry()
    batch, enc = jax.jit(fn)(*args)
    F = args[1].shape[0]
    assert batch.boxes_xywh.shape[0] == F
    assert np.asarray(batch.scores).shape[0] == F
