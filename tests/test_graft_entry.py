"""The driver contract: entry() compiles single-chip, dryrun_multichip runs
the sharded scan + training step on the virtual 8-device mesh."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_entry_compiles_and_runs():
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (4, 32, 32)
    assert np.isfinite(out).all() and out.sum() > 0


def test_dryrun_multichip():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
