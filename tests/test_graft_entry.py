"""The driver contract: entry() compiles single-chip; dryrun_multichip(8)
runs the sharded train step on the virtual CPU mesh."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # raises on failure
