"""Multi-device sharded batch step + graft entry points (8 virtual CPUs)."""

import sys
import os

import numpy as np


def test_dryrun_multichip_8():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    T = np.asarray(out[0])
    assert T.shape == (4, 4)
    assert np.isfinite(T).all()
