"""Driver entry-point contract tests: entry() compiles, dryrun runs on the
virtual 8-device mesh."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.ndim == 3
    assert out.shape[0] == args[0].shape[0]
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
