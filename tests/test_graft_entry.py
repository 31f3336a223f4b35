"""Validate the driver entry points on the virtual CPU mesh."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402


def test_entry_compiles():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 256, 72)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_dryrun_multichip():
    __graft_entry__.dryrun_multichip(8)
