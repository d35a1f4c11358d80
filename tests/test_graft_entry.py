"""Driver entry points must keep working: entry() + dryrun_multichip."""

import sys
import os

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__  # noqa: E402

pytestmark = pytest.mark.slow  # resnet-at-224 compiles are heavy on CPU


def test_entry_compiles_and_runs():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 6, 19)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_dryrun_multichip_8():
    __graft_entry__.dryrun_multichip(8)
