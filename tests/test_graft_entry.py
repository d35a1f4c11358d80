"""Driver entry points must keep working: entry() + dryrun_multichip."""

import os
import subprocess
import sys

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


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_in_driver_env(code: str, **env_overrides) -> subprocess.CompletedProcess:
    """Run a python snippet the way the driver does: JAX_PLATFORMS=axon in
    the env, no conftest bootstrap.  The snippet must cope on its own."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    # Drop conftest's virtual-device flag so the child sees a bare env.
    env["XLA_FLAGS"] = ""
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1200,
    )


def test_dryrun_multichip_in_driver_env():
    """Round-1 official failure (MULTICHIP_r01.json ok:false): the driver
    calls dryrun_multichip under pinned JAX_PLATFORMS=axon with one chip.
    The function must bootstrap a virtual CPU mesh itself."""
    proc = _run_in_driver_env(
        f"import sys; sys.path.insert(0, {REPO!r}); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout


def test_dryrun_multichip_after_backend_init():
    """If the backend is already initialized on an undersized platform
    (driver touched jax.devices() first), dryrun must fall back to a
    subprocess instead of crashing."""
    proc = _run_in_driver_env(
        f"import sys, os; sys.path.insert(0, {REPO!r}); "
        "os.environ['JAX_PLATFORMS'] = 'cpu'; "  # 1-device cpu stands in for 1-chip axon
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) < 8; "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout
