"""True multi-process distributed smoke (ROADMAP §6 / SURVEY §5
"distributed communication backend").

Launches TWO separate Python processes that rendezvous through
``jax.distributed.initialize`` (the DCN path), form one 8-device global
mesh (4 virtual CPU devices per process), host-shard a global batch so
each process only materializes its half, and run one SPMD data-parallel
train step.  Both processes must report the identical global loss, and
that loss must match the same step computed single-process on the full
batch — proving the gradient/metric reduction spans processes.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_data_parallel_step():
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    # workers bootstrap their own platform/devices before importing jax
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        outs.append(out)

    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("DIST_OK")]
        assert lines, out
        losses.append(float(lines[0].split("loss=")[1]))
    # identical global loss on both processes (SPMD reduction spans DCN)
    assert losses[0] == losses[1], losses

    # and it matches the single-process full-batch step
    import jax
    import jax.numpy as jnp

    from guitar_tablature_classification_tpu.config import (
        ModelConfig, OptimConfig,
    )
    from guitar_tablature_classification_tpu.models import build_model
    from guitar_tablature_classification_tpu.train import (
        create_train_state, make_preprocess, make_train_step,
    )

    rng = np.random.default_rng(0)
    B = 16
    batch = {
        "features": jnp.asarray(
            rng.uniform(-120, 0, (B, 96, 9)).astype(np.float32)
        ),
        "labels": jnp.asarray(rng.integers(0, 19, (B, 6)).astype(np.int32)),
    }
    model = build_model(ModelConfig(arch="small_cnn", dtype="float32"))
    preprocess = make_preprocess(ModelConfig(arch="small_cnn", dtype="float32"))
    state = create_train_state(
        model, OptimConfig(), jax.random.PRNGKey(0),
        preprocess(batch["features"][:1]),
    )
    _, metrics = make_train_step(model, preprocess)(
        state, batch, jax.random.PRNGKey(0), 1e-3
    )
    np.testing.assert_allclose(losses[0], float(metrics["loss"]), rtol=1e-5)
