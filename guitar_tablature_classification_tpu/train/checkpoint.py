"""Orbax checkpointing: best-val policy + true mid-run resume.

The reference only saves a best-model dict (epoch, model/optimizer/
scheduler state, val_loss, accuracies -> ``best_guitar_tab_model.pt``,
bestengine.py:985-995) and reloads it for final eval; there is no resume
path.  Here {params, batch_stats, opt_state, step} plus host metadata
are checkpointed via Orbax, with the same keep-best policy and a
``restore`` that resumes training exactly where it stopped.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .engine import TrainState


def _to_pytree(state: TrainState) -> dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


class Checkpointer:
    """Best-val checkpoint manager over an Orbax PyTreeCheckpointer."""

    def __init__(self, directory: str, name: str = "best_guitar_tab_model"):
        self.directory = os.path.abspath(directory)
        self.name = name
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    @property
    def path(self) -> str:
        return os.path.join(self.directory, self.name)

    @property
    def meta_path(self) -> str:
        return os.path.join(self.directory, f"{self.name}.meta.json")

    def save(self, state: TrainState, *, epoch: int, metrics: dict) -> None:
        tree = jax.tree.map(np.asarray, _to_pytree(state))
        self._ckptr.save(self.path, tree, force=True)
        meta = {
            "epoch": epoch,
            "step": int(state.step),
            "metrics": {
                k: (v.tolist() if isinstance(v, np.ndarray) else float(v))
                for k, v in metrics.items()
            },
        }
        with open(self.meta_path, "w") as f:
            json.dump(meta, f, indent=2)

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def restore(self, state: TrainState) -> tuple[TrainState, dict]:
        """Restore into an abstract/template state (shapes from a fresh
        ``create_train_state``).  Returns (state, meta)."""
        template = jax.tree.map(np.asarray, _to_pytree(state))
        tree = self._ckptr.restore(self.path, item=template)
        meta = {}
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                meta = json.load(f)
        restored = state.replace(
            step=jax.numpy.asarray(tree["step"]),
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
        )
        return restored, meta
