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


class CheckpointMismatchError(RuntimeError):
    """Restoring a checkpoint into a model it was not trained with."""


# ModelConfig fields that determine the parameter tree / serving
# semantics.  Formulation knobs (w1_conv, stem_fusion, bn_fusion,
# attention_impl, remat) are exact-equivalent reformulations sharing one
# variable tree by design (DESIGN.md), so a checkpoint may legitimately
# be trained and served under different settings of those.
_IDENTITY_FIELDS = (
    "arch", "input_channels", "num_strings", "num_frets", "trunk_dim",
    "vit_hidden", "vit_layers", "vit_heads", "vit_patch",
    "vit_native_patch_w", "vit_conv_stem", "vit_mlp_ratio", "param_dtype",
)


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

    def save(
        self, state: TrainState, *, epoch: int, metrics: dict,
        model_meta: dict | None = None,
    ) -> None:
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
        if model_meta is not None:
            # model identity (arch + shape-relevant knobs) so a later
            # restore under a different --arch/--recipe fails with a
            # named mismatch instead of an Orbax shape traceback
            # (reference analogue: the `module.`-prefix robustness code,
            # tablature_generator.py:553-567)
            meta["model"] = model_meta
        with open(self.meta_path, "w") as f:
            json.dump(meta, f, indent=2)

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def load_meta(self) -> dict:
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                return json.load(f)
        return {}

    def restore(
        self, state: TrainState, *, expect_model: dict | None = None,
    ) -> tuple[TrainState, dict]:
        """Restore into an abstract/template state (shapes from a fresh
        ``create_train_state``).  Returns (state, meta).

        ``expect_model``: the model-config dict the caller is about to
        serve/eval with.  If the checkpoint's saved model identity
        disagrees, raises :class:`CheckpointMismatchError` naming the
        differing fields (instead of the Orbax tree/shape traceback a
        wrong --arch would otherwise produce)."""
        meta = self.load_meta()
        saved_model = meta.get("model")
        if expect_model is not None and saved_model is not None:
            diffs = {
                k: (saved_model[k], expect_model.get(k))
                for k in _IDENTITY_FIELDS
                if k in saved_model
                and k in expect_model
                and saved_model[k] != expect_model[k]
            }
            if diffs:
                detail = ", ".join(
                    f"{k}: checkpoint={a!r} requested={b!r}"
                    for k, (a, b) in sorted(diffs.items())
                )
                raise CheckpointMismatchError(
                    f"checkpoint at {self.path} was trained with a "
                    f"different model configuration ({detail}); pass the "
                    f"matching --arch/--recipe"
                )
        template = jax.tree.map(np.asarray, _to_pytree(state))
        try:
            tree = self._ckptr.restore(self.path, item=template)
        except Exception as e:
            arch = (saved_model or {}).get("arch")
            hint = (
                f" (checkpoint records arch={arch!r}; is the requested "
                f"--arch/--recipe the one it was trained with?)"
                if arch
                else " (likely an arch/config mismatch — the checkpoint "
                "predates model-identity metadata)"
            )
            raise CheckpointMismatchError(
                f"failed to restore {self.path}: parameter tree does not "
                f"match the requested model{hint}"
            ) from e
        restored = state.replace(
            step=jax.numpy.asarray(tree["step"]),
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
        )
        return restored, meta
