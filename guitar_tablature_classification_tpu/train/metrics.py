"""Evaluation metrics: confusion matrices, per-fret accuracy.

Device-side equivalents of the sklearn/seaborn metric computations in the
reference's visualization suite (bestengine.py:608-686 confusion
matrices, :729-811 per-fret accuracy heatmap data).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrices(
    preds: jax.Array, targets: jax.Array, num_classes: int = 19
) -> jax.Array:
    """preds/targets [N, S] int -> [S, num_classes, num_classes] counts
    (rows = true fret, cols = predicted fret)."""
    s = preds.shape[1]
    flat = targets * num_classes + preds  # [N, S]
    counts = jax.vmap(
        lambda col: jnp.bincount(col, length=num_classes * num_classes),
        in_axes=1,
    )(flat)
    return counts.reshape(s, num_classes, num_classes)


def row_normalize(cm: np.ndarray) -> np.ndarray:
    """Row-normalized confusion matrix (bestengine.py:649)."""
    cm = np.asarray(cm, dtype=np.float64)
    denom = cm.sum(axis=-1, keepdims=True)
    return np.divide(cm, denom, out=np.zeros_like(cm), where=denom > 0)


def per_fret_accuracy(cm: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[S, C, C] confusion -> ([S, C] per-fret accuracy, [S, C] support)
    (the 6 x 19 heatmap of bestengine.py:729-811)."""
    cm = np.asarray(cm, dtype=np.float64)
    support = cm.sum(axis=-1)
    diag = np.diagonal(cm, axis1=-2, axis2=-1)
    acc = np.divide(diag, support, out=np.zeros_like(diag), where=support > 0)
    return acc, support
