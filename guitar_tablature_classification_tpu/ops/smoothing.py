"""Temporal smoothing of per-window fret predictions.

Vectorized equivalent of the reference's mode filter
(``tablature_generator.py:695-737``): for each string, each window's fret
is replaced by the most common value in a +/- (window//2) neighborhood.
The reference mutates its array in place while scanning (so later
windows see already-smoothed neighbors); this implementation is the
standard non-sequential mode filter, computed in one shot on device —
behavior differences only arise on ties/cascades and are covered by the
sequential NumPy variant ``mode_filter_sequential`` for parity testing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("window", "num_classes"))
def mode_filter(preds: jax.Array, window: int = 3, num_classes: int = 19) -> jax.Array:
    """preds: [T, S] int frets -> mode-smoothed [T, S].

    Counts votes in each window via one-hot sums; ties resolve to the
    smallest fret (matching np.unique + argmax in the reference).
    """
    t = preds.shape[0]
    if t <= window:  # reference returns raw in this case (:707)
        return preds
    half = window // 2
    one_hot = jax.nn.one_hot(preds, num_classes, dtype=jnp.float32)  # [T,S,C]
    padded = jnp.pad(one_hot, ((half, half), (0, 0), (0, 0)))
    votes = sum(padded[i : i + t] for i in range(2 * half + 1))
    return jnp.argmax(votes, axis=-1).astype(preds.dtype)


def mode_filter_np(
    preds: np.ndarray, window: int = 3, num_classes: int = 19
) -> np.ndarray:
    """Host-side NumPy twin of :func:`mode_filter` (bit-identical output,
    tested).  For host-driven incremental paths — the streaming
    transcriber calls this per feed(); an eager jnp call there costs
    ~seconds per op through the axon tunnel (measured 994 ms/feed)."""
    preds = np.asarray(preds)
    t = preds.shape[0]
    if t <= window:
        return preds.copy()
    half = window // 2
    one_hot = np.eye(num_classes, dtype=np.float32)[preds]  # [T, S, C]
    padded = np.pad(one_hot, ((half, half), (0, 0), (0, 0)))
    votes = sum(padded[i : i + t] for i in range(2 * half + 1))
    return np.argmax(votes, axis=-1).astype(preds.dtype)


def mode_filter_sequential(preds: np.ndarray, window: int = 3) -> np.ndarray:
    """Bit-faithful NumPy port of post_process_tablature
    (tablature_generator.py:695-737), including its in-place scan."""
    preds = np.asarray(preds)
    t = preds.shape[0]
    if t <= window:
        return preds.copy()
    out = preds.copy()
    half = window // 2
    for s in range(out.shape[1]):
        col = out[:, s]
        for j in range(t):
            lo, hi = max(0, j - half), min(t, j + half + 1)
            values, counts = np.unique(col[lo:hi], return_counts=True)
            col[j] = values[np.argmax(counts)]
    return out
