"""Deterministic PRNG threading.

Replaces the reference's global seeding (``set_seed`` —
bestengine.py:52-59, ViT_engine.py:17-25: python/numpy/torch/cudnn
globals) with explicit ``jax.random`` key trees: one root key per run,
split by purpose, folded by step.  XLA programs are deterministic given
the keys, which is the TPU equivalent of ``cudnn.deterministic``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np


def set_seed(seed: int = 42) -> jax.Array:
    """Reference-compatible helper: seeds numpy's legacy global (for any
    host-side shuffling) and returns the root JAX key."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


@dataclass
class KeySequence:
    """Named, reproducible key streams: ``keys('dropout')`` yields a fresh
    key each call, deterministically derived from (seed, name, counter)."""

    seed: int = 42
    _counters: dict = field(default_factory=dict)

    def __call__(self, name: str) -> jax.Array:
        count = self._counters.get(name, 0)
        self._counters[name] = count + 1
        key = jax.random.PRNGKey(self.seed)
        key = jax.random.fold_in(key, hash(name) & 0x7FFFFFFF)
        return jax.random.fold_in(key, count)
