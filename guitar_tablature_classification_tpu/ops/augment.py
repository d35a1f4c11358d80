"""PRNG-keyed spectrogram augmentations (jit-compiled, batched).

Functional re-design of the reference augmentation suite
(ViT_engine.py:28-93): same four transforms (time shift with zero fill,
Gaussian noise, SpecAugment-style frequency/time masking) and the same
batch gate (probability 0.5, 1-3 transforms per application), but driven
by explicit ``jax.random`` keys instead of Python ``random`` global
state, and applied per *sample* with static shapes so the whole thing
lives inside the jitted train step.

Layout note: inputs here are [B, F, T] (bins x frames, the CQT layout of
:mod:`.cqt`); the reference's [B, C, T, F] indexing is translated
accordingly.  The reference gates per *batch* via Python randomness; we
gate per sample, which is the same augmentation distribution applied at
a finer granularity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def time_shift(key: jax.Array, x: jax.Array, shift_range: float = 0.1) -> jax.Array:
    """Shift along the frame axis by u ~ U(-range, range) * T, zero-filled
    (ViT_engine.py:28-42)."""
    t = x.shape[-1]
    shift = jnp.astype(
        jax.random.uniform(key, (), minval=-shift_range, maxval=shift_range) * t,
        jnp.int32,
    )
    idx = jnp.arange(t) + shift  # positive shift: take later frames
    valid = (idx >= 0) & (idx < t)
    rolled = jnp.take(x, jnp.clip(idx, 0, t - 1), axis=-1)
    return jnp.where(valid, rolled, 0.0)


def add_noise(key: jax.Array, x: jax.Array, noise_level: float = 0.005) -> jax.Array:
    """Gaussian noise, sigma=0.005 (ViT_engine.py:44-47)."""
    return x + noise_level * jax.random.normal(key, x.shape, x.dtype)


def _axis_mask(key: jax.Array, size: int, max_width: int) -> jax.Array:
    """Boolean keep-mask with one random zero-span of width 1..max_width."""
    kw, k0 = jax.random.split(key)
    width = jax.random.randint(kw, (), 1, min(max_width, size) + 1)
    start = jax.random.randint(k0, (), 0, size - width + 1)
    pos = jnp.arange(size)
    return ~((pos >= start) & (pos < start + width))


def frequency_mask(key: jax.Array, x: jax.Array, max_width: int = 5) -> jax.Array:
    """Zero a random span of CQT bins (ViT_engine.py:49-63)."""
    mask = _axis_mask(key, x.shape[-2], max_width)
    return x * mask[..., :, None]


def time_mask(key: jax.Array, x: jax.Array, max_width: int = 10) -> jax.Array:
    """Zero a random span of frames (ViT_engine.py:65-79)."""
    mask = _axis_mask(key, x.shape[-1], max_width)
    return x * mask[..., None, :]


def _augment_one(key: jax.Array, x: jax.Array, augment_prob: float) -> jax.Array:
    kg, kn, kperm, k1, k2, k3, k4 = jax.random.split(key, 7)
    apply_gate = jax.random.uniform(kg) < augment_prob
    num_augs = jax.random.randint(kn, (), 1, 4)  # 1..3 (ViT_engine.py:87)
    order = jax.random.permutation(kperm, 4)

    candidates = [
        lambda v: time_shift(k1, v),
        lambda v: add_noise(k2, v),
        lambda v: frequency_mask(k3, v),
        lambda v: time_mask(k4, v),
    ]

    def apply_selected(v):
        for slot in range(3):  # at most 3 transforms
            chosen = order[slot]
            active = slot < num_augs
            branches = [lambda u, f=f: f(u) for f in candidates]
            applied = jax.lax.switch(chosen, branches, v)
            v = jnp.where(active, applied, v)
        return v

    return jnp.where(apply_gate, apply_selected(x), x)


@partial(jax.jit, static_argnames=("augment_prob",))
def augment_batch(
    key: jax.Array, batch: jax.Array, augment_prob: float = 0.5
) -> jax.Array:
    """batch: [B, F, T] float spectrograms -> augmented [B, F, T]."""
    keys = jax.random.split(key, batch.shape[0])
    return jax.vmap(lambda k, x: _augment_one(k, x, augment_prob))(keys, batch)
