"""Normalization ops (jit-compiled, batched).

Faithful ports of the reference's normalizers:
- ``db_to_unit``: (x + 120) / 120 with clip — ViT_dataloader.py:31-32 and
  db_normalize (ViT_engine.py:112-117).
- ``imagenet_normalize``: torchvision ImageNet mean/std — my_dataloader.py:21-30.
- ``min_max_normalize`` / ``z_score_normalize`` — ViT_engine.py:96-110
  (whole-batch statistics, matching the reference's ``batch.min()`` etc.).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def db_to_unit(x: jax.Array, ref_db: float = -120.0) -> jax.Array:
    """Map dB in [ref_db, 0] to [0, 1], clipped."""
    return jnp.clip((x - ref_db) / (-ref_db), 0.0, 1.0)


def imagenet_normalize(x: jax.Array) -> jax.Array:
    """x: [..., 3] in [0, 1] (channels last)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return (x - mean) / std


def min_max_normalize(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    lo, hi = jnp.min(x), jnp.max(x)
    span = hi - lo
    return jnp.where(span > eps, (x - lo) / jnp.maximum(span, eps), x)


def z_score_normalize(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    mean, std = jnp.mean(x), jnp.std(x)
    return jnp.where(std > eps, (x - mean) / jnp.maximum(std, eps), x - mean)


def tile_channels(x: jax.Array, channels: int = 3) -> jax.Array:
    """[..., H, W] -> [..., H, W, C] by channel repeat
    (ViT_dataloader.py:50-51's 1->3 channel tile, channels-last)."""
    return jnp.broadcast_to(
        x[..., None], x.shape + (channels,)
    )
