"""The notebook's 3-conv baseline CNN.

This is the only architecture with published accuracy numbers
(CNN_firstTry_.pdf p.2: Conv 1->32->64->64, 3x3 VALID, MaxPool2, then six
branch MLPs flatten->152->76->19; BASELINE.md).  Kept as the lightweight
flagship for fast end-to-end training on raw CQT features — it takes
[B, 96, T, C] spectrogram input directly, no 224x224 resize needed.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .heads import StackedDense

Dtype = Any


class SmallTabCNN(nn.Module):
    """[B, H, W, C] -> [B, 6, num_frets] logits."""

    num_frets: int = 19
    num_strings: int = 6
    hidden: tuple[int, int] = (152, 76)
    dropout: tuple[float, float] = (0.5, 0.2)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for i, filters in enumerate((32, 64, 64)):
            x = nn.Conv(
                filters, (3, 3), padding="VALID", dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)

        for i, (h, p) in enumerate(zip(self.hidden, self.dropout)):
            x = StackedDense(
                h, self.num_strings, param_dtype=self.param_dtype,
                name=f"dense{i}",
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(p, deterministic=not train)(x)
        x = StackedDense(
            self.num_frets, self.num_strings, param_dtype=self.param_dtype,
            name="out",
        )(x)
        return x.astype(jnp.float32)
