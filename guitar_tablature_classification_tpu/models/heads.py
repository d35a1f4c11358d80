"""Per-string classification heads, stacked for the MXU.

The reference runs 6 small branch MLPs in a Python loop
(``bestengine.py:28-48`` returns a list of six [B, 19] tensors).  Here the
six branches are one set of stacked weights driven by a single einsum per
layer — [B, F] x [6, F, H] -> [B, 6, H] — so the whole head block is a
couple of MXU calls and the model returns one [B, 6, 19] logits tensor.
The string axis of the stacked weights is shardable over a ``model`` mesh
axis (see :mod:`..parallel.mesh`).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class StackedDense(nn.Module):
    """Independent Dense per string: [B, 6, F] (or [B, F]) -> [B, 6, H]."""

    features: int
    num_strings: int = 6
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (self.num_strings, in_features, self.features), self.param_dtype,
        ).astype(self.dtype)
        x = x.astype(self.dtype)
        if x.ndim == 2:  # shared trunk features: broadcast over strings
            y = jnp.einsum("bf,sfh->bsh", x, kernel)
        else:
            y = jnp.einsum("bsf,sfh->bsh", x, kernel)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros,
                (self.num_strings, self.features), self.param_dtype,
            ).astype(self.dtype)
            y = y + bias
        return y


class StringBranchHeads(nn.Module):
    """The reference CNN branch stack (bestengine.py:28-40), vectorized:

    per string: Dense 256->128, ReLU, BatchNorm, Dropout .3,
                Dense 128->64, ReLU, BatchNorm, Dropout .2, Dense 64->19.

    Input [B, trunk_dim]; output [B, 6, num_frets] float32 logits.
    """

    num_frets: int = 19
    num_strings: int = 6
    hidden: Sequence[int] = (128, 64)
    dropout: Sequence[float] = (0.3, 0.2)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (h, p) in enumerate(zip(self.hidden, self.dropout)):
            x = StackedDense(
                h, self.num_strings, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"dense{i}",
            )(x)
            x = nn.relu(x)
            # Per-string BatchNorm: stats over batch only; params [6, h]
            # (matches torch BatchNorm1d run per branch).
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis=(-2, -1), dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"bn{i}",
            )(x)
            x = nn.Dropout(p, deterministic=not train, name=f"dropout{i}")(x)
        x = StackedDense(
            self.num_frets, self.num_strings, dtype=self.dtype,
            param_dtype=self.param_dtype, name="out",
        )(x)
        return x.astype(jnp.float32)


class SimpleStringHeads(nn.Module):
    """The ViT head stack (ViT_model.py:26-31): per string
    Dropout(rate/2) + Dense 256->19."""

    num_frets: int = 19
    num_strings: int = 6
    dropout: float = 0.15
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = StackedDense(
            self.num_frets, self.num_strings, dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"
            ),
            name="out",
        )(x)
        return x.astype(jnp.float32)
