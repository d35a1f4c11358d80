"""ViT-S/8 backbone in Flax (DINO ViT-small, patch 8).

TPU-native re-design of the HF ``ViTModel("facebook/dino-vits8")`` the
reference wraps (``ViT_model.py:11-15``): pre-LN transformer encoder over
8x8 patch tokens + CLS, attention via one fused QKV projection and
``jax.nn.dot_product_attention``, bfloat16 compute.  Graph topology
matches HF so pretrained torch weights import 1:1
(:mod:`.torch_import`); parity is tested against a randomly initialized
HF ``ViTModel`` in ``tests/test_models.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class EncoderBlock(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    ln_eps: float = 1e-12
    dropout: float = 0.0
    attention_impl: str = "xla"  # xla | pallas
    gelu: str = "auto"  # auto | exact | tanh (see ModelConfig.gelu)

    @nn.compact
    def __call__(self, x, train: bool = False):
        head_dim = self.hidden // self.heads
        dense = lambda f, name: nn.Dense(  # noqa: E731
            f, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=self.ln_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        b, n, _ = x.shape

        y = ln("ln_before")(x)
        qkv = dense(3 * self.hidden, "qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (b, n, self.heads, head_dim)
        if self.attention_impl == "pallas":
            from ..ops.attention_pallas import fused_attention

            attn = fused_attention(
                q.reshape(shape), k.reshape(shape), v.reshape(shape)
            ).reshape(b, n, self.hidden)
        else:
            attn = jax.nn.dot_product_attention(
                q.reshape(shape), k.reshape(shape), v.reshape(shape)
            ).reshape(b, n, self.hidden)
        attn = dense(self.hidden, "proj")(attn)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = x + attn

        y = ln("ln_after")(x)
        y = dense(self.mlp_dim, "mlp_in")(y)
        # exact erf-GELU for fp32 parity; tanh for bf16 where the ~3e-4
        # approximation error is below activation resolution and the erf
        # transcendental costs ~18 ms/step at B=64 (DESIGN.md).
        approximate = self.gelu == "tanh" or (
            self.gelu == "auto" and self.dtype == jnp.bfloat16
        )
        y = nn.gelu(y, approximate=approximate)
        y = dense(self.hidden, "mlp_out")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + y


class ViTBackbone(nn.Module):
    """[B, H, W, C] -> [B, hidden] CLS features (final-LN applied)."""

    hidden: int = 384
    layers: int = 12
    heads: int = 6
    # Square patches (the HF ViT-S/8 recipe) as an int, or a (ph, pw)
    # tuple for rectangular patches over non-square feature maps — the
    # vit_native extension patches the raw [96, 9] CQT directly as
    # (8, 3) -> a 12x3 token grid (36 + CLS), ~21x fewer tokens than
    # the 224^2 upsample's 784 (the upsample adds no information; see
    # DESIGN.md and the matching resnet18_native study).
    patch: int | tuple[int, int] = 8
    mlp_ratio: float = 4.0
    image_size: int = 224
    input_channels: int = 3
    dropout: float = 0.0
    ln_eps: float = 1e-12
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    remat: bool = False  # jax.checkpoint per encoder block
    attention_impl: str = "xla"  # xla | pallas (fused VMEM-resident KV)
    gelu: str = "auto"  # auto | exact | tanh (see ModelConfig.gelu)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        ph, pw = (
            (self.patch, self.patch) if isinstance(self.patch, int)
            else tuple(self.patch)
        )
        if h % ph or w % pw:
            raise ValueError(
                f"input {h}x{w} not divisible by patch {ph}x{pw}"
            )
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.hidden, (ph, pw),
            strides=(ph, pw), padding="VALID",
            dtype=self.dtype, param_dtype=self.param_dtype, name="patch_embed",
        )(x)
        x = x.reshape(b, -1, self.hidden)  # [B, N, D]
        n = x.shape[1]

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.hidden),
            self.param_dtype,
        ).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.hidden)), x], 1)
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, n + 1, self.hidden), self.param_dtype,
        ).astype(self.dtype)
        x = x + pos
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        block_cls = (
            nn.remat(EncoderBlock, static_argnums=(2,)) if self.remat
            else EncoderBlock
        )
        for i in range(self.layers):
            x = block_cls(
                self.hidden, self.heads, int(self.hidden * self.mlp_ratio),
                dtype=self.dtype, param_dtype=self.param_dtype,
                ln_eps=self.ln_eps, dropout=self.dropout,
                attention_impl=self.attention_impl, gelu=self.gelu,
                name=f"block{i}",
            )(x, train)

        x = nn.LayerNorm(
            epsilon=self.ln_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="ln_final",
        )(x)
        return x[:, 0].astype(jnp.float32)  # CLS token (ViT_model.py:86)
