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


def _stem_strides(ph: int, pw: int) -> list[tuple[int, int]]:
    """Decompose a (ph, pw) patch into per-stage 3x3 conv strides.

    The H factor is split into 2s (plus one residual odd factor);
    the W strides are applied on the LAST stages so the early convs see
    the widest map (the CQT's 9-column axis is already narrow)."""
    def factors(p):
        out, rem = [], p
        while rem % 2 == 0 and rem > 1:
            out.append(2)
            rem //= 2
        if rem != 1:
            out.append(rem)
        return out

    hf, wf = factors(ph), factors(pw)
    n = max(len(hf), len(wf), 1)
    hf = hf + [1] * (n - len(hf))
    wf = [1] * (n - len(wf)) + wf
    return list(zip(hf, wf))


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
    # Replace the single patchify conv with a stack of stride-factored
    # 3x3 conv/BN/GELU stages + a 1x1 projection ("Early Convolutions
    # Help Transformers See Better", Xiao et al. 2021) — same token grid
    # as the (ph, pw) patchify, but the embedding sees overlapping
    # receptive fields instead of disjoint patches.  Round-5 experiment:
    # does a convolutional inductive bias close the measured ~0.35-point
    # gap to small_cnn at GuitarSet scale (DESIGN.md ViT sweep)?
    # NOTE: conv-stem checkpoints are NOT HF-importable (the DINO layout
    # has a single patch_embed); `vit_variables_from_torch` targets the
    # default patchify tree only.
    conv_stem: bool = False

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
        if self.conv_stem:
            stages = _stem_strides(ph, pw)
            for i, (sh, sw) in enumerate(stages):
                ch = max(self.hidden >> (len(stages) - 1 - i), 16)
                x = nn.Conv(
                    ch, (3, 3), strides=(sh, sw), padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"stem_conv{i}",
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"stem_bn{i}",
                )(x)
                x = nn.gelu(x, approximate=self.gelu == "tanh" or (
                    self.gelu == "auto" and self.dtype == jnp.bfloat16))
            x = nn.Conv(
                self.hidden, (1, 1), dtype=self.dtype,
                param_dtype=self.param_dtype, name="stem_proj",
            )(x)
        else:
            x = nn.Conv(
                self.hidden, (ph, pw),
                strides=(ph, pw), padding="VALID",
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="patch_embed",
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
