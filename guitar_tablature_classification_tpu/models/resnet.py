"""ResNet18 backbone in Flax (NHWC, TPU-native).

Functional re-design of the torchvision ``resnet18`` the reference wraps
(``bestengine.py:23-25``): same graph topology so pretrained torch
weights can be imported 1:1 (:mod:`.torch_import`), but laid out NHWC
with fused BN+ReLU epilogues under XLA, bfloat16 compute / float32
params by default.

The reference replaces ``conv1`` with a fresh conv over
``input_channels`` and ``fc`` with a 512->256 projection
(``bestengine.py:24-25``); this module exposes the same knobs.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3 conv-bn-relu, 3x3 conv-bn, residual."""

    filters: int
    strides: int = 1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        conv = lambda f, s, name: nn.Conv(  # noqa: E731
            f, (3, 3), strides=(s, s), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        identity = x
        y = conv(self.filters, self.strides, "conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = conv(self.filters, 1, "conv2")(y)
        y = norm("bn2")(y)
        if self.strides != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(
                self.filters, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
                name="downsample_conv",
            )(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class _Conv1Kernel(nn.Module):
    """Declares conv1's kernel with nn.Conv's exact name/shape/init so
    the fused-front path shares the parameter tree (imports, exports and
    checkpoints are unchanged)."""

    features: int = 64
    in_channels: int = 3
    kernel_size: int = 7
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, self.in_channels,
             self.features),
            self.param_dtype,
        )


class ResNet18(nn.Module):
    """Feature extractor: [B, H, W, C] -> [B, num_features].

    ``num_features=256`` reproduces the reference's fc 512->256 swap
    (bestengine.py:25); set ``num_features=None`` to get raw pooled 512-d
    features.
    """

    num_features: int | None = 256
    input_channels: int = 3
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    # Rematerialize each block on backward (jax.checkpoint): trades ~30%
    # extra FLOPs for O(depth) less activation HBM — the knob for scaling
    # batch size past memory limits.
    remat: bool = False
    # Precomposed stem front (ops/stem_fusion.py): when set to the recipe
    # image size and the input is a single-channel non-image feature map,
    # resize∘tile∘normalize∘conv1 runs as fused GEMMs straight off the
    # CQT — same parameters, same math (exact at fp32).
    fused_front: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (
            self.fused_front is not None
            and x.shape[-1] == 1
            and x.shape[1:3] != (self.fused_front, self.fused_front)
        ):
            from ..ops.stem_fusion import precomposed_conv1

            kernel = _Conv1Kernel(
                in_channels=self.input_channels,
                param_dtype=self.param_dtype,
                name="conv1",
            )()
            x = precomposed_conv1(
                x[..., 0], kernel, out_size=self.fused_front, dtype=self.dtype
            )
        else:
            if x.shape[-1] != self.input_channels:
                raise ValueError(
                    f"expected {self.input_channels} channels (NHWC), "
                    f"got {x.shape}"
                )
            x = x.astype(self.dtype)
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv1",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = (
            nn.remat(BasicBlock, static_argnums=(2,)) if self.remat
            else BasicBlock
        )
        for stage, blocks in enumerate(self.stage_sizes):
            filters = 64 * 2**stage
            for block in range(blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = block_cls(
                    filters, strides, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 512]
        if self.num_features is not None:
            x = nn.Dense(
                self.num_features, dtype=self.dtype,
                param_dtype=self.param_dtype, name="fc",
            )(x)
        return x.astype(jnp.float32)
