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

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FusedBatchNorm(nn.Module):
    """Drop-in for ``nn.BatchNorm`` (same params/batch_stats variable
    tree, momentum-0.9 running averages, fast-variance semantics) whose
    training-mode statistic reductions run as single Pallas passes with
    an analytic batch-stat gradient (:func:`..ops.bn_pallas.
    batch_norm_train`) instead of XLA's separate cast+reduce passes.

    Eval mode is a plain per-channel affine in XLA (running stats are
    constants — nothing to fuse).
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    impl: str = "auto"  # pallas | xla | auto (pallas on TPU)

    @nn.compact
    def __call__(self, x):
        from ..ops.bn_pallas import batch_norm_train

        c = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (c,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (c,), self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(c, jnp.float32)
        )
        x = x.astype(self.dtype)
        if not self.use_running_average:
            out, mean, var = batch_norm_train(
                x, scale, bias, self.epsilon, self.impl
            )
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mul = (
                jax.lax.rsqrt(ra_var.value + self.epsilon)
                * scale.astype(jnp.float32)
            ).astype(x.dtype)
            out = (x - ra_mean.value.astype(x.dtype)) * mul + bias.astype(
                x.dtype
            )
        return out


class Conv3x3(nn.Module):
    """3x3 conv that skips structurally-zero kernel columns on width-1
    feature maps.

    The native trunk's tail stages run at 6x1 and 3x1 spatial extents
    (resnet18_native, 96x9 input), where the 3x3 kernel's side columns
    only ever multiply zero padding: they contribute nothing to the
    output and receive zero gradients — the model-side analogue of the
    CQT kernel's zero-support split (DESIGN.md round 3).  This module
    declares the full (3, 3, in, out) kernel (identical variable tree,
    checkpoints and torch import/export) but on width-1 inputs contracts
    only the center column — 3x fewer FLOPs on those convs with outputs
    equal to the full conv (same terms, the dropped ones are exact
    zeros) and an identical training trajectory (the side columns'
    gradients were already zero).

    ``mode`` picks the width-1 contraction's formulation:

    - ``"slim"``  — center-column ``lax.conv`` (kernel ``[3,1,C,F]``).
      XLA still tiles the 3-6-row feature maps onto 8-sublane registers,
      wasting 25-62 % of the MXU rows at these heights.
    - ``"gemm"``  — the same center-column contraction as one explicit
      row-stacked GEMM ``[B*h_out, 3C] @ [3C, F]`` (the three height
      taps stacked along channels), so the M dimension is batch-major
      and fills sublanes regardless of feature-map height — the
      round-3 VERDICT's "batch-major packing" lever, measured in
      tools/probe_w1_gemm.py / DESIGN.md round 4.
    - ``"dense"`` — on 3x1 stride-1 maps only (layer4's three 512-ch
      convs at the native geometry), the whole feature map is one
      feature vector and the conv is a single banded-dense GEMM
      ``[B, 3C] @ [3C, 3F]`` (band block (j, i) = kernel tap j-i+1,
      off-band blocks zero): M is the raw batch, the map never splits
      into rows at all, and the MAC count is identical (h = h_out = 3).
      Other width-1 convs fall back to "slim".
    - ``"full"``  — force the dense 3x3 contraction everywhere (the
      A/B baseline; tests assert parity).
    """

    features: int
    strides: int = 1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    mode: str = "dense"  # dense | slim | gemm | full

    @nn.compact
    def __call__(self, x):
        if self.mode not in ("dense", "slim", "gemm", "full"):
            # Validate here, not only in build_model: a typo'd mode
            # falling through to the "slim" catch-all below would
            # silently mislabel an A/B measurement (the trap class
            # CLAUDE.md documents).
            raise ValueError(f"Conv3x3 mode must be dense|slim|gemm|full, "
                             f"got {self.mode!r}")
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
            self.param_dtype,
        )
        x = x.astype(self.dtype)
        if (
            self.mode == "dense"
            and x.shape[1:3] == (3, 1)
            and self.strides == 1
        ):
            b, _, _, c = x.shape
            f = self.features
            kc = kernel[:, 1].astype(self.dtype)  # [3, C, F]
            zero = jnp.zeros((c, f), self.dtype)
            # y[i] = sum_t kc[t] . x[i + t - 1] (cross-correlation, pad
            # 1): input row j feeds output row i through tap
            # t = j - i + 1 when in range.
            w = jnp.concatenate(
                [
                    jnp.concatenate(
                        [
                            kc[j - i + 1] if 0 <= j - i + 1 < 3 else zero
                            for i in range(3)
                        ],
                        axis=1,
                    )
                    for j in range(3)
                ],
                axis=0,
            )  # [3C, 3F]
            y = x.reshape(b, 3 * c) @ w
            return y.reshape(b, 3, 1, f)
        if self.mode == "gemm" and x.shape[2] == 1:
            b, h, _, c = x.shape
            s = self.strides
            h_out = (h - 1) // s + 1  # pad (1,1), kernel height 3
            xp = jnp.pad(x[:, :, 0], ((0, 0), (1, 1), (0, 0)))
            # Height tap t of output row i reads padded row s*i + t:
            # stack the three strided row-slices along channels.
            taps = jnp.stack(
                [
                    jax.lax.slice_in_dim(
                        xp, t, t + s * (h_out - 1) + 1, s, axis=1
                    )
                    for t in range(3)
                ],
                axis=2,
            )  # [B, h_out, 3, C] — tap-major, matching kernel.reshape
            kc = kernel[:, 1].astype(self.dtype).reshape(3 * c, self.features)
            y = taps.reshape(b * h_out, 3 * c) @ kc
            return y.reshape(b, h_out, 1, self.features)
        if self.mode != "full" and x.shape[2] == 1:
            kernel, pad_w = kernel[:, 1:2], (0, 0)
        else:
            pad_w = (1, 1)
        return jax.lax.conv_general_dilated(
            x,
            kernel.astype(self.dtype),
            window_strides=(self.strides, self.strides),
            padding=[(1, 1), pad_w],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3 conv-bn-relu, 3x3 conv-bn, residual."""

    filters: int
    strides: int = 1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    fused_bn: bool = False
    w1_conv: str = "dense"  # width-1 contraction mode (see Conv3x3)

    @nn.compact
    def __call__(self, x, train: bool):
        conv = lambda f, s, name: Conv3x3(  # noqa: E731
            f, strides=s, dtype=self.dtype, param_dtype=self.param_dtype,
            mode=self.w1_conv, name=name,
        )
        norm_cls = FusedBatchNorm if self.fused_bn else nn.BatchNorm
        norm = lambda name: norm_cls(  # noqa: E731
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


class _QuadrantBNReLUPool(nn.Module):
    """bn1 + ReLU + 3x3/s2 max-pool as the fused stem tail
    (ops/stem_pallas.py) on quadrant-layout conv1 output.

    Declares the exact variable tree of ``nn.BatchNorm(name='bn1')``
    (params: scale/bias, batch_stats: mean/var) so checkpoints and torch
    import/export are unchanged.  Batch statistics, running-average
    updates (momentum 0.9) and the training-mode BN gradient all match
    flax semantics: the stat reductions run here under autodiff, and the
    fused op returns d(mean)/d(var) cotangents so the full
    batch-stat gradient flows back to the conv output.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    impl: str = "auto"  # pallas | xla | auto (pallas on TPU)

    @nn.compact
    def __call__(self, yq, train: bool):
        from ..ops.stem_pallas import bn_relu_pool, bn_relu_pool_train

        b, _, h2, lanes = yq.shape
        c = lanes // (2 * h2)
        scale = self.param(
            "scale", nn.initializers.ones, (c,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (c,), self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(c, jnp.float32)
        )
        if train:
            pooled, mean, var = bn_relu_pool_train(
                yq, scale, bias, self.epsilon, self.impl
            )
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            pooled = bn_relu_pool(
                yq, ra_mean.value, ra_var.value, scale, bias,
                self.epsilon, self.impl,
            )
        return pooled.astype(self.dtype)


class _NativeBNReLUPool(nn.Module):
    """bn1 + ReLU + 3x3/s2 max-pool as the fused NATIVE stem tail
    (ops/stem_native.py) on row-parity conv1 output planes.

    Declares the exact variable tree of ``nn.BatchNorm(name='bn1')``
    (params: scale/bias, batch_stats: mean/var) so checkpoints and torch
    import/export are unchanged.  Batch statistics (pad columns
    excluded), running-average updates (momentum 0.9) and the
    training-mode BN gradient all match flax semantics.
    """

    wreal: int  # real conv1 output width (pad columns masked)
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    impl: str = "auto"  # pallas | xla | auto (pallas on TPU)

    @nn.compact
    def __call__(self, ye, yo, train: bool):
        from ..ops.stem_native import (
            native_bn_relu_pool,
            native_bn_relu_pool_train,
        )

        c = 64
        scale = self.param(
            "scale", nn.initializers.ones, (c,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (c,), self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(c, jnp.float32)
        )
        if train:
            pooled, mean, var = native_bn_relu_pool_train(
                ye, yo, scale, bias, self.wreal, self.epsilon, self.impl
            )
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            pooled = native_bn_relu_pool(
                ye, yo, ra_mean.value, ra_var.value, scale, bias,
                self.wreal, self.epsilon, self.impl,
            )
        return pooled.astype(self.dtype)


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
    # Fused stem tail (ops/stem_pallas.py): conv1 output in quadrant
    # layout + one-pass Pallas BN/ReLU/maxpool kernels (fwd and bwd).
    # Requires fused_front.  Same parameter/batch-stats tree as the
    # unfused stem.
    fused_tail: bool = False
    # Fused trunk BatchNorms (ops/bn_pallas.py): single-pass Pallas
    # stat reductions + analytic train-mode stat gradient for every
    # trunk BN (and the stem bn1 when the fused tail isn't handling it).
    # Same variable tree as nn.BatchNorm.
    fused_bn: bool = False
    # Width-1 3x3 conv formulation (Conv3x3 docstring): "dense"
    # (default) = banded-dense GEMM on the 3x1 stride-1 tail convs with
    # "slim" (center-column lax.conv) elsewhere — output-equal,
    # trajectory-equal, measured fastest (DESIGN.md round 4c); "gemm" =
    # every width-1 contraction as a batch-major row-stacked GEMM
    # (measured slower, kept as the A/B arm); "full" = dense 3x3
    # baseline.
    w1_conv: str = "dense"
    # Fused NATIVE stem (ops/stem_native.py): conv1 evaluated as two
    # stride-(4,2) row-parity convs + one-pass Pallas stats and
    # BN/ReLU/maxpool kernels (fwd and bwd) at the raw-CQT geometry.
    # Same parameter/batch-stats tree as the unfused stem.
    fused_native_stem: bool = False
    # Extra over-padded conv1 output columns for the native fused stem
    # (lane-width alignment; masked everywhere).  1 -> 384-lane layout.
    native_stem_pad: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        fuse_stem = (
            self.fused_front is not None
            and x.shape[-1] == 1
            and x.shape[1:3] != (self.fused_front, self.fused_front)
        )
        if fuse_stem and self.fused_tail:
            from ..ops.stem_fusion import precomposed_conv1_quadrant

            kernel = _Conv1Kernel(
                in_channels=self.input_channels,
                param_dtype=self.param_dtype,
                name="conv1",
            )()
            yq = precomposed_conv1_quadrant(
                x[..., 0], kernel, out_size=self.fused_front, dtype=self.dtype
            )
            x = _QuadrantBNReLUPool(
                dtype=self.dtype, param_dtype=self.param_dtype, name="bn1"
            )(yq, train)
        elif fuse_stem:
            from ..ops.stem_fusion import precomposed_conv1

            kernel = _Conv1Kernel(
                in_channels=self.input_channels,
                param_dtype=self.param_dtype,
                name="conv1",
            )()
            x = precomposed_conv1(
                x[..., 0], kernel, out_size=self.fused_front, dtype=self.dtype
            )
        elif self.fused_native_stem:
            from ..ops.stem_native import conv1_parity_native, stem_geometry

            if x.shape[-1] != self.input_channels:
                raise ValueError(
                    f"expected {self.input_channels} channels (NHWC), "
                    f"got {x.shape}"
                )
            _, wreal = stem_geometry(x.shape[1], x.shape[2])
            kernel = _Conv1Kernel(
                in_channels=self.input_channels,
                param_dtype=self.param_dtype,
                name="conv1",
            )()
            ye, yo = conv1_parity_native(
                x, kernel, w_pad=self.native_stem_pad, dtype=self.dtype
            )
            x = _NativeBNReLUPool(
                wreal=wreal, dtype=self.dtype,
                param_dtype=self.param_dtype, name="bn1",
            )(ye, yo, train)
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
        if not (fuse_stem and self.fused_tail) and not self.fused_native_stem:
            norm_cls = FusedBatchNorm if self.fused_bn else nn.BatchNorm
            x = norm_cls(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=self.param_dtype, name="bn1",
            )(x)
            x = nn.relu(x)
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
            )

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
                    param_dtype=self.param_dtype, fused_bn=self.fused_bn,
                    w1_conv=self.w1_conv,
                    name=f"layer{stage + 1}_{block}",
                )(x, train)

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 512]
        if self.num_features is not None:
            x = nn.Dense(
                self.num_features, dtype=self.dtype,
                param_dtype=self.param_dtype, name="fc",
            )(x)
        return x.astype(jnp.float32)
