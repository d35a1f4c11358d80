"""Flagship tablature classifiers: backbone + shared trunk + 6 string heads.

All models map [B, H, W, C] spectrogram images to one [B, 6, num_frets]
float32 logits tensor — replacing the reference's list-of-6-tensors
convention (``bestengine.py:42-48``, ``ViT_model.py:95``) with a single
shardable array.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .heads import SimpleStringHeads, StringBranchHeads
from .resnet import ResNet18
from .small_cnn import SmallTabCNN
from .vit import ViTBackbone

Dtype = Any


class GuitarTabNet(nn.Module):
    """ResNet18 -> 256-d trunk -> per-string branch MLPs.

    Same topology as reference ``GuitarTabNet`` (bestengine.py:18-48).
    """

    num_frets: int = 19
    num_strings: int = 6
    input_channels: int = 3
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    fused_front: int | None = None  # precomposed stem front (see ResNet18)
    fused_tail: bool = False  # Pallas BN/ReLU/pool stem tail (see ResNet18)
    fused_bn: bool = False  # Pallas trunk BatchNorms (see ResNet18)
    w1_conv: str = "dense"  # width-1 conv formulation (see Conv3x3)
    fused_native_stem: bool = False  # Pallas native stem (see ResNet18)
    native_stem_pad: int = 1  # lane-pad columns for the native stem

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet18(
            num_features=256, input_channels=self.input_channels,
            dtype=self.dtype, param_dtype=self.param_dtype,
            remat=self.remat, fused_front=self.fused_front,
            fused_tail=self.fused_tail, fused_bn=self.fused_bn,
            w1_conv=self.w1_conv,
            fused_native_stem=self.fused_native_stem,
            native_stem_pad=self.native_stem_pad,
            name="resnet",
        )(x, train=train)
        return StringBranchHeads(
            num_frets=self.num_frets, num_strings=self.num_strings,
            param_dtype=self.param_dtype, name="heads",
        )(feats, train=train)


class ViTTab(nn.Module):
    """ViT-S/8 CLS -> fc1 512 -> fc2 256 (BN + leaky ReLU 0.1) -> heads.

    Same topology as reference ``ViTGuitarTabModel`` (ViT_model.py:6-97).
    """

    num_frets: int = 19
    num_strings: int = 6
    input_channels: int = 3
    hidden: int = 384
    layers: int = 12
    heads: int = 6
    patch: int | tuple[int, int] = 8  # int = square; (ph, pw) rectangular
    dropout: float = 0.3
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    attention_impl: str = "xla"  # xla | pallas
    gelu: str = "auto"  # auto | exact | tanh
    conv_stem: bool = False  # 3x3 conv stack embedding (see ViTBackbone)

    @nn.compact
    def __call__(self, x, train: bool = False):
        cls = ViTBackbone(
            hidden=self.hidden, layers=self.layers, heads=self.heads,
            patch=self.patch, input_channels=self.input_channels,
            dtype=self.dtype, param_dtype=self.param_dtype,
            remat=self.remat, attention_impl=self.attention_impl,
            gelu=self.gelu, conv_stem=self.conv_stem, name="vit",
        )(x, train=train)

        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            param_dtype=self.param_dtype, name=name,
        )
        kaiming = nn.initializers.variance_scaling(
            2.0, "fan_out", "truncated_normal"
        )
        x = nn.Dropout(self.dropout, deterministic=not train)(cls)
        x = nn.Dense(512, kernel_init=kaiming, param_dtype=self.param_dtype,
                     name="fc1")(x)
        x = nn.leaky_relu(bn("bn_fc1")(x), negative_slope=0.1)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(256, kernel_init=kaiming, param_dtype=self.param_dtype,
                     name="fc2")(x)
        x = nn.leaky_relu(bn("bn_fc2")(x), negative_slope=0.1)
        return SimpleStringHeads(
            num_frets=self.num_frets, num_strings=self.num_strings,
            dropout=self.dropout / 2, param_dtype=self.param_dtype,
            name="heads",
        )(x, train=train)


def _resolve_attention(impl: str, tokens: int = 785) -> str:
    """'auto' -> the fused Pallas kernel on real TPUs (Mosaic lowering)
    when the sequence is long enough to fill its tiles, XLA attention
    elsewhere (CPU tests run the kernel via interpret-mode tests
    instead).

    Measured crossover (v5e train step, DESIGN.md): XLA wins at N=37
    (1.35x) and N=65 (1.42x); the fused kernel wins at N=197 (1.19x)
    and N=785 (1.9x).  The boundary is the kernel's 128-token tile:
    at N<=128 the padded score block plus fixed per-grid-step cost
    lose to XLA's small [B,H,N,N] materialization; past one tile the
    materialization grows quadratically and the kernel wins."""
    if impl != "auto":
        return impl
    from ..ops.cqt_pallas import supports_pallas

    return "pallas" if supports_pallas() and tokens > 128 else "xla"


def build_model(cfg: ModelConfig) -> nn.Module:
    dtype = jnp.dtype(cfg.dtype)
    param_dtype = jnp.dtype(cfg.param_dtype)
    if cfg.stem_fusion not in ("on", "off", "fused"):
        raise ValueError(
            "stem_fusion must be 'on', 'off' or 'fused', "
            f"got {cfg.stem_fusion!r}"
        )
    if cfg.bn_fusion not in ("on", "off"):
        raise ValueError(
            f"bn_fusion must be 'on' or 'off', got {cfg.bn_fusion!r}"
        )
    if cfg.w1_conv not in ("slim", "gemm", "dense", "full"):
        raise ValueError(
            "w1_conv must be 'slim', 'gemm', 'dense' or 'full', "
            f"got {cfg.w1_conv!r}"
        )
    if cfg.arch == "resnet18":
        return GuitarTabNet(
            num_frets=cfg.num_frets, num_strings=cfg.num_strings,
            input_channels=cfg.input_channels, dtype=dtype,
            param_dtype=param_dtype, remat=cfg.remat,
            fused_front=224 if cfg.stem_fusion != "off" else None,
            fused_tail=cfg.stem_fusion == "fused",
            fused_bn=cfg.bn_fusion == "on",
        )
    if cfg.vit_conv_stem and cfg.arch not in ("vit_s8", "vit_native"):
        raise ValueError(
            f"vit_conv_stem only applies to ViT archs, got {cfg.arch!r}"
        )
    if cfg.arch == "vit_s8":
        return ViTTab(
            num_frets=cfg.num_frets, num_strings=cfg.num_strings,
            input_channels=cfg.input_channels, hidden=cfg.vit_hidden,
            layers=cfg.vit_layers, heads=cfg.vit_heads, patch=cfg.vit_patch,
            dropout=cfg.dropout, dtype=dtype, param_dtype=param_dtype,
            remat=cfg.remat, gelu=cfg.gelu,
            conv_stem=cfg.vit_conv_stem,
            attention_impl=_resolve_attention(
                cfg.attention_impl, tokens=(224 // cfg.vit_patch) ** 2 + 1
            ),
        )
    if cfg.arch == "vit_native":
        # TPU-first extension (not in the reference), the ViT twin of
        # resnet18_native: the same ViT-S body consumes the raw [96, 9]
        # CQT through rectangular (vit_patch, vit_native_patch_w)
        # patches — a 12x3 token grid (36 + CLS) instead of the 224^2
        # upsample's 784 tokens.  The upsample adds no information, and
        # per-window FLOPs drop ~28x (attention ~450x).
        return ViTTab(
            num_frets=cfg.num_frets, num_strings=cfg.num_strings,
            input_channels=1, hidden=cfg.vit_hidden,
            layers=cfg.vit_layers, heads=cfg.vit_heads,
            patch=(cfg.vit_patch, cfg.vit_native_patch_w),
            dropout=cfg.dropout, dtype=dtype, param_dtype=param_dtype,
            remat=cfg.remat, gelu=cfg.gelu,
            conv_stem=cfg.vit_conv_stem,
            attention_impl=_resolve_attention(
                cfg.attention_impl,
                tokens=(96 // cfg.vit_patch) * (9 // cfg.vit_native_patch_w)
                + 1,
            ),
        )
    if cfg.arch == "resnet18_native":
        # TPU-first extension (not in the reference): the 96x9 CQT goes
        # straight into the backbone — no information is added by the
        # 224^2 bicubic upsample, and compute drops ~25x per window.
        return GuitarTabNet(
            num_frets=cfg.num_frets, num_strings=cfg.num_strings,
            input_channels=1, dtype=dtype, param_dtype=param_dtype,
            remat=cfg.remat, fused_bn=cfg.bn_fusion == "on",
            w1_conv=cfg.w1_conv,
            # "fused" at the native geometry = the row-parity conv1 split
            # + one-pass Pallas stats/BN/ReLU/pool tail (ops/stem_native)
            fused_native_stem=cfg.stem_fusion == "fused",
        )
    if cfg.arch == "small_cnn":
        return SmallTabCNN(
            num_frets=cfg.num_frets, num_strings=cfg.num_strings,
            dtype=dtype, param_dtype=param_dtype,
        )
    raise ValueError(f"unknown arch {cfg.arch!r}")
