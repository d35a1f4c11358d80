"""Import PyTorch weights into the Flax models.

Covers the three weight sources a reference user has:

- torchvision ``resnet18`` state_dicts (the pretrained backbone of
  ``bestengine.py:23``),
- HF ``ViTModel`` ("facebook/dino-vits8") state_dicts (``ViT_model.py:12``),
- full reference checkpoints: ``best_guitar_tab_model.pt`` /
  ``best_vit_guitar_tab_model.pt`` dicts with a ``model_state_dict``
  entry, optionally carrying ``nn.DataParallel``'s ``module.`` prefix
  (``tablature_generator.py:553-567``).

Torch is only needed to *load* ``.pt`` files; all converters work on
plain dicts of numpy arrays.  Parity of the converted models against
torch forward passes is tested in ``tests/test_models.py``.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "detach"):  # torch tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)


def strip_module_prefix(sd: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Drop DataParallel's 'module.' prefix (tablature_generator.py:563)."""
    return {
        (k[len("module.") :] if k.startswith("module.") else k): _np(v)
        for k, v in sd.items()
    }


def _conv(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}


def _dense(sd, name):
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _bn(sd, name):
    params = {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}
    stats = {
        "mean": _np(sd[f"{name}.running_mean"]),
        "var": _np(sd[f"{name}.running_var"]),
    }
    return params, stats


def _ln(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def resnet18_variables_from_torch(
    sd: Mapping[str, Any], *, prefix: str = "", with_fc: bool = True
) -> dict:
    """torchvision resnet18 state_dict -> ResNet18 variables
    {'params': ..., 'batch_stats': ...}."""
    sd = strip_module_prefix(sd)
    p = prefix
    params: dict[str, Any] = {"conv1": _conv(sd, f"{p}conv1")}
    stats: dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn(sd, f"{p}bn1")
    for stage in range(1, 5):
        for block in range(2):
            t = f"{p}layer{stage}.{block}"
            f = f"layer{stage}_{block}"
            bp: dict[str, Any] = {
                "conv1": _conv(sd, f"{t}.conv1"),
                "conv2": _conv(sd, f"{t}.conv2"),
            }
            bs: dict[str, Any] = {}
            bp["bn1"], bs["bn1"] = _bn(sd, f"{t}.bn1")
            bp["bn2"], bs["bn2"] = _bn(sd, f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv(sd, f"{t}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{t}.downsample.1"
                )
            params[f] = bp
            stats[f] = bs
    if with_fc and f"{p}fc.weight" in sd:
        params["fc"] = _dense(sd, f"{p}fc")
    return {"params": params, "batch_stats": stats}


def vit_variables_from_torch(sd: Mapping[str, Any], *, prefix: str = "") -> dict:
    """HF ViTModel state_dict -> ViTBackbone variables."""
    sd = strip_module_prefix(sd)
    p = prefix
    emb = f"{p}embeddings"
    params: dict[str, Any] = {
        "cls_token": _np(sd[f"{emb}.cls_token"]),
        "pos_embed": _np(sd[f"{emb}.position_embeddings"]),
        "patch_embed": {
            "kernel": _np(
                sd[f"{emb}.patch_embeddings.projection.weight"]
            ).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{emb}.patch_embeddings.projection.bias"]),
        },
        "ln_final": _ln(sd, f"{p}layernorm"),
    }
    layer = 0
    while f"{p}encoder.layer.{layer}.layernorm_before.weight" in sd:
        t = f"{p}encoder.layer.{layer}"
        attn = f"{t}.attention.attention"
        qkv_w = np.concatenate(
            [_np(sd[f"{attn}.{n}.weight"]).T for n in ("query", "key", "value")],
            axis=1,
        )
        qkv_b = np.concatenate(
            [_np(sd[f"{attn}.{n}.bias"]) for n in ("query", "key", "value")]
        )
        params[f"block{layer}"] = {
            "ln_before": _ln(sd, f"{t}.layernorm_before"),
            "ln_after": _ln(sd, f"{t}.layernorm_after"),
            "qkv": {"kernel": qkv_w, "bias": qkv_b},
            "proj": _dense(sd, f"{t}.attention.output.dense"),
            "mlp_in": _dense(sd, f"{t}.intermediate.dense"),
            "mlp_out": _dense(sd, f"{t}.output.dense"),
        }
        layer += 1
    return {"params": params, "batch_stats": {}}


def _stack_string_modules(sd, fmt: str, n: int = 6):
    """Stack per-string torch Linears into StackedDense kernels [6, in, out]."""
    kernel = np.stack([_np(sd[fmt.format(i=i) + ".weight"]).T for i in range(n)])
    bias = np.stack([_np(sd[fmt.format(i=i) + ".bias"]) for i in range(n)])
    return {"kernel": kernel, "bias": bias}


def _stack_string_bn(sd, fmt: str, n: int = 6):
    params = {
        "scale": np.stack([_np(sd[fmt.format(i=i) + ".weight"]) for i in range(n)]),
        "bias": np.stack([_np(sd[fmt.format(i=i) + ".bias"]) for i in range(n)]),
    }
    stats = {
        "mean": np.stack(
            [_np(sd[fmt.format(i=i) + ".running_mean"]) for i in range(n)]
        ),
        "var": np.stack(
            [_np(sd[fmt.format(i=i) + ".running_var"]) for i in range(n)]
        ),
    }
    return params, stats


def guitartabnet_variables_from_torch(sd: Mapping[str, Any]) -> dict:
    """Reference GuitarTabNet state_dict (bestengine.py:18-48) -> GuitarTabNet
    variables (resnet backbone + stacked branch heads)."""
    sd = strip_module_prefix(sd)
    resnet = resnet18_variables_from_torch(sd, prefix="resnet.")
    heads_p: dict[str, Any] = {}
    heads_s: dict[str, Any] = {}
    # branches.{i}: Sequential(0 Linear, 1 ReLU, 2 BN, 3 Drop,
    #                          4 Linear, 5 ReLU, 6 BN, 7 Drop, 8 Linear)
    heads_p["dense0"] = _stack_string_modules(sd, "branches.{i}.0")
    heads_p["bn0"], heads_s["bn0"] = _stack_string_bn(sd, "branches.{i}.2")
    heads_p["dense1"] = _stack_string_modules(sd, "branches.{i}.4")
    heads_p["bn1"], heads_s["bn1"] = _stack_string_bn(sd, "branches.{i}.6")
    heads_p["out"] = _stack_string_modules(sd, "branches.{i}.8")
    return {
        "params": {"resnet": resnet["params"], "heads": heads_p},
        "batch_stats": {"resnet": resnet["batch_stats"], "heads": heads_s},
    }


def vittab_variables_from_torch(sd: Mapping[str, Any]) -> dict:
    """Reference ViTGuitarTabModel state_dict (ViT_model.py:6-53) -> ViTTab
    variables."""
    sd = strip_module_prefix(sd)
    vit = vit_variables_from_torch(sd, prefix="vit.")
    params: dict[str, Any] = {
        "vit": vit["params"],
        "fc1": _dense(sd, "fc1"),
        "fc2": _dense(sd, "fc2"),
    }
    stats: dict[str, Any] = {}
    params["bn_fc1"], stats["bn_fc1"] = _bn(sd, "bn_fc1")
    params["bn_fc2"], stats["bn_fc2"] = _bn(sd, "bn_fc2")
    # string_heads.{i}: Sequential(0 Dropout, 1 Linear)
    params["heads"] = {"out": _stack_string_modules(sd, "string_heads.{i}.1")}
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a reference ``.pt`` checkpoint's model weights as numpy arrays.

    Handles both raw state_dicts and the best-checkpoint dict layout of
    bestengine.py:985-995 ({'model_state_dict': ...}).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    return strip_module_prefix(ckpt)
