"""Export Flax model variables back to reference-layout torch state_dicts.

The inverse of :mod:`.torch_import`: users migrating back (or comparing
against the reference's tooling) get a state_dict whose keys match the
reference ``GuitarTabNet`` (bestengine.py:18-48) / ``ViTGuitarTabModel``
(ViT_model.py:6-53) exactly, loadable with ``load_state_dict(strict=True)``.
Returns plain numpy dicts; wrap values with ``torch.from_numpy`` to save.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _conv(out: dict, name: str, params: dict) -> None:
    out[f"{name}.weight"] = _np(params["kernel"]).transpose(3, 2, 0, 1)


def _dense(out: dict, name: str, params: dict) -> None:
    out[f"{name}.weight"] = _np(params["kernel"]).T
    if "bias" in params:
        out[f"{name}.bias"] = _np(params["bias"])


def _bn(out: dict, name: str, params: dict, stats: dict) -> None:
    out[f"{name}.weight"] = _np(params["scale"])
    out[f"{name}.bias"] = _np(params["bias"])
    out[f"{name}.running_mean"] = _np(stats["mean"])
    out[f"{name}.running_var"] = _np(stats["var"])
    out[f"{name}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _ln(out: dict, name: str, params: dict) -> None:
    out[f"{name}.weight"] = _np(params["scale"])
    out[f"{name}.bias"] = _np(params["bias"])


def resnet18_state_dict(
    variables: dict, *, prefix: str = ""
) -> dict[str, np.ndarray]:
    params, stats = variables["params"], variables["batch_stats"]
    out: dict[str, np.ndarray] = {}
    _conv(out, f"{prefix}conv1", params["conv1"])
    _bn(out, f"{prefix}bn1", params["bn1"], stats["bn1"])
    for stage in range(1, 5):
        for block in range(2):
            f = f"layer{stage}_{block}"
            t = f"{prefix}layer{stage}.{block}"
            _conv(out, f"{t}.conv1", params[f]["conv1"])
            _bn(out, f"{t}.bn1", params[f]["bn1"], stats[f]["bn1"])
            _conv(out, f"{t}.conv2", params[f]["conv2"])
            _bn(out, f"{t}.bn2", params[f]["bn2"], stats[f]["bn2"])
            if "downsample_conv" in params[f]:
                _conv(out, f"{t}.downsample.0", params[f]["downsample_conv"])
                _bn(
                    out, f"{t}.downsample.1", params[f]["downsample_bn"],
                    stats[f]["downsample_bn"],
                )
    if "fc" in params:
        _dense(out, f"{prefix}fc", params["fc"])
    return out


def _unstack_string_dense(out: dict, fmt: str, params: dict) -> None:
    kernel, bias = _np(params["kernel"]), _np(params["bias"])
    for i in range(kernel.shape[0]):
        out[fmt.format(i=i) + ".weight"] = kernel[i].T
        out[fmt.format(i=i) + ".bias"] = bias[i]


def _unstack_string_bn(out: dict, fmt: str, params: dict, stats: dict) -> None:
    for i in range(_np(params["scale"]).shape[0]):
        out[fmt.format(i=i) + ".weight"] = _np(params["scale"])[i]
        out[fmt.format(i=i) + ".bias"] = _np(params["bias"])[i]
        out[fmt.format(i=i) + ".running_mean"] = _np(stats["mean"])[i]
        out[fmt.format(i=i) + ".running_var"] = _np(stats["var"])[i]
        out[fmt.format(i=i) + ".num_batches_tracked"] = np.asarray(
            0, dtype=np.int64
        )


def guitartabnet_state_dict(variables: dict) -> dict[str, np.ndarray]:
    """GuitarTabNet variables -> reference state_dict (resnet.* +
    branches.{i}.{0,2,4,6,8}.*)."""
    out = resnet18_state_dict(
        {
            "params": variables["params"]["resnet"],
            "batch_stats": variables["batch_stats"]["resnet"],
        },
        prefix="resnet.",
    )
    heads_p = variables["params"]["heads"]
    heads_s = variables["batch_stats"]["heads"]
    _unstack_string_dense(out, "branches.{i}.0", heads_p["dense0"])
    _unstack_string_bn(out, "branches.{i}.2", heads_p["bn0"], heads_s["bn0"])
    _unstack_string_dense(out, "branches.{i}.4", heads_p["dense1"])
    _unstack_string_bn(out, "branches.{i}.6", heads_p["bn1"], heads_s["bn1"])
    _unstack_string_dense(out, "branches.{i}.8", heads_p["out"])
    return out


def vit_state_dict(variables: dict, *, prefix: str = "") -> dict[str, np.ndarray]:
    params = variables["params"]
    if "patch_embed" not in params:
        raise ValueError(
            "these ViT variables have no patch_embed — a conv-stem "
            "backbone (vit_conv_stem=True) has no reference-layout "
            "equivalent (the DINO/HF tree carries a single patchify "
            "projection), so torch export/import only cover the "
            "default patchify embedding. Retrain with "
            "vit_conv_stem=False for a torch-portable checkpoint."
        )
    out: dict[str, np.ndarray] = {
        f"{prefix}embeddings.cls_token": _np(params["cls_token"]),
        f"{prefix}embeddings.position_embeddings": _np(params["pos_embed"]),
        f"{prefix}embeddings.patch_embeddings.projection.weight": _np(
            params["patch_embed"]["kernel"]
        ).transpose(3, 2, 0, 1),
        f"{prefix}embeddings.patch_embeddings.projection.bias": _np(
            params["patch_embed"]["bias"]
        ),
    }
    _ln(out, f"{prefix}layernorm", params["ln_final"])
    layer = 0
    while f"block{layer}" in params:
        p = params[f"block{layer}"]
        t = f"{prefix}encoder.layer.{layer}"
        _ln(out, f"{t}.layernorm_before", p["ln_before"])
        _ln(out, f"{t}.layernorm_after", p["ln_after"])
        qkv_w = _np(p["qkv"]["kernel"])  # [D, 3D]
        qkv_b = _np(p["qkv"]["bias"])
        d = qkv_w.shape[0]
        attn = f"{t}.attention.attention"
        for j, name in enumerate(("query", "key", "value")):
            out[f"{attn}.{name}.weight"] = qkv_w[:, j * d : (j + 1) * d].T
            out[f"{attn}.{name}.bias"] = qkv_b[j * d : (j + 1) * d]
        _dense(out, f"{t}.attention.output.dense", p["proj"])
        _dense(out, f"{t}.intermediate.dense", p["mlp_in"])
        _dense(out, f"{t}.output.dense", p["mlp_out"])
        layer += 1
    return out


def vittab_state_dict(variables: dict) -> dict[str, np.ndarray]:
    """ViTTab variables -> reference ViTGuitarTabModel state_dict."""
    params, stats = variables["params"], variables["batch_stats"]
    out = vit_state_dict(
        {"params": params["vit"], "batch_stats": {}}, prefix="vit."
    )
    _dense(out, "fc1", params["fc1"])
    _bn(out, "bn_fc1", params["bn_fc1"], stats["bn_fc1"])
    _dense(out, "fc2", params["fc2"])
    _bn(out, "bn_fc2", params["bn_fc2"], stats["bn_fc2"])
    _unstack_string_dense(out, "string_heads.{i}.1", params["heads"]["out"])
    return out


def save_torch_checkpoint(
    path: str, variables: dict, *, arch: str = "resnet18",
    meta: dict[str, Any] | None = None,
) -> None:
    """Write a reference-layout .pt best-checkpoint dict
    (bestengine.py:985-995 shape)."""
    import torch

    # The native extensions share their reference twin's layout (only
    # tensor shapes differ: 1-channel conv1 / rectangular patch_embed),
    # so their checkpoints stay torch-inspectable too.
    if arch in ("resnet18", "resnet18_native"):
        sd = guitartabnet_state_dict(variables)
    elif arch in ("vit_s8", "vit_native"):
        sd = vittab_state_dict(variables)
    else:
        raise ValueError(f"unknown arch {arch!r}")
    ckpt = {
        "model_state_dict": {
            k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()
        },
    }
    ckpt.update(meta or {})
    torch.save(ckpt, path)
