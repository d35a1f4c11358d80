"""Model shapes + numerical parity against torch reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guitar_tablature_classification_tpu.models import (
    GuitarTabNet,
    ResNet18,
    SmallTabCNN,
    ViTBackbone,
    ViTTab,
    build_model,
)
from guitar_tablature_classification_tpu.models.torch_import import (
    guitartabnet_variables_from_torch,
    resnet18_variables_from_torch,
    vit_variables_from_torch,
    vittab_variables_from_torch,
)
from guitar_tablature_classification_tpu.config import ModelConfig

torch = pytest.importorskip("torch")


def test_guitartabnet_shapes():
    model = GuitarTabNet(dtype=jnp.float32)
    x = jnp.zeros((2, 96, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 6, 19)
    assert y.dtype == jnp.float32


def test_small_cnn_shapes_and_train_mode():
    model = SmallTabCNN(dtype=jnp.float32)
    x = jnp.zeros((4, 96, 9, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert y.shape == (4, 6, 19)


def test_build_model_factory():
    for arch in ("resnet18", "vit_s8", "vit_native", "small_cnn"):
        m = build_model(ModelConfig(arch=arch))
        assert m is not None
    with pytest.raises(ValueError):
        build_model(ModelConfig(arch="nope"))


def _torch_resnet18(num_classes=1000):
    """torchvision-compatible resnet18 (same module names/state_dict keys),
    built locally because torchvision is not installed in this image."""
    import torch.nn as tnn

    class TorchBasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + idt)

    class TorchResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(
                TorchBasicBlock(64, 64), TorchBasicBlock(64, 64)
            )
            self.layer2 = tnn.Sequential(
                TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128)
            )
            self.layer3 = tnn.Sequential(
                TorchBasicBlock(128, 256, 2), TorchBasicBlock(256, 256)
            )
            self.layer4 = tnn.Sequential(
                TorchBasicBlock(256, 512, 2), TorchBasicBlock(512, 512)
            )
            self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
            self.fc = tnn.Linear(512, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x).flatten(1)
            return self.fc(x)

    return TorchResNet18()


def test_resnet18_importer_accepts_canonical_torchvision_keys():
    """The public torchvision resnet18 state_dict schema, hardcoded: any
    real pretrained checkpoint with these keys imports.  (Real weights are
    unreachable in this image — no torchvision, no egress — so the key
    contract is the strongest offline check; see ROADMAP 'pretrained
    weights' for the fallback story.)"""
    bn = lambda p: [  # noqa: E731
        f"{p}.weight", f"{p}.bias", f"{p}.running_mean", f"{p}.running_var",
        f"{p}.num_batches_tracked",
    ]
    canonical = ["conv1.weight", *bn("bn1")]
    for stage in range(1, 5):
        for block in range(2):
            p = f"layer{stage}.{block}"
            canonical += [f"{p}.conv1.weight", *bn(f"{p}.bn1"),
                          f"{p}.conv2.weight", *bn(f"{p}.bn2")]
            if stage > 1 and block == 0:
                canonical += [f"{p}.downsample.0.weight",
                              *bn(f"{p}.downsample.1")]
    canonical += ["fc.weight", "fc.bias"]

    tm = _torch_resnet18()
    assert set(tm.state_dict().keys()) == set(canonical)

    variables = resnet18_variables_from_torch(tm.state_dict())
    model = ResNet18(num_features=1000, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 1000)


def test_resnet18_matches_torch():
    torch.manual_seed(0)
    tm = _torch_resnet18()
    tm.eval()
    variables = resnet18_variables_from_torch(tm.state_dict())
    model = ResNet18(num_features=1000, dtype=jnp.float32)

    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_vit_matches_hf():
    transformers = pytest.importorskip("transformers")
    cfg = transformers.ViTConfig(
        hidden_size=384, num_hidden_layers=2, num_attention_heads=6,
        intermediate_size=1536, patch_size=8, image_size=32,
    )
    torch.manual_seed(0)
    tm = transformers.ViTModel(cfg, add_pooling_layer=False)
    tm.eval()
    variables = vit_variables_from_torch(tm.state_dict())
    model = ViTBackbone(
        hidden=384, layers=2, heads=6, patch=8, image_size=32,
        dtype=jnp.float32,
    )
    x = np.random.default_rng(1).standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = (
            tm(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)))
            .last_hidden_state[:, 0]
            .numpy()
        )
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def _torch_guitartabnet():
    """Reference GuitarTabNet topology (bestengine.py:18-48), random init."""
    import torch.nn as tnn

    class TorchTabNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.resnet = _torch_resnet18()
            self.resnet.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.resnet.fc = tnn.Linear(512, 256)
            self.branches = tnn.ModuleList(
                [
                    tnn.Sequential(
                        tnn.Linear(256, 128), tnn.ReLU(), tnn.BatchNorm1d(128),
                        tnn.Dropout(0.3), tnn.Linear(128, 64), tnn.ReLU(),
                        tnn.BatchNorm1d(64), tnn.Dropout(0.2), tnn.Linear(64, 19),
                    )
                    for _ in range(6)
                ]
            )

        def forward(self, x):
            f = self.resnet(x)
            return [b(f) for b in self.branches]

    return TorchTabNet()


def test_guitartabnet_matches_torch_reference_topology():
    torch.manual_seed(1)
    tm = _torch_guitartabnet()
    tm.eval()
    variables = guitartabnet_variables_from_torch(tm.state_dict())
    model = GuitarTabNet(dtype=jnp.float32)

    x = np.random.default_rng(2).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = np.stack(
            [o.numpy() for o in tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))],
            axis=1,
        )  # [B, 6, 19]
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_vittab_matches_torch_reference_topology():
    transformers = pytest.importorskip("transformers")
    import torch.nn as tnn
    import torch.nn.functional as F

    cfg = transformers.ViTConfig(
        hidden_size=384, num_hidden_layers=2, num_attention_heads=6,
        intermediate_size=1536, patch_size=8, image_size=32,
    )

    class TorchViTTab(tnn.Module):
        """Reference ViTGuitarTabModel topology (ViT_model.py:6-97)."""

        def __init__(self):
            super().__init__()
            self.vit = transformers.ViTModel(cfg, add_pooling_layer=False)
            self.dropout1 = tnn.Dropout(0.3)
            self.fc1 = tnn.Linear(384, 512)
            self.bn_fc1 = tnn.BatchNorm1d(512)
            self.dropout2 = tnn.Dropout(0.3)
            self.fc2 = tnn.Linear(512, 256)
            self.bn_fc2 = tnn.BatchNorm1d(256)
            self.string_heads = tnn.ModuleList(
                [
                    tnn.Sequential(tnn.Dropout(0.15), tnn.Linear(256, 19))
                    for _ in range(6)
                ]
            )

        def forward(self, x):
            cls = self.vit(pixel_values=x).last_hidden_state[:, 0]
            x = self.dropout1(cls)
            x = F.leaky_relu(self.bn_fc1(self.fc1(x)), negative_slope=0.1)
            x = self.dropout2(x)
            x = F.leaky_relu(self.bn_fc2(self.fc2(x)), negative_slope=0.1)
            return [h(x) for h in self.string_heads]

    torch.manual_seed(2)
    tm = TorchViTTab()
    tm.eval()
    variables = vittab_variables_from_torch(tm.state_dict())
    model = ViTTab(layers=2, dtype=jnp.float32)

    x = np.random.default_rng(3).standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = np.stack(
            [o.numpy() for o in tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))],
            axis=1,
        )
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_remat_models_match_nonremat():
    """jax.checkpoint must not change numerics, only memory."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    plain = GuitarTabNet(dtype=jnp.float32)
    remat = GuitarTabNet(dtype=jnp.float32, remat=True)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)

    def loss(model, v):
        def f(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            return jnp.mean(out**2)
        return jax.value_and_grad(f)(v["params"])

    l1, g1 = loss(plain, variables)
    l2, g2 = loss(remat, variables)
    assert abs(float(l1) - float(l2)) < 1e-6
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pallas_attention_matches_xla():
    from guitar_tablature_classification_tpu.ops.attention_pallas import (
        fused_attention,
    )

    rng = np.random.default_rng(7)
    b, n, h, dh = 2, 50, 4, 64  # n deliberately not tile-aligned
    q = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)
    want = jax.nn.dot_product_attention(q, k, v)
    got = fused_attention(q, k, v, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_attention_gradients_match_xla():
    from guitar_tablature_classification_tpu.ops.attention_pallas import (
        fused_attention,
    )

    rng = np.random.default_rng(8)
    b, n, h, dh = 1, 40, 2, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) ** 2)

    def loss_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, 128, True) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_pallas_attention_bf16_matches_xla():
    """bf16 operand policy: GEMMs run on bf16 inputs with f32
    accumulation (softmax/ds in f32), matching
    jax.nn.dot_product_attention's own bf16 behavior to bf16 tolerance
    for both values and gradients."""
    from guitar_tablature_classification_tpu.ops.attention_pallas import (
        fused_attention,
    )

    rng = np.random.default_rng(11)
    b, n, h, dh = 1, 40, 2, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.bfloat16)
    want = jax.nn.dot_product_attention(q, k, v)
    got = fused_attention(q, k, v, 128, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v).astype(
            jnp.float32) ** 2)

    def loss_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, 128, True).astype(
            jnp.float32) ** 2)

    gw = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gg, gw):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            atol=0.25, rtol=0.1,
        )


def test_resnet18_native_variant():
    from guitar_tablature_classification_tpu.train import make_preprocess

    cfg = ModelConfig(arch="resnet18_native", dtype="float32")
    model = build_model(cfg)
    preprocess = make_preprocess(cfg)
    feats = jnp.asarray(
        np.random.default_rng(0).uniform(-120, 0, (2, 96, 9)), jnp.float32
    )
    x = preprocess(feats)
    assert x.shape == (2, 96, 9, 1)  # no 224 upsample
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 6, 19)


@pytest.mark.parametrize("mode", ["slim", "gemm", "dense"])
def test_w1_conv_matches_full(mode):
    """The width-1 center-column contraction (ModelConfig.w1_conv,
    models/resnet.py Conv3x3) must equal the full 3x3 conv on the native
    trunk: the dropped kernel columns only ever multiply zero padding.
    Both formulations — "slim" (center-column lax.conv) and "gemm" (the
    same contraction as one batch-major row-stacked GEMM) — are checked
    on forward logits AND parameter gradients with shared weights."""
    from guitar_tablature_classification_tpu.ops import (
        label_smoothing_loss,
    )
    from guitar_tablature_classification_tpu.train import make_preprocess

    cfg_slim = ModelConfig(arch="resnet18_native", dtype="float32",
                           w1_conv=mode)
    cfg_full = ModelConfig(
        arch="resnet18_native", dtype="float32", w1_conv="full"
    )
    slim, full = build_model(cfg_slim), build_model(cfg_full)
    preprocess = make_preprocess(cfg_full)
    feats = jnp.asarray(
        np.random.default_rng(1).uniform(-120, 0, (4, 96, 9)), jnp.float32
    )
    x = preprocess(feats)
    variables = full.init(jax.random.PRNGKey(0), x, train=False)
    labels = jnp.asarray(
        np.random.default_rng(2).integers(0, 19, (4, 6)), jnp.int32
    )

    # same variable tree: slim applies the full model's weights directly
    y_full = full.apply(variables, x, train=False)
    y_slim = slim.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_slim), np.asarray(y_full), atol=2e-4, rtol=1e-4
    )

    def loss_fn(model):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(3)},
            )
            return label_smoothing_loss(out, labels, 0.05)
        return f

    g_full = jax.grad(loss_fn(full))(variables["params"])
    g_slim = jax.grad(loss_fn(slim))(variables["params"])
    flat_f = jax.tree_util.tree_flatten_with_path(g_full)[0]
    flat_s = {str(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(g_slim)[0]}
    for path, want in flat_f:
        got = flat_s[str(path)]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-4, rtol=2e-3,
            err_msg=str(path),
        )


def test_vit_native_variant():
    """vit_native: the ViT-S body patches the raw [96, 9] CQT with
    rectangular (8, 3) patches — a 12x3=36-token grid + CLS, no 224^2
    upsample (the ViT twin of resnet18_native)."""
    from guitar_tablature_classification_tpu.train import make_preprocess

    cfg = ModelConfig(arch="vit_native", dtype="float32",
                      attention_impl="xla")
    model = build_model(cfg)
    preprocess = make_preprocess(cfg)
    feats = jnp.asarray(
        np.random.default_rng(0).uniform(-120, 0, (2, 96, 9)), jnp.float32
    )
    x = preprocess(feats)
    assert x.shape == (2, 96, 9, 1)  # no 224 upsample, single channel
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # token grid: (96/8) x (9/3) + CLS
    pos = variables["params"]["vit"]["pos_embed"]
    assert pos.shape == (1, 12 * 3 + 1, 384)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 6, 19)
    # dropout + BN-stat path (train mode) runs too
    y, _ = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert y.shape == (2, 6, 19)


def test_vit_square_patch_tuple_matches_int():
    """patch=(8, 8) is exactly patch=8 (same param tree, same output)."""
    from guitar_tablature_classification_tpu.models.vit import ViTBackbone

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 16, 16, 3)), jnp.float32
    )
    kw = dict(hidden=32, layers=1, heads=2, dtype=jnp.float32)
    m_int = ViTBackbone(patch=8, **kw)
    m_tup = ViTBackbone(patch=(8, 8), **kw)
    v = m_int.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(
        np.asarray(m_int.apply(v, x)), np.asarray(m_tup.apply(v, x))
    )


def test_stem_strides_factorization():
    """(ph, pw) -> per-stage 3x3 conv strides: H split into 2s, W strides
    applied on the last stages (the 9-column axis stays wide early)."""
    from guitar_tablature_classification_tpu.models.vit import _stem_strides

    assert _stem_strides(16, 3) == [(2, 1), (2, 1), (2, 1), (2, 3)]
    assert _stem_strides(8, 3) == [(2, 1), (2, 1), (2, 3)]
    assert _stem_strides(8, 8) == [(2, 2), (2, 2), (2, 2)]
    assert _stem_strides(1, 1) == [(1, 1)]
    assert _stem_strides(12, 1) == [(2, 1), (2, 1), (3, 1)]  # odd residual


def test_vit_conv_stem_variant():
    """vit_conv_stem=True swaps the patchify for the 3x3 conv stack but
    keeps the token grid (pos_embed shape), output shape and the
    train-mode BN-stats path working; the default tree is unchanged
    (old checkpoints unaffected)."""
    from guitar_tablature_classification_tpu.train import make_preprocess

    cfg = ModelConfig(arch="vit_native", vit_patch=16, vit_conv_stem=True,
                      dtype="float32", attention_impl="xla")
    model = build_model(cfg)
    x = make_preprocess(cfg)(jnp.asarray(
        np.random.default_rng(0).uniform(-120, 0, (2, 96, 9)), jnp.float32
    ))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]["vit"]
    assert "patch_embed" not in params
    # 16 = 2^4 -> four 3x3 stages + the 1x1 projection
    assert {f"stem_conv{i}" for i in range(4)} <= set(params)
    assert "stem_proj" in params
    # same (96/16) x (9/3) token grid as the patchify embedding
    assert params["pos_embed"].shape == (1, 6 * 3 + 1, 384)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 6, 19)
    y, _ = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert np.all(np.isfinite(np.asarray(y)))

    # default (conv_stem=False) tree still has the patchify embedding
    base = build_model(ModelConfig(arch="vit_native", vit_patch=16,
                                   dtype="float32", attention_impl="xla"))
    bp = base.init(jax.random.PRNGKey(0), x, train=False)["params"]["vit"]
    assert "patch_embed" in bp and "stem_proj" not in bp


def test_vit_conv_stem_arch_guard():
    with pytest.raises(ValueError, match="vit_conv_stem"):
        build_model(ModelConfig(arch="resnet18_native", vit_conv_stem=True))


def test_vit_conv_stem_torch_export_named_error(tmp_path):
    """A conv-stem tree has no reference-layout patch_embed: torch
    export must fail with a named error, not a KeyError (the HF/DINO
    layout only covers the patchify embedding — vit.py docstring)."""
    from guitar_tablature_classification_tpu.models.torch_export import (
        save_torch_checkpoint,
    )
    from guitar_tablature_classification_tpu.train import make_preprocess

    cfg = ModelConfig(arch="vit_native", vit_patch=16, vit_conv_stem=True,
                      dtype="float32", attention_impl="xla")
    model = build_model(cfg)
    x = make_preprocess(cfg)(jnp.zeros((1, 96, 9), jnp.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(ValueError, match="conv-stem"):
        save_torch_checkpoint(
            str(tmp_path / "m.pt"), variables, arch="vit_native"
        )


def test_vit_conv_stem_torch_serve_named_error(tmp_path):
    """Serving a torch checkpoint into a conv-stem model config is a
    layout mismatch: named error, not a flax tree traceback."""
    import torch

    from guitar_tablature_classification_tpu.infer.transcribe import (
        transcriber_from_torch_checkpoint,
    )

    path = tmp_path / "ref.pt"
    torch.save({"model_state_dict": {}}, str(path))
    cfg = ModelConfig(arch="vit_native", vit_patch=16, vit_conv_stem=True)
    with pytest.raises(ValueError, match="conv-stem"):
        transcriber_from_torch_checkpoint(
            str(path), arch="vit_native", model_cfg=cfg
        )


def test_resolve_attention_token_aware(monkeypatch):
    """'auto' picks the fused kernel only past its 128-token tile
    (measured: XLA wins at N=37/65, the kernel at N=197/785 —
    DESIGN.md round-3c)."""
    from guitar_tablature_classification_tpu.models import tabnet
    from guitar_tablature_classification_tpu.ops import cqt_pallas

    monkeypatch.setattr(cqt_pallas, "supports_pallas", lambda: True)
    assert tabnet._resolve_attention("auto", tokens=785) == "pallas"
    assert tabnet._resolve_attention("auto", tokens=197) == "pallas"
    assert tabnet._resolve_attention("auto", tokens=65) == "xla"
    assert tabnet._resolve_attention("auto", tokens=37) == "xla"
    # explicit choices are never overridden
    assert tabnet._resolve_attention("pallas", tokens=37) == "pallas"
    assert tabnet._resolve_attention("xla", tokens=785) == "xla"
    monkeypatch.setattr(cqt_pallas, "supports_pallas", lambda: False)
    assert tabnet._resolve_attention("auto", tokens=785) == "xla"


def test_vit_patch_divisibility_error():
    from guitar_tablature_classification_tpu.models.vit import ViTBackbone

    m = ViTBackbone(patch=(8, 2), hidden=32, layers=1, heads=2)
    x = jnp.zeros((1, 96, 9, 1))
    with pytest.raises(ValueError, match="not divisible"):
        m.init(jax.random.PRNGKey(0), x)


def test_torch_export_round_trip_guitartabnet():
    """flax -> reference state_dict -> torch load_state_dict(strict) ->
    forward parity."""
    from guitar_tablature_classification_tpu.models.torch_export import (
        guitartabnet_state_dict,
    )

    model = GuitarTabNet(dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(3), x, train=False)
    sd = guitartabnet_state_dict(variables)

    tm = _torch_guitartabnet()
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}, strict=True)
    tm.eval()
    with torch.no_grad():
        want = np.stack(
            [o.numpy() for o in tm(torch.from_numpy(
                np.asarray(x).transpose(0, 3, 1, 2).copy()))],
            axis=1,
        )
    got = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_torch_export_round_trip_vittab(tmp_path):
    """flax ViTTab -> .pt file -> transcriber_from_torch_checkpoint ->
    identical variables."""
    from guitar_tablature_classification_tpu.models.torch_export import (
        save_torch_checkpoint,
    )
    from guitar_tablature_classification_tpu.models.torch_import import (
        load_torch_checkpoint,
        vittab_variables_from_torch,
    )

    model = ViTTab(layers=2, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(4), x, train=False)
    path = str(tmp_path / "export.pt")
    save_torch_checkpoint(path, variables, arch="vit_s8", meta={"epoch": 1})

    back = vittab_variables_from_torch(load_torch_checkpoint(path))
    flat_a = {
        str(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    }
    flat_b = {
        str(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(back["params"])[0]
    }
    assert flat_a.keys() == flat_b.keys()
    for key in flat_a:
        np.testing.assert_allclose(
            flat_a[key], flat_b[key], atol=1e-6, err_msg=key
        )


def test_fused_stem_front_matches_materialized_path():
    """build_model(stem_fusion='auto') must produce the same parameters
    and (at fp32) the same logits as the materialized resize/tile/
    normalize/conv1 path — the fusion is exact linear algebra."""
    from guitar_tablature_classification_tpu.config import ModelConfig
    from guitar_tablature_classification_tpu.models import build_model
    from guitar_tablature_classification_tpu.train import make_preprocess

    feats = jnp.asarray(
        np.random.default_rng(0).uniform(-120, 0, (2, 96, 9)), jnp.float32
    )
    cfg_on = ModelConfig(arch="resnet18", dtype="float32", stem_fusion="on")
    cfg_off = ModelConfig(arch="resnet18", dtype="float32", stem_fusion="off")
    m_on, m_off = build_model(cfg_on), build_model(cfg_off)
    p_on = make_preprocess(cfg_on, image_size=224)
    p_off = make_preprocess(cfg_off, image_size=224)

    x_on, x_off = p_on(feats), p_off(feats)
    assert x_on.shape == (2, 96, 9, 1)  # raw CQT into the fused front
    assert x_off.shape == (2, 224, 224, 3)

    v_on = m_on.init(jax.random.PRNGKey(7), x_on, train=False)
    v_off = m_off.init(jax.random.PRNGKey(7), x_off, train=False)
    # identical parameter trees (same names, shapes, init values)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=0), v_on["params"],
        v_off["params"],
    )
    out_on = np.asarray(m_on.apply(v_on, x_on, train=False))
    out_off = np.asarray(m_off.apply(v_off, x_off, train=False))
    np.testing.assert_allclose(out_on, out_off, atol=2e-4, rtol=1e-3)


def test_pallas_attention_multi_qtile_fwd_and_grads():
    """n > q_tile exercises the cross-tile dk/dv accumulation path
    (zero-init at iq==0 + += across revisited VMEM output blocks) that
    the small-n tests never reach — the production N=785 spans 7 tiles."""
    from guitar_tablature_classification_tpu.ops.attention_pallas import (
        fused_attention,
    )

    rng = np.random.default_rng(11)
    b, n, h, dh = 1, 300, 2, 64  # 3 q-tiles at q_tile=128
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, h, dh)), jnp.float32)
        for _ in range(3)
    )
    want = jax.nn.dot_product_attention(q, k, v)
    got = fused_attention(q, k, v, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def loss(fn):
        return jax.grad(
            lambda q, k, v: jnp.sum(jnp.tanh(fn(q, k, v))), argnums=(0, 1, 2)
        )(q, k, v)

    ga = loss(lambda q, k, v: fused_attention(q, k, v, 128, True))
    gb = loss(jax.nn.dot_product_attention)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-5)
