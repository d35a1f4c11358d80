"""Fused NATIVE-geometry ResNet stem (ops/stem_native.py).

Oracle chain: composed jnp conv+BN+ReLU+max_pool (flax semantics, the
unfused resnet18_native stem) -> XLA twin (impl='xla', shared core) ->
Pallas kernels (interpret mode) -> full model parity
(stem_fusion='fused' vs 'off' on arch=resnet18_native).

Reference semantics: torchvision maxpool(relu(bn1(conv1(x)))) at the
raw-CQT geometry (bestengine.py:23; the native arch is the TPU-first
extension documented in DESIGN.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guitar_tablature_classification_tpu.ops.stem_native import (
    conv1_parity_native,
    native_bn_relu_pool,
    native_bn_relu_pool_train,
    native_batch_stats,
    stem_geometry,
)

EPS = 1e-5


def _conv1_ref(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _composed_tail(y, mean, var, scale, bias):
    """max_pool3x3s2(relu(bn(y))) with plain jnp/flax ops on NHWC y."""
    from flax import linen as nn

    z = (y - mean) * jax.lax.rsqrt(var + EPS) * scale + bias
    r = nn.relu(z)
    return nn.max_pool(r, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def _rand_case(rng, b=3, h=24, w=9, c=64, cin=1):
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    kernel = jnp.asarray(
        rng.standard_normal((7, 7, cin, c)) * 0.2, jnp.float32
    )
    mean = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    return x, kernel, mean, var, scale, bias


@pytest.mark.parametrize("w_pad", [0, 1])
def test_conv1_parity_matches_stride2_conv(w_pad):
    rng = np.random.default_rng(0)
    x, kernel, *_ = _rand_case(rng, b=2, h=96, w=9)
    y = _conv1_ref(x, kernel)  # [2, 48, 5, 64]
    h2, wy = stem_geometry(96, 9)
    ye, yo = conv1_parity_native(
        x, kernel, w_pad=w_pad, dtype=jnp.float32
    )
    wp = wy + w_pad
    assert ye.shape == (2, h2, wp * 64)
    ye4 = np.asarray(ye).reshape(2, h2, wp, 64)[:, :, :wy]
    yo4 = np.asarray(yo).reshape(2, h2, wp, 64)[:, :, :wy]
    np.testing.assert_allclose(ye4, np.asarray(y[:, 0::2]), atol=1e-5)
    np.testing.assert_allclose(yo4, np.asarray(y[:, 1::2]), atol=1e-5)


def test_stem_geometry_rejects_odd_conv_height():
    with pytest.raises(ValueError):
        stem_geometry(94, 9)  # conv1 out 47 rows — no parity split


def _parity_planes(y, w_pad):
    """Reference [B, Hy, Wy, C] -> (ye, yo) parity planes with w_pad
    junk columns appended (value 7.7 to prove masking)."""
    b, hy, wy, c = y.shape
    pad = jnp.full((b, hy, w_pad, c), 7.7, y.dtype)
    yw = jnp.concatenate([y, pad], axis=2)
    ye = yw[:, 0::2].reshape(b, hy // 2, (wy + w_pad) * c)
    yo = yw[:, 1::2].reshape(b, hy // 2, (wy + w_pad) * c)
    return ye, yo


@pytest.mark.parametrize("impl,interpret", [("xla", False), ("pallas", True)])
@pytest.mark.parametrize("w_pad", [0, 1])
def test_native_pool_forward_matches_composed(impl, interpret, w_pad):
    rng = np.random.default_rng(1)
    x, kernel, mean, var, scale, bias = _rand_case(rng)
    y = _conv1_ref(x, kernel)
    want = _composed_tail(y, mean, var, scale, bias)
    ye, yo = _parity_planes(y, w_pad)
    got = native_bn_relu_pool(
        ye, yo, mean, var, scale, bias, y.shape[2], EPS, impl, interpret
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("impl,interpret", [("xla", False), ("pallas", True)])
@pytest.mark.parametrize("w_pad", [0, 1])
def test_native_pool_grads_match_autodiff(impl, interpret, w_pad):
    """Full custom-VJP check: cotangents for y AND mean/var/scale/bias
    match autodiff of the composed ops (random normal data — no positive
    pool ties, so tie-break conventions cannot differ).  Gradients must
    also vanish on the junk pad columns."""
    rng = np.random.default_rng(2)
    x, kernel, mean, var, scale, bias = _rand_case(rng)
    y = _conv1_ref(x, kernel)
    wy = y.shape[2]

    def loss_fused(y, mean, var, scale, bias):
        ye, yo = _parity_planes(y, w_pad)
        out = native_bn_relu_pool(
            ye, yo, mean, var, scale, bias, wy, EPS, impl, interpret
        )
        return jnp.sum(jnp.tanh(out))

    def loss_ref(y, mean, var, scale, bias):
        return jnp.sum(
            jnp.tanh(_composed_tail(y, mean, var, scale, bias))
        )

    ga = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        y, mean, var, scale, bias
    )
    gb = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        y, mean, var, scale, bias
    )
    for name, a, b in zip(("y", "mean", "var", "scale", "bias"), ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
            err_msg=name,
        )


@pytest.mark.parametrize("impl,interpret", [("xla", False), ("pallas", True)])
@pytest.mark.parametrize("w_pad", [0, 1])
def test_native_batch_stats_exclude_pad(impl, interpret, w_pad):
    rng = np.random.default_rng(3)
    x, kernel, *_ = _rand_case(rng)
    y = _conv1_ref(x, kernel)
    ye, yo = _parity_planes(y, w_pad)
    mean, var = native_batch_stats(
        ye, yo, 64, y.shape[2], impl=impl, interpret=interpret
    )
    yf = y.astype(jnp.float32)
    want_mean = jnp.mean(yf, axis=(0, 1, 2))
    want_var = jnp.mean(yf * yf, axis=(0, 1, 2)) - want_mean**2
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(want_mean), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(want_var), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("impl,interpret", [("xla", False), ("pallas", True)])
@pytest.mark.parametrize("w_pad", [0, 1])
def test_native_pool_train_full_bn_gradient(impl, interpret, w_pad):
    """native_bn_relu_pool_train computes batch stats internally and its
    VJP emits the exact train-mode BatchNorm gradient (stats from y)."""
    rng = np.random.default_rng(4)
    x, kernel, _, _, scale, bias = _rand_case(rng, b=2)
    y = _conv1_ref(x, kernel)
    wy = y.shape[2]

    def loss_fused(y, scale, bias):
        ye, yo = _parity_planes(y, w_pad)
        out, _, _ = native_bn_relu_pool_train(
            ye, yo, scale, bias, wy, EPS, impl, interpret
        )
        return jnp.sum(jnp.tanh(out))

    def loss_ref(y, scale, bias):
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.mean(y * y, axis=(0, 1, 2)) - mean**2
        return jnp.sum(
            jnp.tanh(_composed_tail(y, mean, var, scale, bias))
        )

    ga = jax.grad(loss_fused, argnums=(0, 1, 2))(y, scale, bias)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2))(y, scale, bias)
    for name, a, b in zip(("y", "scale", "bias"), ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
            err_msg=name,
        )


def test_native_fused_model_matches_unfused():
    """Full resnet18_native forward + one train step: stem_fusion='fused'
    vs 'off' agree (same variable tree).  fp32 like the 224-square twin
    test: in bf16 the two stem formulations round BN differently, which
    flips near-tied pool argmaxes and reroutes those elements' gradients
    — benign trajectory noise, but not comparable elementwise (the
    stem-only bf16 delta is checked in
    test_native_stem_bf16_within_rounding)."""
    import dataclasses

    from guitar_tablature_classification_tpu.config import ModelConfig
    from guitar_tablature_classification_tpu.models.tabnet import build_model

    cfg = ModelConfig(arch="resnet18_native", dtype="float32")
    rng = np.random.default_rng(5)
    # batch 8: head-side BatchNorms at tiny batch amplify benign fp32
    # reassociation differences (same note as the 224-square twin test)
    x = jnp.asarray(rng.standard_normal((8, 96, 9, 1)), jnp.float32)

    m_off = build_model(dataclasses.replace(cfg, stem_fusion="off"))
    m_fused = build_model(dataclasses.replace(cfg, stem_fusion="fused"))
    variables = m_off.init(jax.random.PRNGKey(0), x, train=False)
    # same variable tree: fused init must produce identical structure
    v_fused = m_fused.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(
        variables
    ) == jax.tree_util.tree_structure(v_fused)

    out_off = m_off.apply(variables, x, train=False)
    out_fused = m_fused.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_off), np.asarray(out_fused), atol=1e-4, rtol=1e-3
    )

    def loss(m, v):
        def f(params):
            out, updates = m.apply(
                {**v, "params": params}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(7)},
            )
            return jnp.sum(out**2) * 1e-3, updates

        (val, updates), grads = jax.value_and_grad(f, has_aux=True)(
            v["params"]
        )
        return val, grads, updates

    val_off, g_off, up_off = loss(m_off, variables)
    val_fused, g_fused, up_fused = loss(m_fused, variables)
    np.testing.assert_allclose(
        float(val_off), float(val_fused), rtol=1e-5
    )
    # conv1 + bn1 gradients agree (fp32 reassociation noise through the
    # 18-layer trunk bounds exactness; the stem-only comparison is ~1e-9)
    np.testing.assert_allclose(
        np.asarray(g_off["resnet"]["conv1"]["kernel"]),
        np.asarray(g_fused["resnet"]["conv1"]["kernel"]),
        atol=1e-4, rtol=1e-3,
    )
    for k in ("scale", "bias"):
        np.testing.assert_allclose(
            np.asarray(g_off["resnet"]["bn1"][k]),
            np.asarray(g_fused["resnet"]["bn1"][k]),
            atol=1e-4, rtol=1e-3,
        )
    # running stats updated identically (pad columns excluded)
    np.testing.assert_allclose(
        np.asarray(up_off["batch_stats"]["resnet"]["bn1"]["mean"]),
        np.asarray(up_fused["batch_stats"]["resnet"]["bn1"]["mean"]),
        atol=1e-6, rtol=1e-5,
    )


def test_native_stem_bf16_within_rounding():
    """bf16 stem-only A/B: fused vs unfused agree to bf16 rounding on
    the forward and batch stats; gradient differences stay bounded (the
    two formulations legitimately round BN differently, so near-tied
    pool argmaxes may reroute — DESIGN.md round-4)."""
    from guitar_tablature_classification_tpu.models.resnet import ResNet18

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((4, 96, 9, 1)), jnp.float32)
    m_off = ResNet18(num_features=None, input_channels=1, stage_sizes=())
    m_fus = ResNet18(
        num_features=None, input_channels=1, stage_sizes=(),
        fused_native_stem=True,
    )
    v = m_off.init(jax.random.PRNGKey(0), x, train=False)
    out1, u1 = m_off.apply(v, x, train=True, mutable=["batch_stats"])
    out2, u2 = m_fus.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out1, np.float32), np.asarray(out2, np.float32),
        atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(u1["batch_stats"]["bn1"]["mean"]),
        np.asarray(u2["batch_stats"]["bn1"]["mean"]),
        atol=1e-5, rtol=1e-4,
    )
