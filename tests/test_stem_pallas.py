"""Fused ResNet stem tail (ops/stem_pallas.py + quadrant GEMM front).

Oracle chain: composed jnp BN+ReLU+max_pool (flax semantics)
-> XLA twin (impl='xla', shared core) -> Pallas kernels (interpret mode)
-> full model parity (stem_fusion='fused' vs 'off').

Reference semantics: torchvision maxpool(relu(bn1(conv1(x)))),
bestengine.py:23; quirk notes in ops/stem_pallas.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guitar_tablature_classification_tpu.ops.stem_pallas import (
    bn_relu_pool,
    quadrant_pack,
    quadrant_unpack,
)

EPS = 1e-5


def _composed_reference(y, mean, var, scale, bias):
    """max_pool3x3s2(relu(bn(y))) with plain jnp/flax ops on NHWC y."""
    from flax import linen as nn

    z = (y - mean) * jax.lax.rsqrt(var + EPS) * scale + bias
    r = nn.relu(z)
    return nn.max_pool(r, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def _rand_case(rng, b=3, h=8, w=8, c=8, dtype=jnp.float32):
    y = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
    mean = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    return y, mean, var, scale, bias


def test_quadrant_pack_roundtrip():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, 6, 10, 4)), jnp.float32)
    yq = quadrant_pack(y)
    assert yq.shape == (2, 2, 3, 40)
    np.testing.assert_array_equal(np.asarray(quadrant_unpack(yq, 4)), y)
    # spot-check the documented lane formula
    b, p, q, f = 1, 3, 7, 2
    h2 = 3
    lane = (q % 2) * (5 * 4) + (q // 2) * 4 + f
    assert float(yq[b, p % 2, p // 2, lane]) == float(y[b, p, q, f])


@pytest.mark.parametrize("impl,interpret", [("xla", False), ("pallas", True)])
def test_bn_relu_pool_forward_matches_composed(impl, interpret):
    rng = np.random.default_rng(1)
    y, mean, var, scale, bias = _rand_case(rng)
    want = _composed_reference(y, mean, var, scale, bias)
    got = bn_relu_pool(
        quadrant_pack(y), mean, var, scale, bias, EPS, impl, interpret
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("impl,interpret", [("xla", False), ("pallas", True)])
def test_bn_relu_pool_grads_match_autodiff(impl, interpret):
    """Full custom-VJP check: cotangents for y AND mean/var/scale/bias
    must match autodiff of the composed ops (random normal data — no
    positive pool ties, so tie-break conventions cannot differ)."""
    rng = np.random.default_rng(2)
    y, mean, var, scale, bias = _rand_case(rng)

    def loss_fused(y, mean, var, scale, bias):
        out = bn_relu_pool(
            quadrant_pack(y), mean, var, scale, bias, EPS, impl, interpret
        )
        return jnp.sum(jnp.tanh(out))

    def loss_ref(y, mean, var, scale, bias):
        return jnp.sum(jnp.tanh(_composed_reference(y, mean, var, scale, bias)))

    ga = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        y, mean, var, scale, bias
    )
    gb = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(y, mean, var, scale, bias)
    for name, a, b in zip(("y", "mean", "var", "scale", "bias"), ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_bn_relu_pool_batchstat_gradient_end_to_end():
    """When mean/var are *computed from y* (training BN), the dmean/dvar
    cotangents must combine with the stat reductions' autodiff to give
    the exact train-mode BatchNorm gradient."""
    rng = np.random.default_rng(3)
    y, _, _, scale, bias = _rand_case(rng, b=2, h=6, w=6, c=4)

    def loss_fused(y):
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.mean(y * y, axis=(0, 1, 2)) - mean**2
        out = bn_relu_pool(
            quadrant_pack(y), mean, var, scale, bias, EPS, "xla", False
        )
        return jnp.sum(jnp.tanh(out))

    def loss_ref(y):
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.mean(y * y, axis=(0, 1, 2)) - mean**2
        return jnp.sum(jnp.tanh(_composed_reference(y, mean, var, scale, bias)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_fused)(y)),
        np.asarray(jax.grad(loss_ref)(y)),
        atol=2e-5,
        rtol=1e-4,
    )


@pytest.mark.parametrize("impl,interpret", [("xla", False), ("pallas", True)])
def test_bn_relu_pool_train_full_bn_gradient(impl, interpret):
    """bn_relu_pool_train computes batch stats internally and its VJP
    must reproduce the exact train-mode BatchNorm gradient (direct +
    mean/var stat terms) plus matching (mean, var) outputs."""
    from guitar_tablature_classification_tpu.ops.stem_pallas import (
        bn_relu_pool_train,
    )

    rng = np.random.default_rng(6)
    y, _, _, scale, bias = _rand_case(rng, b=2, h=8, w=8, c=8)

    out, mean, var = bn_relu_pool_train(
        quadrant_pack(y), scale, bias, EPS, impl, interpret
    )
    mean_ref = jnp.mean(y, axis=(0, 1, 2))
    var_ref = jnp.mean(y * y, axis=(0, 1, 2)) - mean_ref**2
    np.testing.assert_allclose(np.asarray(mean), mean_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), var_ref, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(_composed_reference(y, mean_ref, var_ref, scale, bias)),
        atol=1e-5,
    )

    def loss_fused(y, scale, bias):
        out, _, _ = bn_relu_pool_train(
            quadrant_pack(y), scale, bias, EPS, impl, interpret
        )
        return jnp.sum(jnp.tanh(out))

    def loss_ref(y, scale, bias):
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.mean(y * y, axis=(0, 1, 2)) - mean**2
        return jnp.sum(jnp.tanh(_composed_reference(y, mean, var, scale, bias)))

    ga = jax.grad(loss_fused, argnums=(0, 1, 2))(y, scale, bias)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2))(y, scale, bias)
    for name, a, b in zip(("y", "scale", "bias"), ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4, err_msg=name
        )


def test_precomposed_quadrant_front_matches_plain():
    from guitar_tablature_classification_tpu.ops.stem_fusion import (
        precomposed_conv1,
        precomposed_conv1_quadrant,
    )

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (2, 96, 9)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, jnp.float32)
    plain = precomposed_conv1(x, w, dtype=jnp.float32)
    quad = precomposed_conv1_quadrant(x, w, dtype=jnp.float32)
    assert quad.shape == (2, 2, 56, 112 * 64)
    np.testing.assert_allclose(
        np.asarray(quadrant_unpack(quad, 64)),
        np.asarray(plain),
        atol=1e-4,
        rtol=1e-4,
    )


def test_model_fused_stem_matches_unfused():
    """stem_fusion='fused' (fp32, XLA twin on CPU): same parameter tree,
    same eval logits, same train-mode gradients and batch_stats updates
    as the materialized stem."""
    from guitar_tablature_classification_tpu.config import ModelConfig
    from guitar_tablature_classification_tpu.models import build_model
    from guitar_tablature_classification_tpu.train import make_preprocess

    # batch 8: the head-side BatchNorms normalize over the batch axis,
    # and at tiny batch their near-zero variances amplify benign fp32
    # reassociation differences between the two stem formulations.
    feats = jnp.asarray(
        np.random.default_rng(5).uniform(-120, 0, (8, 96, 9)), jnp.float32
    )
    cfg_f = ModelConfig(arch="resnet18", dtype="float32", stem_fusion="fused")
    cfg_o = ModelConfig(arch="resnet18", dtype="float32", stem_fusion="off")
    m_f, m_o = build_model(cfg_f), build_model(cfg_o)
    x_f = make_preprocess(cfg_f, image_size=224)(feats)
    x_o = make_preprocess(cfg_o, image_size=224)(feats)
    assert x_f.shape == (8, 96, 9, 1)

    assert x_o.shape == (8, 224, 224, 3)
    v_f = m_f.init(jax.random.PRNGKey(7), x_f, train=False)
    v_o = m_o.init(jax.random.PRNGKey(7), x_o, train=False)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=0),
        v_f["params"],
        v_o["params"],
    )

    out_f = np.asarray(m_f.apply(v_f, x_f, train=False))
    out_o = np.asarray(m_o.apply(v_o, x_o, train=False))
    np.testing.assert_allclose(out_f, out_o, atol=2e-4, rtol=1e-3)

    # train mode: gradients + batch_stats updates agree
    def loss(model, variables, x, params):
        out, updates = model.apply(
            {**variables, "params": params}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return jnp.sum(out**2) * 1e-3, updates["batch_stats"]

    (l_f, bs_f), g_f = jax.value_and_grad(
        lambda p: loss(m_f, v_f, x_f, p), has_aux=True
    )(v_f["params"])
    (l_o, bs_o), g_o = jax.value_and_grad(
        lambda p: loss(m_o, v_o, x_o, p), has_aux=True
    )(v_o["params"])
    np.testing.assert_allclose(float(l_f), float(l_o), rtol=1e-3)
    flat_f = jax.tree_util.tree_flatten_with_path(g_f)[0]
    flat_o = {str(p): v for p, v in jax.tree_util.tree_flatten_with_path(g_o)[0]}
    # Loose tolerance by design: the two stems agree to ~1e-6 (verified
    # tightly in the isolated tests above), but 20 batch-stat BatchNorms
    # amplify that reassociation-level forward difference into ~1% grad
    # differences — this check only guards the wiring.
    for path, val in flat_f:
        ref = flat_o[str(path)]
        scale = max(1e-6, float(jnp.max(jnp.abs(ref))))
        np.testing.assert_allclose(
            np.asarray(val) / scale, np.asarray(ref) / scale,
            atol=0.03, err_msg=str(path),
        )
    # bn1 running stats see the same batch statistics
    np.testing.assert_allclose(
        np.asarray(bs_f["resnet"]["bn1"]["mean"]),
        np.asarray(bs_o["resnet"]["bn1"]["mean"]),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(bs_f["resnet"]["bn1"]["var"]),
        np.asarray(bs_o["resnet"]["bn1"]["var"]),
        atol=1e-5, rtol=1e-5,
    )
