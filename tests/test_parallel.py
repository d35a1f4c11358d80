"""SPMD data parallelism over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guitar_tablature_classification_tpu.config import (
    MeshConfig,
    ModelConfig,
    OptimConfig,
)
from guitar_tablature_classification_tpu.models import build_model
from guitar_tablature_classification_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
)
from guitar_tablature_classification_tpu.train import (
    create_train_state,
    make_preprocess,
    make_train_step,
)


def _setup(mesh_cfg):
    model_cfg = ModelConfig(arch="small_cnn", dtype="float32")
    model = build_model(model_cfg)
    preprocess = make_preprocess(model_cfg)
    rng = np.random.default_rng(0)
    feats = rng.uniform(-120, 0, (16, 96, 9)).astype(np.float32)
    labels = rng.integers(0, 19, (16, 6))
    batch = {"features": jnp.asarray(feats), "labels": jnp.asarray(labels)}
    state = create_train_state(
        model, OptimConfig(), jax.random.PRNGKey(0),
        preprocess(batch["features"][:1]),
    )
    return model, preprocess, state, batch


def test_mesh_construction():
    mesh = make_mesh(MeshConfig())
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(MeshConfig(model_parallel=2))
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data_parallel=3, model_parallel=2))


def test_dp_train_step_matches_single_device():
    cfg = MeshConfig()
    mesh = make_mesh(cfg)
    model, preprocess, state, batch = _setup(cfg)
    train_step = make_train_step(model, preprocess)

    # single-device result
    s1, m1 = train_step(state, batch, jax.random.PRNGKey(0), 1e-3)

    # sharded result: params replicated, batch sharded over data axis
    model2, preprocess2, state2, _ = _setup(cfg)
    sharded_state = jax.device_put(state2, param_shardings(mesh, state2, cfg))
    sharded_batch = shard_batch(mesh, batch, cfg)
    train_step2 = make_train_step(model2, preprocess2)
    s2, m2 = train_step2(sharded_state, sharded_batch, jax.random.PRNGKey(0), 1e-3)

    assert np.asarray(
        jax.tree.leaves(s2.params)[0].sharding.is_fully_replicated
    )
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    a = np.asarray(jax.tree.leaves(s1.params)[-1])
    b = np.asarray(jax.tree.leaves(s2.params)[-1])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_model_axis_shards_string_heads():
    cfg = MeshConfig(model_parallel=2)
    mesh = make_mesh(cfg)
    model, preprocess, state, batch = _setup(cfg)
    shardings = param_shardings(mesh, state, cfg)

    # the stacked head kernels [6, in, out] must shard over 'model'
    head_kernel_sharding = shardings.params["out"]["kernel"]
    assert head_kernel_sharding.spec == jax.sharding.PartitionSpec("model")

    sharded_state = jax.device_put(state, shardings)
    sharded_batch = shard_batch(mesh, batch, cfg)
    train_step = make_train_step(model, preprocess)
    s2, m2 = train_step(sharded_state, sharded_batch, jax.random.PRNGKey(0), 1e-3)
    assert np.isfinite(float(m2["loss"]))
    # sharding preserved through the step
    assert s2.params["out"]["kernel"].sharding.spec == jax.sharding.PartitionSpec(
        "model"
    )


def test_batch_sharding_spec():
    mesh = make_mesh(MeshConfig())
    sh = batch_sharding(mesh)
    assert sh.spec == jax.sharding.PartitionSpec("data")


def test_mesh_sharded_serving():
    """Transcriber with a mesh: windows shard over the data axis and
    results match single-device serving."""
    from guitar_tablature_classification_tpu.config import CQTConfig
    from guitar_tablature_classification_tpu.infer import Transcriber
    from guitar_tablature_classification_tpu.data import render_performance
    from guitar_tablature_classification_tpu.train import make_preprocess
    from guitar_tablature_classification_tpu.models import build_model

    model_cfg = ModelConfig(arch="small_cnn", dtype="float32")
    cqt_cfg = CQTConfig()
    model = build_model(model_cfg)
    preprocess = make_preprocess(model_cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        preprocess(jnp.zeros((1, cqt_cfg.n_bins, cqt_cfg.n_frames))),
        train=False,
    )
    audio = render_performance([(0, 3, 0.1, 0.8)], 1.5, cqt_cfg)

    single = Transcriber(
        variables, model_cfg=model_cfg, cqt_cfg=cqt_cfg, batch_size=8
    ).transcribe(audio, keep_logits=True)
    mesh = make_mesh(MeshConfig())
    sharded = Transcriber(
        variables, model_cfg=model_cfg, cqt_cfg=cqt_cfg, batch_size=8,
        mesh=mesh,
    ).transcribe(audio, keep_logits=True)
    np.testing.assert_allclose(sharded.logits, single.logits, atol=1e-5)
    np.testing.assert_array_equal(sharded.frets, single.frets)
