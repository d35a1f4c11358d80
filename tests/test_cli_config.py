"""CLI flag -> config plumbing (train/run.py) and perf-knob defaults."""

import jax
import jax.numpy as jnp


def _make(argv):
    from guitar_tablature_classification_tpu.train.run import (
        build_parser,
        make_config,
    )

    return make_config(build_parser().parse_args(argv))


def test_default_flags_leave_config_untouched():
    cfg = _make(["--synthetic"])
    assert cfg.model.stem_fusion == "off"
    assert cfg.model.bn_fusion == "off"
    assert cfg.cqt.precision == "highest"


def test_perf_knob_flags_plumb_through():
    cfg = _make([
        "--synthetic", "--arch", "resnet18", "--stem-fusion", "fused",
        "--bn-fusion", "on", "--cqt-precision", "default",
        "--cqt-split", "off",
    ])
    assert cfg.model.stem_fusion == "fused"
    assert cfg.model.bn_fusion == "on"
    assert cfg.cqt.precision == "default"
    assert cfg.cqt.gemm_split == "off"


def test_augment_flags_plumb_through():
    """--augment / --augment-prob map to OptimConfig (the C12 suite was
    previously reachable only through a JSON --config)."""
    cfg = _make(["--synthetic"])
    assert cfg.optim.augment is False  # default: off, like the reference
    cfg = _make([
        "--synthetic", "--recipe", "vit-small-data",
        "--augment", "--augment-prob", "0.3",
    ])
    assert cfg.optim.augment is True
    assert cfg.optim.augment_prob == 0.3
    # --augment-prob alone implies --augment (a bare probability that
    # silently trained unaugmented would poison A/B conclusions)
    cfg = _make(["--synthetic", "--augment-prob", "0.9"])
    assert cfg.optim.augment is True
    assert cfg.optim.augment_prob == 0.9


def test_seed_flag_plumbs_through():
    cfg = _make(["--synthetic"])
    assert cfg.optim.seed == 42  # reference's set_seed default
    cfg = _make(["--synthetic", "--seed", "43"])
    assert cfg.optim.seed == 43
    assert cfg.data.split_seed == 42  # split seed stays torch-parity


def test_cqt_split_default_is_auto():
    cfg = _make(["--synthetic"])
    assert cfg.cqt.gemm_split == "auto"


def test_vit_native_arch_gets_vit_recipe():
    """--arch vit_native inherits the full ViT recipe (AdamW, cosine
    warm restarts, backbone lr/10 — ViT_engine.py:244-264) with only the
    arch swapped."""
    cfg = _make(["--synthetic", "--arch", "vit_native"])
    assert cfg.model.arch == "vit_native"
    assert cfg.optim.name == "adamw"
    assert cfg.optim.schedule == "cosine_warm_restarts"
    assert cfg.optim.backbone_lr_scale == 0.1
    assert cfg.model.vit_native_patch_w == 3


def test_recipe_native_best_preset():
    """--recipe native-best = the DESIGN.md measured-best CNN config:
    resnet18_native, default-tier CQT, knee batch."""
    cfg = _make(["--synthetic", "--recipe", "native-best"])
    assert cfg.model.arch == "resnet18_native"
    assert cfg.cqt.precision == "default"
    assert cfg.data.batch_size == 2048
    assert cfg.optim.name == "adam"  # CNN training recipe otherwise


def test_recipe_vit_small_data_preset():
    """--recipe vit-small-data = vit_native with (16, 3) patches (the
    patch sweep's paired-seed winner, re-confirmed at 43k-window scale)
    on the ViT optimizer recipe with the round-5 scale-sweep winners:
    full backbone lr (the reference's lr/10 split is a finetuning
    recipe; from scratch it costs 0.44 points), cosine_t0=10, and the
    round-5c conv-stem embedding (96.89/97.05 two-seed at 43k windows —
    best of any arch, +0.4-0.5 over small_cnn)."""
    cfg = _make(["--synthetic", "--recipe", "vit-small-data"])
    assert cfg.model.arch == "vit_native"
    assert cfg.model.vit_patch == 16
    assert cfg.model.vit_native_patch_w == 3
    assert cfg.model.vit_conv_stem is True
    assert cfg.optim.name == "adamw"
    assert cfg.optim.schedule == "cosine_warm_restarts"
    assert cfg.optim.backbone_lr_scale == 1.0
    assert cfg.optim.cosine_t0 == 10


def test_recipe_conflicts_with_arch():
    import pytest

    with pytest.raises(SystemExit):
        _make(["--synthetic", "--recipe", "native-best", "--arch", "vit_s8"])


def test_config_file_conflicts_with_recipe_and_arch(tmp_path):
    """--config defines a full base config; combining it with --recipe
    or --arch used to silently ignore the latter — now an error
    (round-4 VERDICT #7: conflicts resolve predictably)."""
    import dataclasses
    import json

    import pytest

    from guitar_tablature_classification_tpu.config import (
        TrainConfig, to_json,
    )

    path = tmp_path / "cfg.json"
    path.write_text(to_json(TrainConfig.cnn_default()))
    with pytest.raises(SystemExit, match="recipe"):
        _make(["--config", str(path), "--recipe", "native-best"])
    with pytest.raises(SystemExit, match="arch"):
        _make(["--config", str(path), "--arch", "small_cnn"])
    # --config alone + field overrides still works
    cfg = _make(["--config", str(path), "--epochs", "2"])
    assert cfg.optim.epochs == 2
    assert dataclasses.asdict(cfg.model)["arch"] == "resnet18"
    del json  # imported for parity with other tests


def test_checkpoint_arch_mismatch_is_a_named_error(tmp_path):
    """Restoring a checkpoint under a different --arch fails with a
    CheckpointMismatchError naming both archs, not an Orbax shape
    traceback (round-4 VERDICT #7; reference analogue: the `module.`
    prefix robustness code, tablature_generator.py:553-567)."""
    import jax
    import numpy as np
    import pytest

    from guitar_tablature_classification_tpu.config import (
        ModelConfig, OptimConfig,
    )
    from guitar_tablature_classification_tpu.models import build_model
    from guitar_tablature_classification_tpu.train import (
        Checkpointer, create_train_state, make_preprocess,
    )
    from guitar_tablature_classification_tpu.train.checkpoint import (
        CheckpointMismatchError,
    )

    import dataclasses

    def make_state(arch):
        mc = ModelConfig(arch=arch, dtype="float32")
        model = build_model(mc)
        pre = make_preprocess(mc)
        feats = pre(np.zeros((1, 96, 9), np.float32))
        return mc, create_train_state(
            model, OptimConfig(), jax.random.PRNGKey(0), feats
        )

    mc_a, state_a = make_state("small_cnn")
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(
        state_a, epoch=0, metrics={"loss": 1.0},
        model_meta=dataclasses.asdict(mc_a),
    )

    mc_b, state_b = make_state("resnet18_native")
    with pytest.raises(CheckpointMismatchError, match="small_cnn"):
        ckpt.restore(state_b, expect_model=dataclasses.asdict(mc_b))

    # matching arch restores fine, and a caller that doesn't pass
    # expectations (older call sites) keeps working
    restored, meta = ckpt.restore(
        state_a, expect_model=dataclasses.asdict(mc_a)
    )
    assert meta["model"]["arch"] == "small_cnn"
    ckpt.restore(state_a)

    # formulation knobs are NOT identity: a checkpoint trained with one
    # w1_conv/stem_fusion setting serves under another (exact-equivalent
    # reformulations share the variable tree by design)
    mc_c = dataclasses.replace(mc_a, stem_fusion="fused")
    ckpt.restore(state_a, expect_model=dataclasses.asdict(mc_c))


def test_checkpoint_tree_mismatch_without_meta_is_wrapped(tmp_path):
    """A pre-metadata checkpoint restored into the wrong template still
    produces CheckpointMismatchError (wrapping the Orbax failure), not a
    raw tree traceback."""
    import jax
    import numpy as np
    import pytest

    from guitar_tablature_classification_tpu.config import (
        ModelConfig, OptimConfig,
    )
    from guitar_tablature_classification_tpu.models import build_model
    from guitar_tablature_classification_tpu.train import (
        Checkpointer, create_train_state, make_preprocess,
    )
    from guitar_tablature_classification_tpu.train.checkpoint import (
        CheckpointMismatchError,
    )

    def make_state(arch):
        mc = ModelConfig(arch=arch, dtype="float32")
        model = build_model(mc)
        pre = make_preprocess(mc)
        feats = pre(np.zeros((1, 96, 9), np.float32))
        return create_train_state(
            model, OptimConfig(), jax.random.PRNGKey(0), feats
        )

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(make_state("small_cnn"), epoch=0, metrics={"loss": 1.0})
    with pytest.raises(CheckpointMismatchError, match="parameter tree"):
        ckpt.restore(make_state("resnet18_native"))


def test_transcribe_cli_checkpoint_mismatch(tmp_path):
    """tab-transcribe --model <ckpt> --arch <wrong> exits with the named
    mismatch (round-4 VERDICT #7)."""
    import dataclasses
    import json

    import jax
    import numpy as np
    import pytest

    from guitar_tablature_classification_tpu.config import (
        ModelConfig, OptimConfig,
    )
    from guitar_tablature_classification_tpu.infer.cli import (
        build_parser as infer_parser,
        load_transcriber,
    )
    from guitar_tablature_classification_tpu.models import build_model
    from guitar_tablature_classification_tpu.train import (
        Checkpointer, create_train_state, make_preprocess,
    )

    mc = ModelConfig(arch="small_cnn", dtype="float32")
    model = build_model(mc)
    pre = make_preprocess(mc)
    state = create_train_state(
        model, OptimConfig(), jax.random.PRNGKey(0),
        pre(np.zeros((1, 96, 9), np.float32)),
    )
    ckpt = Checkpointer(str(tmp_path / "ckpt"), "best")
    ckpt.save(
        state, epoch=0, metrics={"loss": 1.0},
        model_meta=dataclasses.asdict(mc),
    )

    args = infer_parser().parse_args(
        ["x.wav", "--model", str(tmp_path / "ckpt" / "best"),
         "--arch", "resnet18_native"]
    )
    with pytest.raises(SystemExit, match="small_cnn"):
        load_transcriber(args)

    # the matching arch loads
    args = infer_parser().parse_args(
        ["x.wav", "--model", str(tmp_path / "ckpt" / "best"),
         "--arch", "small_cnn"]
    )
    t = load_transcriber(args)
    assert t is not None
    del json


def test_recipe_respects_explicit_overrides():
    cfg = _make([
        "--synthetic", "--recipe", "native-best", "--batch-size", "64",
        "--cqt-precision", "highest", "--epochs", "3",
    ])
    assert cfg.model.arch == "resnet18_native"
    assert cfg.data.batch_size == 64
    assert cfg.cqt.precision == "highest"
    assert cfg.optim.epochs == 3


def test_cqt_precision_maps_to_frontend():
    import dataclasses

    from guitar_tablature_classification_tpu.config import CQTConfig
    from guitar_tablature_classification_tpu.ops import CQTFrontend

    fe_hi = CQTFrontend(CQTConfig())
    assert fe_hi.precision == jax.lax.Precision.HIGHEST
    fe_lo = CQTFrontend(
        dataclasses.replace(CQTConfig(), precision="default")
    )
    assert fe_lo.precision == jax.lax.Precision.DEFAULT
    # explicit ctor arg still wins
    fe_explicit = CQTFrontend(
        dataclasses.replace(CQTConfig(), precision="default"),
        precision=jax.lax.Precision.HIGHEST,
    )
    assert fe_explicit.precision == jax.lax.Precision.HIGHEST


def test_auto_q_tile():
    from guitar_tablature_classification_tpu.ops.attention_pallas import (
        _auto_q_tile,
    )

    assert _auto_q_tile(785) == 896  # ViT-S/8: one full-sequence tile
    assert _auto_q_tile(64) == 128
    assert _auto_q_tile(128) == 128
    big = _auto_q_tile(16384)  # cap: f32 score block stays ~<=4 MB
    assert big % 128 == 0
    assert big * 16384 * 4 <= 4 * 2**20 + 16384 * 4 * 128


def test_auto_q_tile_used_by_default_matches_explicit():
    import numpy as np

    from guitar_tablature_classification_tpu.ops.attention_pallas import (
        fused_attention,
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 30, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 30, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 30, 2, 64)), jnp.float32)
    a = fused_attention(q, k, v, None, True)
    b = fused_attention(q, k, v, 128, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
