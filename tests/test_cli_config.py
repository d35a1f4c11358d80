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
    patch sweep's paired-seed winner) on the full ViT optimizer recipe."""
    cfg = _make(["--synthetic", "--recipe", "vit-small-data"])
    assert cfg.model.arch == "vit_native"
    assert cfg.model.vit_patch == 16
    assert cfg.model.vit_native_patch_w == 3
    assert cfg.optim.name == "adamw"
    assert cfg.optim.schedule == "cosine_warm_restarts"


def test_recipe_conflicts_with_arch():
    import pytest

    with pytest.raises(SystemExit):
        _make(["--synthetic", "--recipe", "native-best", "--arch", "vit_s8"])


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
