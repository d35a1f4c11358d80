"""Config system: defaults, recipes, JSON round trip."""

import dataclasses

from guitar_tablature_classification_tpu.config import (
    CQTConfig,
    TrainConfig,
    to_json,
    train_config_from_json,
)


def test_cqt_derived_quantities():
    cfg = CQTConfig()
    assert cfg.window_samples == 8820
    assert cfg.hop_samples == 4410
    assert cfg.n_frames == 9
    # librosa 0.10 symmetric-alpha Q (old-form 1/(2^(1/12)-1) was 16.817)
    assert abs(cfg.q_factor - 17.3316) < 0.01
    serving = CQTConfig.serving_cnn()
    assert serving.sample_rate == 22050 and serving.n_bins == 84


def test_recipe_presets_match_reference_hyperparameters():
    cnn = TrainConfig.cnn_default()
    assert cnn.optim.name == "adam"
    assert cnn.optim.learning_rate == 5e-4  # bestengine.py:1061
    assert cnn.optim.label_smoothing == 0.05  # bestengine.py:878
    assert cnn.optim.early_stop_patience == 7  # bestengine.py:1000
    assert cnn.optim.plateau_factor == 0.5 and cnn.optim.plateau_patience == 3

    vit = TrainConfig.vit_default()
    assert vit.optim.name == "adamw"
    assert vit.optim.label_smoothing == 0.1  # ViT_engine.py:257
    assert vit.optim.schedule == "cosine_warm_restarts"
    assert vit.optim.backbone_lr_scale == 0.1  # ViT_engine.py:244-251
    assert vit.optim.early_stop_patience == 10
    assert vit.model.arch == "vit_s8"


def test_json_round_trip():
    cfg = dataclasses.replace(TrainConfig.vit_default(), checkpoint_dir="x")
    restored = train_config_from_json(to_json(cfg))
    assert restored == cfg
