"""Visualization suite renders every artifact without error."""

import numpy as np
import jax
import jax.numpy as jnp

from guitar_tablature_classification_tpu.report import (
    plot_confusion_matrices,
    plot_correct_incorrect_distribution,
    plot_model_architecture,
    plot_per_fret_accuracy,
    plot_prediction_overlay,
    plot_sample_inputs,
    plot_training_metrics,
)
from guitar_tablature_classification_tpu.train import (
    confusion_matrices,
    per_fret_accuracy,
)


def test_all_plot_artifacts(tmp_path):
    rng = np.random.default_rng(0)
    history = {
        "train_loss": [3.0, 2.0, 1.5],
        "val_loss": [3.1, 2.2, 1.8],
        "val_accuracy": [0.3, 0.5, 0.6],
        "val_per_string": rng.uniform(0, 1, (3, 6)).tolist(),
        "lr": [5e-4, 5e-4, 2.5e-4],
    }
    feats = rng.uniform(-120, 0, (8, 96, 9))
    preds = rng.integers(0, 19, (64, 6))
    targets = rng.integers(0, 19, (64, 6))
    cm = np.asarray(confusion_matrices(jnp.asarray(preds), jnp.asarray(targets)))
    acc, support = per_fret_accuracy(cm)

    paths = [
        plot_training_metrics(history, str(tmp_path / "metrics.png")),
        plot_sample_inputs(feats, str(tmp_path / "samples.png"),
                           labels=targets[:8]),
        plot_prediction_overlay(feats, preds[:8], targets[:8],
                                str(tmp_path / "overlay.png")),
        plot_correct_incorrect_distribution(
            preds, targets, str(tmp_path / "dist.png")),
        plot_confusion_matrices(cm, str(tmp_path / "confusion.png")),
        plot_per_fret_accuracy(acc, support, str(tmp_path / "per_fret.png")),
    ]
    params = {"conv": {"kernel": np.zeros((3, 3, 1, 8))},
              "heads": {"kernel": np.zeros((6, 16, 19))}}
    paths.append(plot_model_architecture(params, str(tmp_path / "arch.png")))
    import os

    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_render_spectrogram_png(tmp_path):
    from guitar_tablature_classification_tpu.report import (
        render_spectrogram_png,
    )

    feat = np.random.default_rng(0).uniform(-120, 0, (96, 9))
    p = render_spectrogram_png(feat, str(tmp_path / "seg.png"))
    import os

    assert os.path.getsize(p) > 0
