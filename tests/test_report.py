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


def test_plot_artifacts_edge_cases(tmp_path):
    """Degenerate inputs every artifact family must survive: single-epoch
    history, missing optional keys, all-correct predictions, frets with
    zero support, single-sample grids."""
    import os

    rng = np.random.default_rng(1)

    # single-epoch history, no lr/per-string keys
    history = {"train_loss": [2.0], "val_loss": [2.1], "val_accuracy": [0.4]}
    p = plot_training_metrics(history, str(tmp_path / "m1.png"))
    assert os.path.getsize(p) > 0

    # single sample, no labels
    feats = rng.uniform(-120, 0, (1, 96, 9))
    p = plot_sample_inputs(feats, str(tmp_path / "s1.png"))
    assert os.path.getsize(p) > 0

    # all-correct predictions (empty 'incorrect' bucket)
    preds = rng.integers(0, 19, (16, 6))
    p = plot_correct_incorrect_distribution(
        preds, preds.copy(), str(tmp_path / "d1.png")
    )
    assert os.path.getsize(p) > 0
    p = plot_prediction_overlay(
        rng.uniform(-120, 0, (4, 96, 9)), preds[:4], preds[:4],
        str(tmp_path / "o1.png"),
    )
    assert os.path.getsize(p) > 0

    # confusion limited to one class -> rows with zero support
    ones = np.zeros((16, 6), np.int64)
    cm = np.asarray(
        confusion_matrices(jnp.asarray(ones), jnp.asarray(ones))
    )
    p = plot_confusion_matrices(cm, str(tmp_path / "c1.png"))
    assert os.path.getsize(p) > 0
    acc, support = per_fret_accuracy(cm)
    assert support[:, 1:].sum() == 0  # only fret 0 seen
    p = plot_per_fret_accuracy(acc, support, str(tmp_path / "f1.png"))
    assert os.path.getsize(p) > 0


def test_confusion_matrix_semantics():
    """confusion_matrices: cm[s, true, pred] counts; per_fret_accuracy is
    diag/support with zero-support rows reported as 0."""
    preds = jnp.asarray([[1, 0, 0, 0, 0, 0], [2, 0, 0, 0, 0, 0]])
    targets = jnp.asarray([[1, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0]])
    cm = np.asarray(confusion_matrices(preds, targets))
    assert cm.shape == (6, 19, 19)
    assert cm[0, 1, 1] == 1 and cm[0, 1, 2] == 1  # string 0: one hit, one miss
    assert cm[1, 0, 0] == 2  # string 1 all open, predicted open
    acc, support = per_fret_accuracy(cm)
    assert support[0, 1] == 2 and acc[0, 1] == 0.5
    assert support[0, 5] == 0 and acc[0, 5] == 0.0
