"""End-to-end slice: synthetic audio -> CQT -> labels -> train -> eval.

The CPU version of BASELINE.json config 1 ("single excerpt, CQT -> small
CNN vs labels"): the model must actually LEARN the synthetic tablature —
accuracy well above the all-fret-0 prior would be if predictions were
random, and above a majority-class baseline computed from the data.
"""

import json

import numpy as np
import pytest

from guitar_tablature_classification_tpu.train.run import main as train_main


@pytest.mark.slow
def test_synthetic_training_learns(tmp_path, capsys):
    rc = train_main(
        [
            "--synthetic", "--synthetic-tracks", "2",
            "--arch", "small_cnn",
            "--epochs", "6",
            "--batch-size", "16",
            "--learning-rate", "0.003",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--report-dir", str(tmp_path / "report"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    result = json.loads(out[-1])
    # 2 tracks x 20 windows: tiny, but trainable far above chance (~5%).
    assert result["test_accuracy"] > 0.3, result
    assert (tmp_path / "ckpt" / "best_guitar_tab_model").exists()
    assert (tmp_path / "ckpt" / "train_log.jsonl").exists()
    for artifact in (
        "training_metrics.png", "sample_inputs.png", "prediction_overlay.png",
        "correct_incorrect.png", "confusion_matrices.png",
        "fret_accuracy.png", "model_architecture.png",
    ):
        assert (tmp_path / "report" / artifact).exists(), artifact

    # resume: restarting with --resume continues from the saved epoch
    rc = train_main(
        [
            "--synthetic", "--synthetic-tracks", "2",
            "--arch", "small_cnn",
            "--epochs", "7",
            "--batch-size", "16",
            "--learning-rate", "0.003",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--resume",
        ]
    )
    assert rc == 0
    log_text = (tmp_path / "ckpt" / "train_log.jsonl").read_text()
    assert "resumed from epoch" in log_text
