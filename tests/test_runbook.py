"""tools/run_guitarset.py smoke test on a synthetic GuitarSet-shaped
directory tree (round-2 VERDICT #5): WAV+JAMS dirs in -> fixture-named
features -> labels -> pairing audit -> train -> baseline metric table,
all through the real runbook entry point.  With real GuitarSet data the
identical command reproduces the reference recipe.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from guitar_tablature_classification_tpu.config import CQTConfig
from guitar_tablature_classification_tpu.data.synthetic import (
    events_to_jams_dict,
    make_synthetic_dataset,
)


def _write_tree(tmp_path, num_tracks=3, duration=2.0):
    from scipy.io import wavfile

    cfg = CQTConfig()
    audio_dir = tmp_path / "audio"
    jams_dir = tmp_path / "annotation"
    audio_dir.mkdir()
    jams_dir.mkdir()
    tracks = make_synthetic_dataset(
        np.random.default_rng(0), num_tracks, duration=duration, cfg=cfg
    )
    for track in tracks:
        # GuitarSet-style audio suffix exercises the WAV-probing logic
        wavfile.write(
            audio_dir / f"{track['name']}_hex.wav",
            cfg.sample_rate,
            (np.clip(track["audio"], -1, 1) * 32767).astype(np.int16),
        )
        (jams_dir / f"{track['name']}.jams").write_text(
            json.dumps(events_to_jams_dict(track["events"], duration))
        )
    return audio_dir, jams_dir


@pytest.mark.slow
def test_runbook_end_to_end(tmp_path, capsys):
    import run_guitarset

    audio_dir, jams_dir = _write_tree(tmp_path)
    work = tmp_path / "work"
    rc = run_guitarset.main([
        "--audio", str(audio_dir),
        "--annotation", str(jams_dir),
        "--workdir", str(work),
        "--arch", "small_cnn",
        "--epochs", "4",
        "--batch-size", "8",
        "--learning-rate", "0.003",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # all stages ran
    assert "[2/4] wrote" in out
    assert "[3/4] generated" in out
    assert "pairing audit:" in out and "exact match" in out
    # the baseline comparison table printed with all 6 strings + mean
    assert "reference" in out
    for s in range(1, 7):
        assert f"       {s} |" in out
    assert "    mean |" in out
    # artifacts exist on disk
    feats = list((work / "features").glob("*.npy"))
    labels = list((work / "labels").glob("*.npy"))
    assert len(feats) == len(labels) > 0
    # fixture naming: {base}_segment_{rank}_{start:.2f}.npy on a 0.2 grid
    assert (work / "features" / "synth00_comp_segment_0_0.00.npy").exists()
    assert (work / "features" / "synth00_comp_segment_0_0.20.npy").exists()
    assert (work / "checkpoints" / "best_guitar_tab_model").exists()


@pytest.mark.slow
def test_runbook_with_shipped_fixtures(tmp_path, capsys):
    """--fixtures: train against a pre-existing tablatures/ directory
    (the shipped-labels path) instead of regenerating from JAMS."""
    from guitar_tablature_classification_tpu.labels import (
        GuitarTablatureExtractor,
    )

    import run_guitarset

    audio_dir, jams_dir = _write_tree(tmp_path, num_tracks=2, duration=1.2)
    fixtures = tmp_path / "tablatures"
    GuitarTablatureExtractor(str(jams_dir), str(fixtures)).process_all_files()

    work = tmp_path / "work"
    rc = run_guitarset.main([
        "--audio", str(audio_dir),
        "--annotation", str(jams_dir),
        "--workdir", str(work),
        "--fixtures", str(fixtures),
        "--arch", "small_cnn",
        "--epochs", "2",
        "--batch-size", "8",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "using shipped label fixtures" in out
    assert "exact match" in out  # features pair 1:1 with the fixtures
    assert not (work / "labels").exists()  # nothing regenerated


@pytest.mark.slow
def test_runbook_with_recipe(tmp_path, capsys):
    """--recipe: train with a named preset (config.RECIPES) instead of
    --arch; explicit hyperparameter flags still override the preset's."""
    import run_guitarset

    audio_dir, jams_dir = _write_tree(tmp_path, num_tracks=2, duration=1.2)
    work = tmp_path / "work"
    rc = run_guitarset.main([
        "--audio", str(audio_dir),
        "--annotation", str(jams_dir),
        "--workdir", str(work),
        "--recipe", "vit-small-data",
        "--epochs", "2",
        "--batch-size", "8",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "exact match" in out
    assert "    mean |" in out
    # ViT recipes use the reference's ViT checkpoint name
    assert (work / "checkpoints" / "best_vit_guitar_tab_model").exists()

    with pytest.raises(SystemExit):
        run_guitarset.main([
            "--audio", str(audio_dir),
            "--annotation", str(jams_dir),
            "--workdir", str(work),
            "--recipe", "vit-small-data",
            "--arch", "small_cnn",
        ])


def test_runbook_pairing_audit_intersection(tmp_path, capsys):
    """Divergent feature/label sets: the audit lists them and trains on
    the materialized intersection instead of dying on the count assert."""
    import run_guitarset

    fdir = tmp_path / "f"
    ldir = tmp_path / "l"
    fdir.mkdir()
    ldir.mkdir()
    common = ["a_segment_0_0.00.npy", "a_segment_0_0.20.npy"]
    for name in common + ["only_feat.npy"]:
        np.save(fdir / name, np.zeros((96, 9), np.float32))
    for name in common + ["only_label.npy"]:
        np.save(ldir / name, np.zeros((6, 19), np.int8))
    f2, l2 = run_guitarset.audit_pairing(str(fdir), str(ldir), str(tmp_path))
    out = capsys.readouterr().out
    assert "2 paired, 1 feature-only, 1 label-only" in out
    assert sorted(os.listdir(f2)) == common
    assert sorted(os.listdir(l2)) == common
