"""Inference: batched transcription, text/image rendering, CLI smoke."""

import numpy as np
import jax
import pytest

from guitar_tablature_classification_tpu.config import CQTConfig, ModelConfig
from guitar_tablature_classification_tpu.data import (
    make_synthetic_dataset,
    render_performance,
)
from guitar_tablature_classification_tpu.infer import (
    Transcriber,
    create_tablature_image,
    format_tablature_text,
    format_time_table,
    write_tablature_file,
)
from guitar_tablature_classification_tpu.models import build_model
from guitar_tablature_classification_tpu.train import make_preprocess


@pytest.fixture(scope="module")
def transcriber():
    model_cfg = ModelConfig(arch="small_cnn", dtype="float32")
    cqt_cfg = CQTConfig()
    model = build_model(model_cfg)
    preprocess = make_preprocess(model_cfg)
    sample = preprocess(np.zeros((1, cqt_cfg.n_bins, cqt_cfg.n_frames), np.float32))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    return Transcriber(
        variables, model_cfg=model_cfg, cqt_cfg=cqt_cfg, batch_size=8
    )


def test_transcribe_shapes_and_batching(transcriber):
    cfg = transcriber.cqt_cfg
    audio = render_performance(
        [(0, 3, 0.1, 0.8), (2, 5, 0.5, 0.5)], 1.5, cfg
    )
    out = transcriber.transcribe(audio, keep_logits=True)
    # 1.5 s, 0.2 s window / 0.1 s hop -> (66150-8820)//4410+1 = 14 windows
    assert out.frets.shape == (14, 6)
    assert out.logits.shape == (14, 6, 19)
    assert out.times.shape == (14,)
    assert np.all((out.frets >= 0) & (out.frets < 19))
    # padding of the last (14 -> 2x8) batch must not change results:
    single = transcriber.predict_windows(
        np.asarray(
            __import__(
                "guitar_tablature_classification_tpu.ops", fromlist=["frame_track"]
            ).frame_track(audio, cfg)
        )[:8]
    )
    np.testing.assert_allclose(out.logits[:8], single[:8], atol=1e-5)


def test_bucketed_batches(transcriber):
    """predict_windows pads short feeds to the smallest bucket, not a
    full batch, and bucket choice never changes results (VERDICT r2 #6:
    a single streaming window must stop paying a full-batch forward)."""
    model_cfg = ModelConfig(arch="small_cnn", dtype="float32")
    cfg = transcriber.cqt_cfg
    t = Transcriber(
        transcriber.variables, model_cfg=model_cfg, cqt_cfg=cfg,
        batch_size=16, bucket_sizes=(4, 8, 16),
    )
    assert t.bucket_sizes == (4, 8, 16)
    # greedy: largest fully-filled bucket first, smallest bucket for the tail
    assert t._bucket_for(21) == 16
    assert t._bucket_for(5) == 4
    assert t._bucket_for(3) == 4
    assert t._bucket_for(1) == 4

    rng = np.random.default_rng(0)
    windows = rng.standard_normal((21, cfg.window_samples)).astype(np.float32)
    got = t.predict_windows(windows)
    assert got.shape == (21, 6, 19)
    want = transcriber.predict_windows(windows)  # 8-bucket transcriber
    np.testing.assert_allclose(got, want, atol=1e-5)
    # single window: the device batch is the smallest bucket
    one = t.predict_windows(windows[:1])
    np.testing.assert_allclose(one, want[:1], atol=1e-5)


def test_format_tablature_text():
    frets = np.zeros((4, 6), int)
    frets[0, 5] = 3   # high e, fret 3 in window 0
    frets[2, 0] = 12  # low E, fret 12 in window 2
    text = format_tablature_text(frets)
    lines = text.strip().split("\n")
    assert len(lines) == 6
    assert lines[0].startswith("e|3--")
    assert lines[5].startswith("E|")
    assert "12-" in lines[5]
    assert all(line.endswith("|") for line in lines)


def test_format_time_table():
    frets = np.zeros((2, 6), int)
    table = format_time_table(frets, [0.0, 0.1])
    assert "Time" in table and "0.10s" in table


def test_write_tablature_file(tmp_path):
    path = tmp_path / "out.txt"
    text = write_tablature_file(
        str(path), np.zeros((3, 6), int), [0.0, 0.1, 0.2], title="demo"
    )
    assert path.exists()
    assert "Guitar Tablature: demo" in text
    assert "e|" in text


def test_transcriber_vit_native():
    """vit_native serves through the generic Transcriber path (raw 96x9
    CQT, rectangular patches — no 224^2 upsample at serve time)."""
    model_cfg = ModelConfig(
        arch="vit_native", vit_hidden=64, vit_layers=1, vit_heads=2,
        dtype="float32", attention_impl="xla",
    )
    cqt_cfg = CQTConfig()
    model = build_model(model_cfg)
    preprocess = make_preprocess(model_cfg)
    sample = preprocess(
        np.zeros((1, cqt_cfg.n_bins, cqt_cfg.n_frames), np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    t = Transcriber(variables, model_cfg=model_cfg, cqt_cfg=cqt_cfg,
                    batch_size=8)
    audio = render_performance([(0, 3, 0.1, 0.8)], 1.0, cqt_cfg)
    out = t.transcribe(audio)
    assert out.frets.shape[1] == 6
    assert np.all((out.frets >= 0) & (out.frets < 19))


def test_create_tablature_image(tmp_path):
    rng = np.random.default_rng(0)
    frets = rng.integers(0, 19, (40, 6))
    times = np.arange(40) * 0.1
    path = create_tablature_image(
        frets, times, str(tmp_path / "tab.png"), title="demo"
    )
    from PIL import Image

    img = Image.open(path)
    assert img.size[0] == 1600


def test_cli_smoke(tmp_path):
    from scipy.io import wavfile

    from guitar_tablature_classification_tpu.infer import cli

    cfg = CQTConfig()
    tracks = make_synthetic_dataset(
        np.random.default_rng(0), num_tracks=1, duration=1.0, cfg=cfg
    )
    wav = tmp_path / "demo.wav"
    wavfile.write(
        str(wav), cfg.sample_rate,
        (tracks[0]["audio"] * 32767).astype(np.int16),
    )
    out = tmp_path / "demo_tab.txt"
    rc = cli.main(
        [str(wav), "--arch", "small_cnn", "--output", str(out),
         "--batch-size", "8"]
    )
    assert rc == 0
    assert out.exists()
    assert "e|" in out.read_text()


def test_cli_serving_recipe(tmp_path):
    from scipy.io import wavfile

    from guitar_tablature_classification_tpu.infer import cli

    serving = CQTConfig.serving_cnn()
    rng = np.random.default_rng(1)
    audio = (0.3 * rng.standard_normal(serving.sample_rate * 7)).astype(
        np.float32
    )  # 7 s at 22.05 kHz -> two 3 s windows at 50% overlap... (3 complete)
    wav = tmp_path / "long.wav"
    wavfile.write(str(wav), serving.sample_rate, (audio * 32767).astype(np.int16))
    rc = cli.main(
        [str(wav), "--arch", "small_cnn", "--serving-recipe",
         "--segment-duration", "3.0", "--overlap", "0.5",
         "--output", str(tmp_path / "out.txt"), "--batch-size", "4"]
    )
    assert rc == 0
    assert (tmp_path / "out.txt").exists()


def test_cli_recipe_preset_serving(tmp_path):
    """`tab-transcribe --recipe vit-small-data` serves with the preset's
    model config (vit_native, (16,3) patches) — without it a
    vit-small-data-trained checkpoint couldn't be loaded (no CLI knob
    set vit_patch)."""
    import pytest
    from scipy.io import wavfile

    from guitar_tablature_classification_tpu.infer import cli

    cfg = CQTConfig()
    tracks = make_synthetic_dataset(
        np.random.default_rng(2), num_tracks=1, duration=0.8, cfg=cfg
    )
    wav = tmp_path / "demo.wav"
    wavfile.write(
        str(wav), cfg.sample_rate,
        (tracks[0]["audio"] * 32767).astype(np.int16),
    )
    args = cli.build_parser().parse_args(
        [str(wav), "--recipe", "vit-small-data", "--batch-size", "4"]
    )
    transcriber = cli.load_transcriber(args)
    assert transcriber.model_cfg.arch == "vit_native"
    assert transcriber.model_cfg.vit_patch == 16
    result = transcriber.transcribe(
        tracks[0]["audio"], smooth_window=0
    )
    assert result.frets.shape[1] == 6

    # --recipe and --arch are mutually exclusive
    args = cli.build_parser().parse_args(
        [str(wav), "--recipe", "native-best", "--arch", "vit_s8"]
    )
    with pytest.raises(SystemExit):
        cli.load_transcriber(args)


def test_streaming_matches_offline(transcriber):
    """Chunked feeds produce exactly the offline transcription."""
    from guitar_tablature_classification_tpu.infer import StreamingTranscriber

    cfg = transcriber.cqt_cfg
    audio = render_performance(
        [(0, 3, 0.1, 0.8), (4, 7, 0.6, 0.9), (2, 5, 1.1, 0.5)], 2.0, cfg
    )
    offline = transcriber.transcribe(audio, smooth_window=3)

    stream = StreamingTranscriber(transcriber, smooth_window=3)
    rng = np.random.default_rng(0)
    got_frets, got_times = [], []
    pos = 0
    while pos < len(audio):
        chunk = int(rng.integers(1000, 20000))
        out = stream.feed(audio[pos : pos + chunk])
        got_frets.append(out.frets)
        got_times.append(out.times)
        pos += chunk
    out = stream.flush()
    got_frets.append(out.frets)
    got_times.append(out.times)

    frets = np.concatenate(got_frets)
    times = np.concatenate(got_times)
    np.testing.assert_array_equal(frets, offline.frets)
    np.testing.assert_allclose(times, offline.times, atol=1e-9)


def test_streaming_tiny_track_passthrough(transcriber):
    """Tracks shorter than the smoothing window return raw predictions
    (offline passthrough semantics)."""
    from guitar_tablature_classification_tpu.infer import StreamingTranscriber

    cfg = transcriber.cqt_cfg
    audio = render_performance([(0, 2, 0.05, 0.3)], 0.5, cfg)  # 3 windows
    offline = transcriber.transcribe(audio, smooth_window=3)

    stream = StreamingTranscriber(transcriber, smooth_window=3)
    out1 = stream.feed(audio)
    out2 = stream.flush()
    frets = np.concatenate([out1.frets, out2.frets])
    np.testing.assert_array_equal(frets, offline.frets)
