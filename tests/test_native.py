"""Native C++ host data path: WAV decode, framing, threaded loader."""

import numpy as np
import pytest
from scipy.io import wavfile

from guitar_tablature_classification_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.ensure_built(), reason="g++/make unavailable"
)


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths, signals = [], []
    for i, sr in enumerate((44100, 44100)):
        x = np.clip(
            0.25 * rng.standard_normal(sr // 2), -0.95, 0.95
        ).astype(np.float32)  # 0.5 s
        p = d / f"t{i}.wav"
        wavfile.write(str(p), sr, (x * 32767).astype(np.int16))
        paths.append(str(p))
        signals.append(x)
    return paths, signals


def test_wav_read_matches_scipy(wav_files):
    paths, signals = wav_files
    audio, sr = native_loader.wav_read(paths[0])
    assert sr == 44100
    np.testing.assert_allclose(audio, signals[0], atol=1e-3)


def test_wav_read_float32_and_stereo(tmp_path):
    sr = 22050
    x = np.stack(
        [np.linspace(-0.5, 0.5, sr), np.linspace(0.5, -0.5, sr)], axis=1
    ).astype(np.float32)
    p = tmp_path / "st.wav"
    wavfile.write(str(p), sr, x)
    audio, got_sr = native_loader.wav_read(str(p))
    assert got_sr == sr
    np.testing.assert_allclose(audio, x.mean(axis=1), atol=1e-6)


def test_frame_windows_matches_numpy(wav_files):
    _, signals = wav_files
    x = signals[0]
    got = native_loader.frame_windows(x, window=4410, hop=2205)
    from guitar_tablature_classification_tpu.ops.framing import frame_track
    from guitar_tablature_classification_tpu.config import CQTConfig

    cfg = CQTConfig(window_seconds=0.1, hop_seconds=0.05)
    want = np.asarray(frame_track(x, cfg))
    np.testing.assert_array_equal(got, want)


def test_native_window_loader(wav_files):
    paths, _ = wav_files
    loader = native_loader.NativeWindowLoader(
        paths, window_samples=4410, hop_samples=2205, batch_size=8, seed=1
    )
    total = len(loader)
    assert total == 2 * ((22050 - 4410) // 2205 + 1)
    audio, tracks, starts = loader.next_batch()
    assert audio.shape == (8, 4410)
    assert set(np.unique(tracks)).issubset({0, 1})
    assert np.isfinite(audio).all()
    # provenance: window content equals the source slice
    raw0, _ = native_loader.wav_read(paths[int(tracks[0])])
    np.testing.assert_allclose(
        audio[0], raw0[starts[0] : starts[0] + 4410], atol=1e-6
    )
    # epochs wrap and reshuffle deterministically
    seq1 = [loader.next_batch()[2].copy() for _ in range(total // 8 + 2)]
    assert any(not np.array_equal(seq1[0], s) for s in seq1[1:])
    loader.close()
