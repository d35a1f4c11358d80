"""Synthetic GuitarSet-like fixtures: notes -> audio + JAMS + labels.

GuitarSet's WAV/JAMS payload is not redistributable with the reference
repo (its ``audio/`` and ``annotation/`` dirs are gitignored), so tests,
benchmarks and e2e demos synthesize physically plausible data instead: a
random performance is rendered as decaying-harmonic plucks (per string,
per fret) and emitted alongside its exact JAMS annotation dict, from
which the label extractor produces ``(6, 19)`` targets.  This closes the
loop: audio -> CQT -> model vs JAMS -> labels, with a learnable mapping.
"""

from __future__ import annotations

import math

import numpy as np

from ..config import CQTConfig, NUM_FRETS, NUM_STRINGS, OPEN_STRING_MIDI


def midi_to_hz(midi: float) -> float:
    return 440.0 * 2.0 ** ((midi - 69.0) / 12.0)


def render_note(
    sr: int, duration: float, midi: float, *, harmonics: int = 6,
    decay: float = 3.0, amp: float = 0.3,
) -> np.ndarray:
    n = int(duration * sr)
    t = np.arange(n) / sr
    f0 = midi_to_hz(midi)
    wave = np.zeros(n, dtype=np.float64)
    nyquist = sr / 2
    for h in range(1, harmonics + 1):
        f = f0 * h
        if f >= nyquist:
            break
        wave += (amp / h) * np.sin(2 * math.pi * f * t)
    env = np.exp(-decay * t) * np.minimum(t * 200.0, 1.0)  # attack + decay
    return (wave * env).astype(np.float32)


def random_performance(
    rng: np.random.Generator,
    duration: float = 4.0,
    *,
    notes_per_second: float = 3.0,
    max_fret: int = 12,
) -> list[tuple[int, int, float, float]]:
    """-> list of (string, fret, onset, note_duration)."""
    events = []
    n_notes = max(1, int(duration * notes_per_second))
    for _ in range(n_notes):
        s = int(rng.integers(0, NUM_STRINGS))
        fret = int(rng.integers(0, min(max_fret + 1, NUM_FRETS)))
        onset = float(rng.uniform(0.0, duration - 0.3))
        dur = float(rng.uniform(0.2, min(1.5, duration - onset)))
        events.append((s, fret, onset, dur))
    return sorted(events, key=lambda e: e[2])


def render_performance(
    events, duration: float, cfg: CQTConfig | None = None,
    *, noise: float = 1e-4, seed: int = 0,
) -> np.ndarray:
    cfg = cfg or CQTConfig()
    sr = cfg.sample_rate
    out = np.zeros(int(duration * sr) + 1, dtype=np.float32)
    for s, fret, onset, dur in events:
        midi = OPEN_STRING_MIDI[s] + fret
        note = render_note(sr, dur, midi)
        lo = int(onset * sr)
        out[lo : lo + len(note)] += note
    rng = np.random.default_rng(seed)
    out += noise * rng.standard_normal(out.shape).astype(np.float32)
    peak = np.abs(out).max()
    if peak > 1.0:
        out /= peak
    return out[: int(duration * sr)]


def events_to_jams_dict(events, duration: float) -> dict:
    """The GuitarSet JAMS layout: six note_midi annotations keyed by
    data_source (0 = low E), MIDI note values."""
    per_string: list[list] = [[] for _ in range(NUM_STRINGS)]
    for s, fret, onset, dur in events:
        per_string[s].append(
            {
                "time": onset,
                "duration": dur,
                "value": float(OPEN_STRING_MIDI[s] + fret),
                "confidence": None,
            }
        )
    return {
        "file_metadata": {"duration": duration},
        "annotations": [
            {
                "namespace": "note_midi",
                "annotation_metadata": {"data_source": str(s)},
                "data": data,
            }
            for s, data in enumerate(per_string)
        ],
    }


def make_synthetic_dataset(
    rng: np.random.Generator,
    num_tracks: int = 4,
    duration: float = 4.0,
    cfg: CQTConfig | None = None,
) -> list[dict]:
    """-> per-track dicts {audio, jams, events, duration}."""
    cfg = cfg or CQTConfig()
    tracks = []
    for i in range(num_tracks):
        events = random_performance(rng, duration)
        audio = render_performance(events, duration, cfg, seed=i)
        tracks.append(
            {
                "name": f"synth{i:02d}_comp",
                "audio": audio,
                "jams": events_to_jams_dict(events, duration),
                "events": events,
                "duration": duration,
            }
        )
    return tracks
