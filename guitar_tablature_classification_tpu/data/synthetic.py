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


# Chord interval templates (semitones above the root): the voicing
# shapes of comp-style playing.  3-5 notes spanning up to ~2 octaves,
# so several pitches land in one first-fit string band per window —
# the source of the fixtures' ~48 % multi-mark frames.
_CHORD_TEMPLATES = (
    (0, 4, 7, 12, 16),   # major add-3rd-on-top
    (0, 3, 7, 12, 15),   # minor
    (0, 4, 10, 14, 19),  # dominant 9
    (0, 3, 10, 14, 17),  # m7 add 11
    (0, 7, 12, 16, 21),  # open fifth stack
    (0, 5, 10, 15, 19),  # quartal
)


def _physical_position(pitch: int, used: set[int]) -> tuple[int, int] | None:
    """Lowest-fret playable (string, fret) for a pitch, skipping strings
    already sounding (one pitch per physical string, like a guitarist)."""
    best = None
    for s in range(NUM_STRINGS):
        if s in used:
            continue
        fret = pitch - OPEN_STRING_MIDI[s]
        if 0 <= fret <= 15 and (best is None or fret < best[1]):
            best = (s, fret)
    return best


def random_performance(
    rng: np.random.Generator,
    duration: float = 4.0,
    *,
    notes_per_second: float | None = None,
    max_fret: int = 12,
    style: str = "guitarset",
) -> list[tuple[int, int, float, float]]:
    """-> list of (string, fret, onset, note_duration).

    ``style="guitarset"`` (default since round 4) renders a comp/solo-like
    performance — chord strums (sustained, 3-5 voices) interleaved with
    melodic runs and rests — whose labels under the shipped-fixture
    convention reproduce the measured statistics of the reference's
    ``tablatures/`` payload (~48 % multi-mark frames, declining
    per-string activity, ~8 % idle frames; see
    tests/test_data.py::test_synthetic_label_statistics_match_fixtures).
    ``style="sparse"`` (or passing ``notes_per_second``) keeps the
    round-1 generator: independent uniform single notes.
    """
    if style == "sparse" or notes_per_second is not None:
        nps = 3.0 if notes_per_second is None else notes_per_second
        events = []
        n_notes = max(1, int(duration * nps))
        for _ in range(n_notes):
            s = int(rng.integers(0, NUM_STRINGS))
            fret = int(rng.integers(0, min(max_fret + 1, NUM_FRETS)))
            onset = float(rng.uniform(0.0, duration - 0.3))
            dur = float(rng.uniform(0.2, min(1.5, duration - onset)))
            events.append((s, fret, onset, dur))
        return sorted(events, key=lambda e: e[2])
    if style != "guitarset":
        raise ValueError(f"unknown style {style!r}")

    events: list[tuple[int, int, float, float]] = []
    beat = float(rng.uniform(0.22, 0.38))  # ~160-270 bpm eighths
    melody = int(rng.integers(55, 72))
    t = float(rng.uniform(0.0, 0.1))
    while t < duration - 0.15:
        r = rng.random()
        if r < 0.24:  # chord strum (sustained)
            root = int(rng.integers(40, 53))
            tmpl = _CHORD_TEMPLATES[int(rng.integers(len(_CHORD_TEMPLATES)))]
            n_voices = int(rng.integers(2, 5))
            dur = float(rng.uniform(1.2, 3.2)) * beat
            used: set[int] = set()
            for iv in tmpl[:n_voices]:
                pos = _physical_position(root + iv, used)
                if pos is None:
                    continue
                used.add(pos[0])
                events.append(
                    (pos[0], pos[1], t, min(dur, duration - t - 0.01))
                )
        elif r < 0.80:  # melodic step (mean-reverting random walk)
            step = int(rng.integers(-4, 6)) - (melody - 62) // 5
            melody = int(np.clip(melody + step, 47, 75))
            pos = _physical_position(melody, set())
            if pos is not None:
                dur = float(rng.uniform(1.0, 2.4)) * beat
                events.append(
                    (pos[0], pos[1], t, min(dur, duration - t - 0.01))
                )
        # else: rest (no event this beat)
        t += beat * int(rng.choice((1, 1, 1, 2)))
    if not events:  # degenerate very-short durations
        events.append((0, 0, 0.0, max(duration - 0.05, 0.05)))
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
