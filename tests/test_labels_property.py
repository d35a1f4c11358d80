"""Property tests: label conventions vs independent brute-force oracles.

Round-2 VERDICT #4: ``tablature_per_string_window`` and the
``lowest_fret_center`` convention (reference jam_to_tablature.py:55-178)
were verified against hand-built cases only.  Here hundreds of randomized
synthetic JAMS — overlapping notes, boundary-exact times, zero durations,
out-of-range frets, malformed/dict values, confidence edge cases — are
checked cell-by-cell against oracles written from the spec with a
different control flow (iterate cells asking "should this cell be
marked?" on the raw JSON dict, bypassing the Jams dataclasses entirely).
"""

import math

import numpy as np

from guitar_tablature_classification_tpu.config import (
    NUM_FRETS,
    NUM_STRINGS,
    OPEN_STRING_MIDI,
)
from guitar_tablature_classification_tpu.labels import (
    parse_jams,
    tablature_first_fit_window,
    tablature_lowest_fret_center,
    tablature_per_string_window,
    tablature_to_frets,
)
from guitar_tablature_classification_tpu.labels.tablature import (
    tablature_from_pitch_contour,
)


# -- oracles (raw-dict, per-cell brute force) -----------------------------

def _oracle_midi(value):
    if isinstance(value, dict):
        value = value.get("pitch", value.get("value"))
    try:
        return float(value)
    except (TypeError, ValueError):
        return None


def oracle_per_string_window(obj, start, window=0.2):
    """Spec: GuitarSet's six per-string note_midi annotations (sorted by
    data_source); a note marks fret round(midi - open) on its string iff
    its [t0, t0+dur) interval meets [start, start+window) under the
    reference's half-open test (t0 < end and t0+dur > start); idle rows
    mark fret 0."""
    end = start + window
    anns = [a for a in obj["annotations"] if a["namespace"] == "note_midi"]
    anns.sort(key=lambda a: int(a["annotation_metadata"]["data_source"]))
    tab = np.zeros((NUM_STRINGS, NUM_FRETS), np.int8)
    for s in range(NUM_STRINGS):
        for f in range(NUM_FRETS):
            should_mark = False
            if s < len(anns):
                for obs in anns[s]["data"]:
                    t0 = obs["time"]
                    t1 = t0 + obs["duration"]
                    if t0 >= end or t1 <= start:
                        continue
                    midi = _oracle_midi(obs["value"])
                    if midi is None:
                        continue
                    if round(midi - OPEN_STRING_MIDI[s]) == f:
                        should_mark = True
            if should_mark:
                tab[s, f] = 1
        if tab[s].sum() == 0:
            tab[s, 0] = 1
    return tab


def _oracle_place_lowest(tab, midi):
    candidates = [
        (round(midi - open_midi), s)
        for s, open_midi in enumerate(OPEN_STRING_MIDI)
        if 0 <= round(midi - open_midi) < NUM_FRETS
    ]
    if candidates:
        fret, s = min(candidates)
        tab[s, fret] = 1


def oracle_first_fit_window(obj, start, window=0.2):
    """Spec (the shipped-fixture convention, pinned round 4): pool every
    note_midi note (any annotation, file order irrelevant) whose
    [t0, t0+dur) meets [start, start+window) under the half-open test,
    mark each pitch on the FIRST string (index 0 upward) where
    round(midi - open) lands in [0, 19); idle rows mark fret 0.  Written
    per-cell on the raw dict, independent control flow."""
    end = start + window
    pitches = []
    for ann in obj["annotations"]:
        if ann["namespace"] != "note_midi":
            continue
        for obs in ann["data"]:
            t0 = obs["time"]
            if t0 >= end or t0 + obs["duration"] <= start:
                continue
            midi = _oracle_midi(obs["value"])
            if midi is not None:
                pitches.append(midi)
    tab = np.zeros((NUM_STRINGS, NUM_FRETS), np.int8)
    for s in range(NUM_STRINGS):
        for f in range(NUM_FRETS):
            for midi in pitches:
                # pitch lands on (s, f) iff it rounds there AND no lower
                # string could take it
                if round(midi - OPEN_STRING_MIDI[s]) != f:
                    continue
                taken = False
                for s2 in range(s):
                    if 0 <= round(midi - OPEN_STRING_MIDI[s2]) < NUM_FRETS:
                        taken = True
                        break
                if not taken:
                    tab[s, f] = 1
    for s in range(NUM_STRINGS):
        if tab[s].sum() == 0:
            tab[s, 0] = 1
    return tab


def oracle_lowest_fret_center(obj, center):
    """Spec (jam_to_tablature.py:110-143): pool ALL note_midi notes (file
    order, no string association) active at the center instant
    (t0 <= center < t0+dur), place each at the valid position with the
    lowest fret (string order breaks fret ties)."""
    tab = np.zeros((NUM_STRINGS, NUM_FRETS), np.int8)
    for ann in obj["annotations"]:
        if ann["namespace"] != "note_midi":
            continue
        for obs in ann["data"]:
            if not (obs["time"] <= center < obs["time"] + obs["duration"]):
                continue
            midi = _oracle_midi(obs["value"])
            if midi is not None:
                _oracle_place_lowest(tab, midi)
    return tab


def oracle_pitch_contour(obj, center, tolerance=0.05):
    """Spec (jam_to_tablature.py:145-178): pitch_contour observations with
    |t - center| strictly < tolerance, positive frequency, confidence
    >= 0.5 (None counts as 1.0), hz->midi, lowest-fret placement."""
    tab = np.zeros((NUM_STRINGS, NUM_FRETS), np.int8)
    for ann in obj["annotations"]:
        if ann["namespace"] != "pitch_contour":
            continue
        for obs in ann["data"]:
            if abs(obs["time"] - center) >= tolerance:
                continue
            conf = obs.get("confidence")
            if conf is not None and conf < 0.5:
                continue
            value = obs["value"]
            if isinstance(value, dict):
                value = value.get("frequency", value.get("value"))
            try:
                freq = float(value)
            except (TypeError, ValueError):
                continue
            if freq <= 0:
                continue
            _oracle_place_lowest(tab, 12.0 * math.log2(freq / 440.0) + 69.0)
    return tab


# -- randomized JAMS generator -------------------------------------------

def _random_note(rng, s):
    """Times/durations biased onto grid boundaries; pitches biased onto
    the string's playable range edges, half-integers and junk values."""
    t = float(rng.choice([
        0.0, 0.1, 0.2, 0.3, 0.4,
        round(float(rng.uniform(0.0, 0.8)), 3),
    ]))
    d = float(rng.choice([
        0.0, 0.05, 0.1, 0.2, round(float(rng.uniform(0.0, 0.6)), 3),
    ]))
    base = OPEN_STRING_MIDI[s]
    pick = rng.random()
    if pick < 0.5:
        midi = float(base + int(rng.integers(-3, 24)))
    elif pick < 0.7:
        midi = float(base + rng.uniform(-3.0, 24.0))
    elif pick < 0.85:
        midi = base + 0.5  # round-half-even boundary
    else:
        midi = None  # malformed
    value = midi
    if midi is not None and rng.random() < 0.3:
        value = {"pitch": midi}
    return {"time": t, "duration": d, "value": value, "confidence": None}


def _random_jams(rng, with_contour=False):
    annotations = []
    order = rng.permutation(NUM_STRINGS)  # shuffled data_source order
    for s in order:
        annotations.append({
            "namespace": "note_midi",
            "annotation_metadata": {"data_source": str(int(s))},
            "data": [
                _random_note(rng, int(s))
                for _ in range(int(rng.integers(0, 5)))
            ],
        })
    if with_contour:
        data = []
        for _ in range(int(rng.integers(0, 8))):
            freq = float(rng.choice([
                0.0, -10.0, 82.41, 440.0,
                round(float(rng.uniform(60.0, 1000.0)), 2),
            ]))
            value = freq
            if rng.random() < 0.3:
                value = {"frequency": freq}
            data.append({
                "time": round(float(rng.uniform(0.0, 0.4)), 3),
                "duration": 0.0,
                "value": value,
                "confidence": float(rng.choice([0.0, 0.3, 0.5, 0.9, 1.0])),
            })
        annotations.append({
            "namespace": "pitch_contour",
            "annotation_metadata": {},
            "data": data,
        })
    return {"file_metadata": {"duration": 1.0}, "annotations": annotations}


# -- the property sweeps --------------------------------------------------

def test_per_string_window_matches_oracle_randomized():
    rng = np.random.default_rng(0)
    starts = [0.0, 0.1, 0.2, 0.4]
    for _ in range(300):
        obj = _random_jams(rng)
        jam = parse_jams(obj)
        for start in starts:
            got = tablature_per_string_window(jam, start, 0.2)
            want = oracle_per_string_window(obj, start, 0.2)
            np.testing.assert_array_equal(got, want)
            # fixture invariant: every row carries >= 1 mark
            assert (got.sum(axis=1) >= 1).all()


def test_first_fit_window_matches_oracle_randomized():
    rng = np.random.default_rng(4)
    starts = [0.0, 0.1, 0.2, 0.4]
    for _ in range(300):
        obj = _random_jams(rng)
        jam = parse_jams(obj)
        for start in starts:
            got = tablature_first_fit_window(jam, start, 0.2)
            want = oracle_first_fit_window(obj, start, 0.2)
            np.testing.assert_array_equal(got, want)
            # fixture invariant: every row carries >= 1 mark
            assert (got.sum(axis=1) >= 1).all()


def test_lowest_fret_center_matches_oracle_randomized():
    rng = np.random.default_rng(1)
    for _ in range(300):
        obj = _random_jams(rng)
        jam = parse_jams(obj)
        for center in (0.1, 0.25, 0.3):
            got = tablature_lowest_fret_center(jam, center)
            want = oracle_lowest_fret_center(obj, center)
            np.testing.assert_array_equal(got, want)


def test_pitch_contour_matches_oracle_randomized():
    rng = np.random.default_rng(2)
    for _ in range(200):
        obj = _random_jams(rng, with_contour=True)
        jam = parse_jams(obj)
        for center in (0.1, 0.2):
            got = tablature_from_pitch_contour(jam, center)
            want = oracle_pitch_contour(obj, center)
            np.testing.assert_array_equal(got, want)


def test_boundary_exact_cases():
    """Deterministic boundary semantics the random sweep relies on."""
    def one_note_jam(t, d, midi, s=0):
        notes = [[] for _ in range(NUM_STRINGS)]
        notes[s] = [(t, d, midi)]
        return parse_jams({
            "file_metadata": {"duration": 1.0},
            "annotations": [
                {
                    "namespace": "note_midi",
                    "annotation_metadata": {"data_source": str(i)},
                    "data": [
                        {"time": a, "duration": b, "value": v,
                         "confidence": None}
                        for (a, b, v) in ns
                    ],
                }
                for i, ns in enumerate(notes)
            ],
        })

    # note starting exactly at window end: excluded (strict t0 < end)
    tab = tablature_per_string_window(one_note_jam(0.2, 0.5, 45.0), 0.0)
    assert tab[0, 0] == 1 and tab[0].sum() == 1
    # note ending exactly at window start: excluded (strict t1 > start)
    tab = tablature_per_string_window(one_note_jam(0.0, 0.2, 45.0), 0.2)
    assert tab[0, 0] == 1 and tab[0].sum() == 1
    # zero-duration event strictly inside the window: included
    tab = tablature_per_string_window(one_note_jam(0.1, 0.0, 45.0), 0.0)
    assert tab[0, 5] == 1
    # zero-duration event exactly at window start: excluded (t1 == start)
    tab = tablature_per_string_window(one_note_jam(0.2, 0.0, 45.0), 0.2)
    assert tab[0, 0] == 1 and tab[0].sum() == 1
    # fret rounding: 40.4 -> fret 0; 58.6 -> fret 19 out of range -> idle
    tab = tablature_per_string_window(one_note_jam(0.0, 0.2, 40.4), 0.0)
    assert tab[0, 0] == 1 and tab[0].sum() == 1
    tab = tablature_per_string_window(one_note_jam(0.0, 0.2, 40.0 + 18.6), 0.0)
    assert tab[0, 0] == 1 and tab[0].sum() == 1
    # center-instant: note whose interval ENDS at the center is inactive
    jam = one_note_jam(0.0, 0.1, 45.0)
    assert tablature_lowest_fret_center(jam, 0.1).sum() == 0
    # ... but one STARTING at the center is active (t0 <= c < t1);
    # MIDI 45 prefers the LOWEST fret: string 1 (A2) fret 0, not E2 fret 5
    jam = one_note_jam(0.1, 0.1, 45.0)
    assert tablature_lowest_fret_center(jam, 0.1)[1, 0] == 1


def test_tablature_to_frets_matches_bruteforce():
    """argmax tie rule == lowest marked fret, over random multi-hot rows."""
    rng = np.random.default_rng(3)
    for _ in range(100):
        tab = (rng.random((NUM_STRINGS, NUM_FRETS)) < 0.15).astype(np.int8)
        frets = tablature_to_frets(tab)
        for s in range(NUM_STRINGS):
            marked = np.flatnonzero(tab[s])
            want = int(marked[0]) if marked.size else 0
            assert frets[s] == want
