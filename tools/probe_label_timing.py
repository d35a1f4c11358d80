"""Discriminate the fixture timing convention: window-overlap vs center-instant.

Round-4 pinned the *string-assignment* rule of the shipped
``tablatures/`` fixtures (first-fit; 0/43,188 support violations) but
left the *timing* degree of freedom open: did the unshipped generator
pool every note overlapping the 0.2 s window
(``tablature_first_fit_window``), or snapshot the notes active at the
window center, as both reference extractor revisions do
(jam_to_tablature.py:273-274 queries ``(i+.5)*dur/num_images``;
``new_dataset (1).py:692-695`` queries ``(i+0.5)*0.2``)?

This probe settles it with two results (round 5):

1. **Run-length statistics CANNOT decide** — there is an exact
   identity: a 0.2 s-grid cell ``[a, a+0.2)`` intersects a note
   ``[onset, end)`` iff the cell *center* ``a+0.1`` lies inside the note
   dilated by 0.1 s on each side.  Window-overlap labels on any event
   stream therefore equal center-instant labels on the same stream with
   every note lengthened by 0.2 s — so ANY observed run-length
   distribution is reproducible by either hypothesis under a shifted
   duration distribution.  (The simulation below shows both fits.)

2. **Per-frame distinct-pitch counts DO decide.**  GuitarSet's
   ``note_midi`` annotations are monophonic per string, so at any
   instant at most 6 pitches sound, and first-fit maps each pitch to
   exactly one (string, fret) cell: a center-instant snapshot can mark
   at most 6 distinct fret>=1 cells per frame.  The shipped fixtures
   contain **258 frames with 7-11 distinct fret>=1 cells** (e.g.
   ``00_Funk1-97-C_comp_segment_14_13.60.npy``: 10 cells = 10 distinct
   pitches — two funk chord voicings pooled across a change inside the
   window).  Only time-window pooling can collect them.  The
   pitch-contour fallback (jam_to_tablature.py:145-178) cannot explain
   these frames either: it fires only when the note_midi query is
   empty, which a dense strummed frame is not.

Verdict: ``tablature_first_fit_window`` (the round-4 default) carries
the right timing rule.  The remaining DOF — ``round()`` vs ``floor()``
fret quantization — is fixture-undecidable (the reachable support set
is identical; only band boundaries shift, and GuitarSet pitch values
cluster within +-0.3 semitones of integers), but reference code pins
``int(round(...))`` in both revisions (jam_to_tablature.py:95).

Tested by tests/test_labels.py::test_fixture_pitch_count_refutes_center_instant
and the slow exhaustive sweep.
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference/tablatures"
PAT = re.compile(r"^(.+)_(comp|solo)_segment_(\d+)_(\d+\.\d{2})\.npy$")


def first_fit_center(jam, center):
    """Center-instant variant of the first-fit convention (the timing
    rule of both reference extractor revisions, with the fixtures' idle
    markers added)."""
    from guitar_tablature_classification_tpu.labels.tablature import (
        midi_to_tablature_first_fit,
    )

    pitches = []
    for ann in jam.by_namespace("note_midi"):
        for obs in ann.observations:
            if obs.time <= center < obs.time + obs.duration:
                pitches.append(obs.value)
    tab = midi_to_tablature_first_fit(pitches)
    idle = tab.sum(axis=1) == 0
    tab[idle, 0] = 1
    return tab


def temporal_stats(tabs: np.ndarray) -> dict:
    """Temporal signature of a time-ordered (T, 6, 19) label stack."""
    tabs = tabs.astype(bool)
    T = tabs.shape[0]
    union = 0
    for k in range(1, T - 1):
        a, b, c = tabs[k - 1], tabs[k], tabs[k + 1]
        if (
            not np.array_equal(a, c)
            and np.array_equal(b, a | c)
            and (b & ~a).any()
            and (b & ~c).any()
        ):
            union += 1
    runlens: dict[int, int] = defaultdict(int)
    cells = tabs[:, :, 1:]
    for s in range(cells.shape[1]):
        for fr in range(cells.shape[2]):
            col = cells[:, s, fr]
            if not col.any():
                continue
            d = np.diff(np.concatenate([[0], col.astype(int), [0]]))
            for st, en in zip(np.where(d == 1)[0], np.where(d == -1)[0]):
                runlens[int(en - st)] += 1
    tot = max(1, sum(runlens.values()))
    counts = cells.sum(axis=(1, 2))
    return {
        "frames": int(T),
        "union_rate": union / T,
        "run1": runlens[1] / tot,
        "run2": runlens[2] / tot,
        "mean_run": sum(k * v for k, v in runlens.items()) / tot,
        "multi_mark": float((tabs.sum(axis=2) >= 2).any(axis=1).mean()),
        "idle": float((counts == 0).mean()),
        "max_cells": int(counts.max()),
        "frames_gt6_cells": int((counts > 6).sum()),
    }


def scan_fixtures() -> dict:
    excerpts: dict[str, list] = defaultdict(list)
    for f in sorted(os.listdir(REF_DIR)):
        m = PAT.match(f)
        excerpts[f"{m.group(1)}_{m.group(2)}"].append((float(m.group(4)), f))
    agg = Counter()
    cell_hist = Counter()
    runlens: Counter = Counter()
    gt6_examples = []
    frames = 0
    for exc, items in excerpts.items():
        items.sort()
        tabs = np.stack(
            [np.load(os.path.join(REF_DIR, f)) for _, f in items]
        ).astype(bool)
        frames += tabs.shape[0]
        counts = tabs[:, :, 1:].sum(axis=(1, 2))
        for c in counts:
            cell_hist[int(c)] += 1
        for k in np.where(counts > 6)[0][:2]:
            gt6_examples.append((items[k][1], int(counts[k])))
        st = temporal_stats(tabs)
        agg["union"] += st["union_rate"] * st["frames"]
        cells = tabs[:, :, 1:]
        for s in range(6):
            for fr in range(18):
                col = cells[:, s, fr]
                if not col.any():
                    continue
                d = np.diff(np.concatenate([[0], col.astype(int), [0]]))
                for a, b in zip(np.where(d == 1)[0], np.where(d == -1)[0]):
                    runlens[int(b - a)] += 1
    tot_runs = sum(runlens.values())
    return {
        "frames": frames,
        "union_rate": round(agg["union"] / frames, 5),
        "run_fractions": {
            k: round(runlens[k] / tot_runs, 4) for k in sorted(runlens)[:8]
        },
        "mean_run": round(
            sum(k * v for k, v in runlens.items()) / tot_runs, 3
        ),
        "cell_count_hist": dict(sorted(cell_hist.items())),
        "frames_gt6_cells": sum(v for k, v in cell_hist.items() if k > 6),
        "gt6_examples": gt6_examples[:10],
    }


def simulate_hypotheses(trials: int = 24, duration: float = 20.0) -> dict:
    from guitar_tablature_classification_tpu.data.synthetic import (
        events_to_jams_dict,
        random_performance,
    )
    from guitar_tablature_classification_tpu.labels.jams_io import parse_jams
    from guitar_tablature_classification_tpu.labels.tablature import (
        tablature_first_fit_window,
    )

    rng = np.random.default_rng(7)
    out = {"overlap": [], "center": []}
    for _ in range(trials):
        events = random_performance(rng, duration)
        jam = parse_jams(events_to_jams_dict(events, duration))
        n = int(duration / 0.2)
        out["overlap"].append(
            temporal_stats(
                np.stack(
                    [tablature_first_fit_window(jam, 0.2 * i) for i in range(n)]
                )
            )
        )
        out["center"].append(
            temporal_stats(
                np.stack(
                    [first_fit_center(jam, 0.2 * i + 0.1) for i in range(n)]
                )
            )
        )
    return {
        h: {
            k: round(float(np.mean([s[k] for s in stats])), 4)
            for k in stats[0]
        }
        for h, stats in out.items()
    }


def main():
    report = {}
    if os.path.isdir(REF_DIR):
        report["fixtures"] = scan_fixtures()
    report["simulation"] = simulate_hypotheses()
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
