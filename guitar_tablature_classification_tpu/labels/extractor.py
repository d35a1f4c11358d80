"""Batch JAMS -> tablature label extraction.

Re-implements reference ``GuitarTablatureExtractor``
(jam_to_tablature.py:11-434) against the JSON JAMS reader: walk a
directory of GuitarSet ``.jams``, derive the 0.2 s segment grid, emit one
``(6, 19)`` int8 ``.npy`` per segment, and report generation statistics.

Defaults reproduce the SHIPPED fixture convention (see
:mod:`.tablature`): window-overlap pitch pooling with first-fit string
assignment ("first_fit_window" — pinned in round 4 by the fixtures' own
(string, fret) support) on a 0.2 s grid with filenames
``{track}_segment_{file_index}_{start:.2f}.npy``, where ``file_index`` is
the excerpt's position in the sorted processing order — the naming
measured over all 43,188 files in the reference's ``tablatures/``
directory (360 excerpts, ids 0-359 in sorted order, constant per excerpt;
times walk a contiguous 0.2 s grid from 0.00).  The direct per-string
reading is ``convention="per_string_window"``; the jam_to_tablature.py
center-instant/lowest-fret convention (with its pitch_contour fallback)
is ``convention="lowest_fret_center"``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from .jams_io import Jams, load_jams
from .tablature import (
    tablature_first_fit_window,
    tablature_from_pitch_contour,
    tablature_lowest_fret_center,
    tablature_per_string_window,
)


GUITARSET_AUDIO_PATTERNS = (
    "{base}.wav",
    "{base}_mic.wav",
    "{base}_mix.wav",
    "{base}_hex.wav",
    "{base}_hex_cln.wav",
    "hex_debleeded_{base}.wav",
    "audio_hex-pickup_debleeded/{base}_hex_cln.wav",
)


def find_audio_for_jams(audio_dir: str, jams_base: str) -> str | None:
    """Locate the WAV paired with a JAMS file by probing GuitarSet naming
    variants (the prefix/suffix probing of jam_to_tablature.py:358-367)."""
    for pattern in GUITARSET_AUDIO_PATTERNS:
        candidate = os.path.join(audio_dir, pattern.format(base=jams_base))
        if os.path.exists(candidate):
            return candidate
    return None


@dataclass
class ExtractionStats:
    processed_files: int = 0
    total_segments: int = 0
    segments_with_notes: int = 0
    errors: list[str] = field(default_factory=list)


class GuitarTablatureExtractor:
    """Reference-compatible surface: construct with directories, call
    ``process_all_files`` / ``validate_tablature_data``."""

    def __init__(
        self,
        jams_dir: str,
        output_dir: str,
        *,
        convention: str = "first_fit_window",
        window: float = 0.2,
    ):
        self.jams_dir = jams_dir
        self.output_dir = output_dir
        self.convention = convention
        self.window = window
        os.makedirs(output_dir, exist_ok=True)

    # -- single-segment -------------------------------------------------
    def extract_segment(self, jam: Jams, start: float) -> np.ndarray:
        if self.convention == "first_fit_window":
            return tablature_first_fit_window(jam, start, self.window)
        if self.convention == "per_string_window":
            return tablature_per_string_window(jam, start, self.window)
        if self.convention == "lowest_fret_center":
            center = start + self.window / 2
            tab = tablature_lowest_fret_center(jam, center)
            if tab.sum() == 0:  # fallback (jam_to_tablature.py:317-318)
                tab = tablature_from_pitch_contour(jam, center)
            return tab
        raise ValueError(f"unknown convention {self.convention!r}")

    # -- per-file -------------------------------------------------------
    def segment_starts(self, jam: Jams, duration: float | None = None):
        dur = duration if duration is not None else jam.duration
        if dur is None:
            dur = max(
                (o.time + o.duration for a in jam.annotations for o in a.observations),
                default=0.0,
            )
        n = int(dur / self.window + 1e-9)  # guard float drift (0.6/0.2 -> 3)
        return [i * self.window for i in range(n)]

    def process_file(
        self,
        jams_path: str,
        stats: ExtractionStats | None = None,
        *,
        file_index: int = 0,
    ) -> list[str]:
        stats = stats if stats is not None else ExtractionStats()
        jam = load_jams(jams_path)
        base = os.path.splitext(os.path.basename(jams_path))[0]
        written = []
        for start in self.segment_starts(jam):
            tab = self.extract_segment(jam, start)
            name = f"{base}_segment_{file_index}_{start:.2f}.npy"
            path = os.path.join(self.output_dir, name)
            np.save(path, tab)
            written.append(path)
            stats.total_segments += 1
            # "has notes": any non-open mark (fret > 0) or multiple marks
            if tab[:, 1:].any():
                stats.segments_with_notes += 1
        stats.processed_files += 1
        return written

    def process_all_files(self) -> ExtractionStats:
        stats = ExtractionStats()
        files = sorted(
            f for f in os.listdir(self.jams_dir) if f.endswith(".jams")
        )
        for file_index, fname in enumerate(files):
            try:
                self.process_file(
                    os.path.join(self.jams_dir, fname), stats,
                    file_index=file_index,
                )
            except Exception as exc:  # collect, keep going (:374-378)
                stats.errors.append(f"{fname}: {exc}")
        return stats

    # -- fixture diff ---------------------------------------------------
    def diff_against(self, fixtures_dir: str, max_detail: int = 20) -> dict:
        """Regenerate labels in memory and diff them bit-for-bit against a
        directory of shipped fixtures (the ``tablatures/`` layout).

        The moment real GuitarSet JAMS exist, this is the one-shot
        bit-for-bit audit of reference jam_to_tablature.py:55-178 /
        SURVEY hard part 2: every regenerated ``(6,19)`` array is compared
        to the same-named fixture, and fixture files never produced by the
        regeneration are reported as extra.
        """
        fixture_names = {
            f for f in os.listdir(fixtures_dir) if f.endswith(".npy")
        }
        files = sorted(
            f for f in os.listdir(self.jams_dir) if f.endswith(".jams")
        )
        report = {
            "jams_files": len(files),
            "segments": 0,
            "matched": 0,
            "mismatched": 0,
            "missing_fixture": 0,
            "extra_fixtures": 0,
            "detail": [],
            "errors": [],
        }
        seen = set()
        for file_index, fname in enumerate(files):
            try:
                jam = load_jams(os.path.join(self.jams_dir, fname))
            except Exception as exc:
                report["errors"].append(f"{fname}: {exc}")
                continue
            base = os.path.splitext(fname)[0]
            for start in self.segment_starts(jam):
                name = f"{base}_segment_{file_index}_{start:.2f}.npy"
                report["segments"] += 1
                seen.add(name)
                if name not in fixture_names:
                    report["missing_fixture"] += 1
                    if len(report["detail"]) < max_detail:
                        report["detail"].append(f"missing fixture: {name}")
                    continue
                want = np.load(os.path.join(fixtures_dir, name))
                got = self.extract_segment(jam, start)
                if got.shape == want.shape and np.array_equal(
                    got, want.astype(got.dtype)
                ):
                    report["matched"] += 1
                else:
                    report["mismatched"] += 1
                    if len(report["detail"]) < max_detail:
                        diff_cells = (
                            int(np.sum(got != want))
                            if got.shape == want.shape else -1
                        )
                        report["detail"].append(
                            f"mismatch: {name} ({diff_cells} cells differ)"
                        )
        extras = fixture_names - seen
        report["extra_fixtures"] = len(extras)
        for name in sorted(extras)[: max(0, max_detail - len(report["detail"]))]:
            report["detail"].append(f"extra fixture: {name}")
        report["bit_for_bit"] = (
            report["mismatched"] == 0
            and report["missing_fixture"] == 0
            and report["extra_fixtures"] == 0
            and not report["errors"]
            and report["segments"] > 0
        )
        return report

    # -- repair ---------------------------------------------------------
    def fix_tablature_data(self) -> dict:
        """Majority-vote repair of all-zero label files from their
        temporal neighbours (reference ``fix_tablature_data``,
        new_dataset (1).py:391-456 — present there only as a
        commented-out capability, implemented here the same way the
        dormant augmentation suite is: available, off by default).

        Convenience wrapper over :func:`fix_tablature_data` bound to
        this extractor's ``output_dir``/``window``.
        """
        return fix_tablature_data(self.output_dir, window=self.window)

    # -- validation -----------------------------------------------------
    def validate_tablature_data(
        self, sample_size: int = 100, seed: int = 0
    ) -> dict:
        """Distributional sanity stats over generated labels
        (jam_to_tablature.py:387-434)."""
        files = sorted(
            f for f in os.listdir(self.output_dir) if f.endswith(".npy")
        )
        from .tablature import midi_to_tablature_first_fit

        rng = np.random.default_rng(seed)
        if len(files) > sample_size:
            files = [files[i] for i in rng.choice(len(files), sample_size, False)]
        # reachable (string, fret) support of the first-fit rule — the
        # shipped fixtures' signature (round 4); marks outside it mean
        # the labels were NOT produced with the default convention.
        support = np.zeros((6, 19), bool)
        support[:, 0] = True
        for midi in range(30, 110):
            support |= midi_to_tablature_first_fit([float(midi)]).astype(bool)
        empty = with_notes = 0
        notes_per_frame = []
        rows_with_multi = 0
        support_violations = 0
        for fname in files:
            tab = np.load(os.path.join(self.output_dir, fname))
            marks = int(tab.sum())
            notes_per_frame.append(marks)
            if tab[:, 1:].any():
                with_notes += 1
            else:
                empty += 1
            if (tab.sum(axis=1) >= 2).any():
                rows_with_multi += 1
            if (tab.astype(bool) & ~support).any():
                support_violations += 1
        n = max(len(files), 1)
        return {
            "sampled": len(files),
            "empty_ratio": empty / n,
            "with_notes_ratio": with_notes / n,
            "mean_marks_per_frame": float(np.mean(notes_per_frame)) if files else 0.0,
            "multi_mark_row_ratio": rows_with_multi / n,
            "first_fit_support_violations": support_violations,
        }


def _neighbor_names(fname: str, window: float) -> list[str]:
    """Filenames of the +-1..3 temporal neighbours of a label file.

    Supports both naming grammars found in the reference repo:

    - ``{base}_{i:04d}.npy`` — the jam_to_tablature.py:323 writer, the
      grammar the reference repair pass walks (new_dataset (1).py:403);
    - ``{base}_segment_{idx}_{start:.2f}.npy`` — the shipped-fixture
      grammar this extractor emits (``idx`` is constant per excerpt, the
      time ``start`` walks the 0.2 s grid), where a neighbour is the
      same excerpt at ``start +- k*window``.
    """
    stem = fname[: -len(".npy")]
    parts = stem.split("_")
    out = []
    offsets = [-3, -2, -1, 1, 2, 3]  # new_dataset (1).py:417
    if len(parts) >= 3 and parts[-3] == "segment":
        try:
            start = float(parts[-1])
        except ValueError:
            return []
        prefix = "_".join(parts[:-1])
        for off in offsets:
            t = start + off * window
            if t < -1e-9:
                continue
            out.append(f"{prefix}_{abs(t):.2f}.npy")
    else:
        seg = parts[-1]
        if not (seg.isdigit() and len(seg) == 4):
            return []
        prefix = "_".join(parts[:-1])
        for off in offsets:
            i = int(seg) + off
            if i < 0:
                continue
            out.append(f"{prefix}_{i:04d}.npy")
    return out


def fix_tablature_data(output_dir: str, window: float = 0.2) -> dict:
    """Repair all-zero tablature files by neighbour majority vote.

    Behavioural port of the reference's commented-out repair pass
    (new_dataset (1).py:391-456): a label file whose matrix is entirely
    zero (possible under the ``lowest_fret_center`` convention when no
    note covers the segment and the pitch-contour fallback is empty;
    never under the window conventions, which mark fret 0 on idle
    strings) is replaced by the majority vote of its non-empty
    neighbours within +-3 segments — cells marked in **more than half**
    of the found neighbours survive (threshold ``len(neighbors)/2``,
    new_dataset (1).py:437) — and is only written back if the inferred
    matrix is itself non-empty.  Files are visited in sorted-name order
    (deterministic, where the reference walks filesystem ``rglob``
    order) and each is loaded fresh, so repairs CASCADE exactly as in
    the reference: a just-repaired segment votes for later empties.
    Returns the reference's stats dict
    ``{"total", "with_played_strings", "fixed"}``.
    """
    files = sorted(f for f in os.listdir(output_dir) if f.endswith(".npy"))
    with_played = 0
    fixed = 0
    for fname in files:
        path = os.path.join(output_dir, fname)
        tab = np.load(path)
        if tab.sum() > 0:
            with_played += 1
            continue
        neighbors = []
        for nb in _neighbor_names(fname, window):
            nb_path = os.path.join(output_dir, nb)
            if os.path.exists(nb_path):
                nb_tab = np.load(nb_path)
                if nb_tab.sum() > 0:
                    neighbors.append(nb_tab.astype(np.int64))
        if not neighbors:
            continue
        combined = np.sum(neighbors, axis=0)
        inferred = (combined > len(neighbors) / 2).astype(tab.dtype)
        if inferred.sum() > 0:
            np.save(path, inferred)
            fixed += 1
    return {
        "total": len(files),
        "with_played_strings": with_played,
        "fixed": fixed,
    }


def main(argv=None) -> int:
    """CLI: python -m guitar_tablature_classification_tpu.labels.extractor"""
    import argparse

    p = argparse.ArgumentParser(prog="tab-extract-labels")
    p.add_argument("jams_dir", help="directory of GuitarSet .jams files")
    p.add_argument("output_dir", help="output directory for (6,19) .npy")
    p.add_argument("--convention", default="first_fit_window",
                   choices=["first_fit_window", "per_string_window",
                            "lowest_fret_center"])
    p.add_argument("--window", type=float, default=0.2)
    p.add_argument("--validate", action="store_true")
    p.add_argument("--repair", action="store_true",
                   help="after extraction, majority-vote repair all-zero "
                        "label files from their +-3-segment neighbours "
                        "(reference fix_tablature_data, "
                        "new_dataset (1).py:391-456)")
    p.add_argument("--diff", metavar="FIXTURES_DIR", default=None,
                   help="regenerate in memory and diff bit-for-bit against "
                        "a fixtures directory (e.g. the shipped tablatures/)"
                        " instead of writing; exit 1 on any divergence")
    args = p.parse_args(argv)
    ex = GuitarTablatureExtractor(
        args.jams_dir, args.output_dir, convention=args.convention,
        window=args.window,
    )
    if args.diff:
        report = ex.diff_against(args.diff)
        print(
            f"jams={report['jams_files']} segments={report['segments']} "
            f"matched={report['matched']} mismatched={report['mismatched']} "
            f"missing={report['missing_fixture']} "
            f"extra={report['extra_fixtures']} "
            f"bit_for_bit={report['bit_for_bit']}"
        )
        for line in report["detail"]:
            print(f"  {line}")
        for err in report["errors"][:10]:
            print(f"  error: {err}")
        return 0 if report["bit_for_bit"] else 1
    stats = ex.process_all_files()
    print(
        f"files={stats.processed_files} segments={stats.total_segments} "
        f"with_notes={stats.segments_with_notes} errors={len(stats.errors)}"
    )
    for err in stats.errors[:10]:
        print(f"  error: {err}")
    if args.repair:
        print(ex.fix_tablature_data())
    if args.validate:
        print(ex.validate_tablature_data())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
