"""Measure what mode-filter smoothing is actually WORTH in accuracy.

The reference applies temporal mode smoothing to per-window predictions
by default at serving time (post_process_tablature,
tablature_generator.py:695-737; the CLI exposes --no-smooth at :985) but
never quantifies its effect.  This repo ships both the vectorized
one-shot filter (`ops.smoothing.mode_filter`, the serving default) and
the bit-faithful in-place sequential port (`mode_filter_sequential`) —
DESIGN.md's quirk table records the *decision*, not the *value*.  This
probe measures both, against window-grid ground truth:

1. Train `resnet18_native` on N synthetic train tracks (the convergence
   -gate recipe, non-overlapping 0.2 s label grid, first-fit labels —
   identical to train/run.py synthetic_loaders).
2. Transcribe H held-out FULL tracks on the reference serving grid
   (0.2 s windows / 0.1 s hop, 50 % overlap) with smoothing OFF.
3. Score mean per-string window accuracy of: raw argmax, vectorized
   mode filter (window 3 and 5), and the sequential reference scan
   (window 3), against `tablature_first_fit_window` labels evaluated at
   each serving-window start.  The all-fret-0 floor of the held-out
   grid is reported alongside (CLAUDE.md rule).

Audio hardness is a knob (`--hardness`, data/synthetic.py RenderConfig)
so the smoothing value can be read off for clean vs degraded recordings
— smoothing corrects isolated per-window errors, which corrupted audio
produces more of.

Run (CPU is fine — the probe is a relative A/B on one model's
predictions, not a throughput benchmark):

    python tools/probe_smoothing_accuracy.py --cpu --hardness 1.0
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (sitecustomize pins "
                        "JAX_PLATFORMS=axon; this must be undone before "
                        "jax import AND via jax.config)")
    p.add_argument("--train-tracks", type=int, default=24)
    p.add_argument("--test-tracks", type=int, default=6)
    p.add_argument("--duration", type=float, default=8.0,
                   help="seconds per track (longer tracks = more "
                        "temporal context for the filter)")
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--learning-rate", type=float, default=0.003)
    p.add_argument("--hardness", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from guitar_tablature_classification_tpu.config import (
        CQTConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from guitar_tablature_classification_tpu.data import make_synthetic_dataset
    from guitar_tablature_classification_tpu.data.guitarset import (
        ArrayDataset, ArrayLoader,
    )
    from guitar_tablature_classification_tpu.data.synthetic import RenderConfig
    from guitar_tablature_classification_tpu.infer import Transcriber
    from guitar_tablature_classification_tpu.labels import parse_jams
    from guitar_tablature_classification_tpu.labels.tablature import (
        tablature_first_fit_window,
    )
    from guitar_tablature_classification_tpu.ops import (
        CQTFrontend, frame_track, mode_filter_sequential, window_times,
    )
    from guitar_tablature_classification_tpu.ops.smoothing import mode_filter_np
    from guitar_tablature_classification_tpu.train import train_model

    cqt_cfg = CQTConfig()
    render = RenderConfig.hardness(args.hardness)
    rng = np.random.default_rng(args.seed)
    tracks = make_synthetic_dataset(
        rng, args.train_tracks + args.test_tracks,
        duration=args.duration, cfg=cqt_cfg, render=render,
    )
    train_tracks = tracks[: args.train_tracks]
    test_tracks = tracks[args.train_tracks:]

    # --- training set: non-overlapping 0.2 s grid, first-fit labels
    # (identical protocol to train/run.py synthetic_loaders)
    frontend = CQTFrontend(cqt_cfg)
    hop = cqt_cfg.window_samples
    feats_list, labels_list = [], []
    for track in train_tracks:
        windows = np.asarray(frame_track(track["audio"], cqt_cfg,
                                         hop_samples=hop))
        feats_list.append(np.asarray(frontend(jnp.asarray(windows))))
        jam = parse_jams(track["jams"])
        for i in range(len(windows)):
            tab = tablature_first_fit_window(
                jam, i * cqt_cfg.window_seconds, cqt_cfg.window_seconds
            )
            labels_list.append(np.argmax(tab, axis=-1).astype(np.int32))
    features = np.concatenate(feats_list)
    labels = np.stack(labels_list)
    dataset = ArrayDataset(features, labels)
    n = len(features)
    perm = np.random.default_rng(args.seed).permutation(n)
    n_val = max(1, n // 10)
    tr_idx, va_idx = perm[n_val:], perm[:n_val]
    model_cfg = ModelConfig(arch="resnet18_native", dtype="float32")
    cfg = TrainConfig(
        model=model_cfg,
        optim=OptimConfig(
            learning_rate=args.learning_rate, epochs=args.epochs,
            seed=args.seed,
        ),
    )
    train_loader = ArrayLoader(dataset, tr_idx, args.batch_size,
                               shuffle=True, seed=args.seed)
    val_loader = ArrayLoader(dataset, va_idx, args.batch_size,
                             shuffle=False)
    t0 = time.time()
    best_state, history = train_model(train_loader, val_loader, cfg)
    train_s = time.time() - t0
    variables = {"params": best_state.params,
                 "batch_stats": best_state.batch_stats}

    # --- held-out transcription on the reference SERVING grid
    # (0.2 s window / 0.1 s hop, 50 % overlap)
    transcriber = Transcriber(variables, model_cfg=model_cfg,
                              cqt_cfg=cqt_cfg, batch_size=128)
    raw_all, truth_all = [], []
    per_track = []
    for track in test_tracks:
        out = transcriber.transcribe(track["audio"], smooth_window=0)
        jam = parse_jams(track["jams"])
        truth = np.stack([
            np.argmax(
                tablature_first_fit_window(jam, float(t),
                                           cqt_cfg.window_seconds),
                axis=-1,
            ).astype(np.int32)
            for t in window_times(track["audio"].shape[0], cqt_cfg)
        ])
        assert truth.shape == out.frets.shape, (truth.shape, out.frets.shape)
        per_track.append((out.frets, truth))
        raw_all.append(out.frets)
        truth_all.append(truth)

    def acc(preds_per_track):
        correct = np.concatenate(
            [p == t for p, (_, t) in zip(preds_per_track, per_track)]
        )
        return float(np.mean(np.mean(correct, axis=0)))

    raw = [p for p, _ in per_track]
    variants = {
        "raw": raw,
        "mode_w3": [mode_filter_np(p, window=3) for p in raw],
        "mode_w5": [mode_filter_np(p, window=5) for p in raw],
        "mode_seq_w3": [mode_filter_sequential(p, window=3) for p in raw],
    }
    truth_cat = np.concatenate([t for _, t in per_track])
    raw_cat = np.concatenate(raw)
    floor = float(np.mean(np.mean(truth_cat == 0, axis=0)))

    # Paired flip accounting: accuracy deltas here are fractions of a
    # point, so report the McNemar-style counts — of the predictions a
    # filter CHANGES, how many become correct (fixed) vs incorrect
    # (broken).  Far more sensitive than the marginal accuracy because
    # raw and smoothed are paired on identical predictions.
    def flips(preds_per_track):
        p = np.concatenate(preds_per_track)
        changed = p != raw_cat
        fixed = int(np.sum(changed & (p == truth_cat)))
        broken = int(np.sum(changed & (raw_cat == truth_cat)))
        return {"changed": int(changed.sum()), "fixed": fixed,
                "broken": broken}
    result = {
        "hardness": args.hardness,
        "train_tracks": args.train_tracks,
        "test_tracks": args.test_tracks,
        "duration_s": args.duration,
        "epochs": args.epochs,
        "train_windows": int(n),
        "test_windows": int(truth_cat.shape[0]),
        "train_wall_s": round(train_s, 1),
        "best_val_loss": round(float(min(history["val_loss"])), 4),
        "floor_all_fret0": round(floor, 4),
        **{f"acc_{k}": round(acc(v), 4) for k, v in variants.items()},
        **{f"flips_{k}": flips(v) for k, v in variants.items()
           if k != "raw"},
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
