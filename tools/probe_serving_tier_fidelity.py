"""Prediction-level fidelity of the default-tier CQT at serve time.

The `default` precision tier (single-bf16 frame GEMM) is the serving
throughput knob (1.93x — DESIGN.md round 4c), and its documented
fidelity metric is frontend-level: ~0.001 % -60 dB gate flips.  This
probe measures what actually matters to a serving user: **argmax fret
agreement** between bit-exact and default-tier frontends through a
TRAINED checkpoint, on realistic synthetic audio (the GuitarSet-faithful
generator, not noise — gate flips cluster near note onsets/decays).

Usage:
    python tools/probe_serving_tier_fidelity.py \
        --checkpoint-dir /path/to/checkpoints [--windows 8192]

Prints one JSON line: per-string and overall agreement rates, plus the
mean absolute logit delta, for (highest vs default) and the bf16x3
middle tier.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import jax.numpy as jnp
import numpy as np

from guitar_tablature_classification_tpu.config import (
    CQTConfig,
    ModelConfig,
    OptimConfig,
)
from guitar_tablature_classification_tpu.data import make_synthetic_dataset
from guitar_tablature_classification_tpu.models import build_model
from guitar_tablature_classification_tpu.ops import CQTFrontend, frame_track
from guitar_tablature_classification_tpu.train import (
    Checkpointer,
    create_train_state,
    make_preprocess,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--arch", default="resnet18_native")
    p.add_argument("--windows", type=int, default=8192)
    p.add_argument("--batch", type=int, default=2048)
    args = p.parse_args()

    cqt_cfg = CQTConfig()  # precision="highest" reference arm
    model_cfg = ModelConfig(arch=args.arch)
    model = build_model(model_cfg)
    preprocess = make_preprocess(model_cfg)

    # Realistic audio: the GuitarSet-faithful synthetic generator
    # (chords + melody), framed on the training grid.
    rng = np.random.default_rng(7)
    windows = []
    while sum(w.shape[0] for w in windows) < args.windows:
        tracks = make_synthetic_dataset(rng, 4, duration=4.0, cfg=cqt_cfg)
        for t in tracks:
            windows.append(np.asarray(frame_track(t["audio"], cqt_cfg)))
    audio = np.concatenate(windows)[: args.windows].astype(np.float32)
    print(f"device: {jax.devices()}  windows={audio.shape[0]}", flush=True)

    state = create_train_state(
        model, OptimConfig(), jax.random.PRNGKey(0),
        preprocess(jnp.zeros((1, cqt_cfg.n_bins, cqt_cfg.n_frames))),
    )
    ckpt = Checkpointer(args.checkpoint_dir)
    if not ckpt.exists():
        raise SystemExit(f"no checkpoint in {args.checkpoint_dir}")
    state, _ = ckpt.restore(state)

    def predict_fn(precision):
        frontend = CQTFrontend(
            dataclasses.replace(cqt_cfg, precision=precision)
        )

        @jax.jit
        def run(params, batch_stats, a):
            logits = model.apply(
                {"params": params, "batch_stats": batch_stats},
                preprocess(frontend(a)), train=False,
            )
            return jnp.argmax(logits, -1), logits.astype(jnp.float32)

        return run

    results = {}
    preds = {}
    for precision in ("highest", "bf16x3", "default"):
        run = predict_fn(precision)
        fr, lg = [], []
        for i in range(0, audio.shape[0], args.batch):
            f, g = run(state.params, state.batch_stats,
                       jnp.asarray(audio[i:i + args.batch]))
            fr.append(np.asarray(f))
            lg.append(np.asarray(g))
        preds[precision] = (np.concatenate(fr), np.concatenate(lg))
        print(f"{precision}: done", flush=True)

    ref_f, ref_g = preds["highest"]
    for precision in ("bf16x3", "default"):
        f, g = preds[precision]
        agree = (f == ref_f).mean(axis=0)
        results[precision] = {
            "overall_agreement": float((f == ref_f).mean()),
            "per_string_agreement": [float(a) for a in agree],
            "mean_abs_logit_delta": float(np.abs(g - ref_g).mean()),
            "windows": int(f.shape[0]),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
