"""ViT recipe sweep at the 43k-window GuitarSet scale (round-5 VERDICT #3).

Round 4 showed the 32-track sweep regime does not transfer to scale
(augmentation flipped sign), yet `vit-small-data`'s recipe (patch (16,3),
lr 5e-4, backbone lr/10, cosine warm restarts T0=5) was selected on
32-track sweeps.  At 43k windows it scores 95.19-95.30 % vs small_cnn's
96.51 %.  This sweeps the recipe axes AT scale, against cached
features/labels produced once by tools/run_guitarset.py steps 1-3.

Hypothesis order (cheapest-compile-first; lr/T0/seed variants share one
compiled program since lr is optax-injected and the schedule is
host-side, so only distinct (patch, backbone_lr_scale) pairs compile):

- backbone_lr_scale=1.0: the lr/10 backbone split is a FINETUNING recipe
  (ViT_engine.py:244-251 assumes pretrained weights); training from
  scratch there is no pretrained backbone to protect.
- lr x {2e-4, 5e-4, 1e-3} and cosine T0 x {5, 10} at scale.
- patch 8 vs 16: the (16,3) win came from the small-data regime.

Two seeds on the winner.  Results land in {workdir}/sweep_results.jsonl
(resumable: finished rows are skipped on re-run).

Usage:
    python tools/make_synthetic_guitarset.py --out /tmp/synthset
    python tools/run_guitarset.py --audio /tmp/synthset/audio \
        --annotation /tmp/synthset/annotation --workdir /tmp/synthset/work \
        --recipe vit-small-data --epochs 0   # or just reuse its features
    python tools/sweep_vit_scale.py --features /tmp/synthset/work/features \
        --labels /tmp/synthset/work/labels --workdir /tmp/vitsweep
"""

from __future__ import annotations

import argparse
import contextlib
import dataclasses
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_configs():
    """(name, model-overrides, optim-overrides) rows, compile-friendly
    order: all (patch16, bb=0.1) first, then (patch16, bb=1.0), then
    patch8 — each group shares one compiled train program."""
    # Every row pins its backbone_lr_scale/cosine_t0/vit_conv_stem
    # EXPLICITLY: the vit-small-data base recipe adopted this sweep's
    # winners mid-round (bb=1.0/T0=10, then conv_stem=True after the
    # round-5c study), so rows relying on the old base defaults would
    # silently change meaning on a re-run.
    patchify = {"vit_conv_stem": False}
    rows = [
        # reproduce the round-4 scale row (sanity anchor)
        ("base_p16_bb0.1_lr5e-4_t5", patchify, {"backbone_lr_scale": 0.1,
                                                "cosine_t0": 5}),
        ("p16_bb0.1_lr5e-4_t10", patchify, {"backbone_lr_scale": 0.1,
                                            "cosine_t0": 10}),
        # from-scratch hypothesis: no pretrained backbone to protect
        ("p16_bb1_lr5e-4_t5", patchify, {"backbone_lr_scale": 1.0,
                                         "cosine_t0": 5}),
        ("p16_bb1_lr1e-3_t5", patchify, {"backbone_lr_scale": 1.0,
                                         "cosine_t0": 5,
                                         "learning_rate": 1e-3}),
        ("p16_bb1_lr2e-4_t5", patchify, {"backbone_lr_scale": 1.0,
                                         "cosine_t0": 5,
                                         "learning_rate": 2e-4}),
        ("p16_bb1_lr5e-4_t10", patchify, {"backbone_lr_scale": 1.0,
                                          "cosine_t0": 10}),
        # patch granularity at scale
        ("p8_bb1_lr5e-4_t5", {"vit_patch": 8, **patchify},
         {"backbone_lr_scale": 1.0, "cosine_t0": 5}),
        # round-5 follow-up: is the remaining ~0.35-point gap to
        # small_cnn architectural?  The conv-stem embedding (Xiao et
        # al. 2021) injects the convolutional inductive bias while
        # keeping the transformer body — if locality is what's missing,
        # this should close most of the gap.
        ("convstem_p16_bb1_lr5e-4_t10", {"vit_conv_stem": True},
         {"backbone_lr_scale": 1.0, "cosine_t0": 10}),
    ]
    return rows


def run_one(name, model_over, optim_over, args, seed):
    from guitar_tablature_classification_tpu.config import (
        TrainConfig, to_json,
    )
    from guitar_tablature_classification_tpu.train.run import main as train_main

    base = TrainConfig.vit_small_data()
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(base.model, **model_over),
        optim=dataclasses.replace(
            base.optim, **{**optim_over, "seed": seed}
        ),
    )
    cfg_path = os.path.join(args.workdir, f"{name}_s{seed}.json")
    with open(cfg_path, "w") as f:
        f.write(to_json(cfg))
    ckpt_dir = os.path.join(args.workdir, f"ckpt_{name}_s{seed}")
    argv = [
        "--features", args.features, "--labels", args.labels,
        "--config", cfg_path, "--checkpoint-dir", ckpt_dir,
    ]
    if args.epochs is not None:
        argv += ["--epochs", str(args.epochs)]

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            sys.__stdout__.flush()

    t0 = time.perf_counter()
    with contextlib.redirect_stdout(Tee()):
        rc = train_main(argv)
    if rc != 0:
        return {"name": name, "seed": seed, "error": f"rc={rc}"}
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    per = result["per_string"]
    return {
        "name": name,
        "seed": seed,
        "mean_per_string": round(100.0 * sum(per) / len(per), 3),
        "test_accuracy": round(100.0 * result["test_accuracy"], 3),
        "best_val_loss": round(result["best_val_loss"], 4),
        "wall_s": round(time.perf_counter() - t0, 1),
        "model": model_over,
        "optim": optim_over,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--features", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--workdir", required=True)
    p.add_argument("--epochs", type=int, default=None,
                   help="override (smoke runs); default = recipe's 30")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--winner-seeds", type=int, default=1,
                   help="extra seeds to run on the best config at the end")
    p.add_argument("--only", default=None,
                   help="run only the named config (skip the rest)")
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    results_path = os.path.join(args.workdir, "sweep_results.jsonl")
    done = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            for line in f:
                row = json.loads(line)
                done[(row["name"], row["seed"])] = row

    def record(row):
        done[(row["name"], row["seed"])] = row
        with open(results_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[sweep] {row}", flush=True)

    for name, mo, oo in build_configs():
        if args.only is not None and name != args.only:
            continue
        if (name, args.seed) in done:
            print(f"[sweep] skip {name} (done)", flush=True)
            continue
        record(run_one(name, mo, oo, args, args.seed))

    scored = [r for r in done.values() if "mean_per_string" in r]
    if not scored:
        print("[sweep] no successful runs")
        return 1
    best = max(scored, key=lambda r: r["mean_per_string"])
    print(f"[sweep] winner: {best['name']} ({best['mean_per_string']}%)",
          flush=True)
    by_name = {n: (mo, oo) for n, mo, oo in build_configs()}
    for extra in range(args.winner_seeds):
        seed = args.seed + 1 + extra
        if (best["name"], seed) in done:
            continue
        mo, oo = by_name[best["name"]]
        record(run_one(best["name"], mo, oo, args, seed))

    for row in sorted(done.values(),
                      key=lambda r: -r.get("mean_per_string", 0)):
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
