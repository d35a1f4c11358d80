"""Training entry point — the ``bestengine.py`` / ``ViT_engine.py``
equivalent, driven by the config system.

    python -m guitar_tablature_classification_tpu.train.run \
        --features cqt_features/ --labels tablatures/ --arch resnet18

With ``--synthetic`` (no GuitarSet on disk) it renders a synthetic
performance dataset (audio + JAMS -> CQT features + labels) and trains on
that end to end — the full pipeline without the proprietary payload.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tab-train")
    p.add_argument("--features", default=None, help="CQT feature .npy dir")
    p.add_argument("--labels", default=None, help="tablature .npy dir")
    p.add_argument("--arch", default=None,
                   choices=["resnet18", "resnet18_native", "vit_s8",
                            "vit_native", "small_cnn"],
                   help="architecture (default resnet18; mutually "
                        "exclusive with --recipe, which implies one)")
    p.add_argument("--recipe", default=None,
                   choices=["cnn-reference", "vit-reference",
                            "native-best", "vit-small-data"],
                   help="named measured-best preset (config.RECIPES): "
                        "'native-best' = resnet18_native + default-tier "
                        "CQT + knee batch; 'vit-small-data' = vit_native "
                        "with (16,3) patches — see DESIGN.md")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--config", default=None, help="TrainConfig JSON file")
    p.add_argument("--report-dir", default=None,
                   help="write the visualization artifact suite here")
    p.add_argument("--report-every", type=int, default=0, metavar="N",
                   help="also emit metric curves + confusion matrices "
                        "into --report-dir every N epochs during training "
                        "(reference: metric plots every 5 epochs, "
                        "bestengine.py:1006-1007; per-epoch confusion "
                        "matrices, ViT_engine.py:473)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthesized audio/labels (no dataset needed)")
    p.add_argument("--synthetic-tracks", type=int, default=8)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the first epoch")
    p.add_argument("--debug-nans", action="store_true",
                   help="raise on any NaN produced on device (jax_debug_nans)")
    p.add_argument("--stem-fusion", default=None,
                   choices=["off", "on", "fused"],
                   help="resnet18 stem mode: 'fused' = quadrant GEMM "
                        "front + Pallas BN/ReLU/pool kernels "
                        "(ModelConfig.stem_fusion)")
    p.add_argument("--bn-fusion", default=None, choices=["off", "on"],
                   help="resnet trunk BatchNorms as single-pass Pallas "
                        "stat reductions (ModelConfig.bn_fusion)")
    p.add_argument("--cqt-precision", default=None,
                   choices=["highest", "bf16x3", "default"],
                   help="CQT frame-GEMM MXU precision: 'default' is "
                        "1.74x faster with 0.001%% gate flips "
                        "(CQTConfig.precision; see DESIGN.md)")
    p.add_argument("--cqt-split", default=None,
                   choices=["auto", "off"],
                   help="zero-support split CQT kernel: ~1.4x faster "
                        "frontend dropping exactly-zero GEMM terms only "
                        "(CQTConfig.gemm_split; see DESIGN.md)")
    p.add_argument("--augment", action="store_true", default=None,
                   help="enable the spectrogram augmentation suite "
                        "(OptimConfig.augment; ViT_engine.py:28-93 "
                        "equivalents — measured per-arch effects in "
                        "DESIGN.md's C12 matrix)")
    p.add_argument("--augment-prob", type=float, default=None,
                   help="per-window augmentation probability "
                        "(OptimConfig.augment_prob, default 0.5; "
                        "implies --augment)")
    p.add_argument("--seed", type=int, default=None,
                   help="training seed (OptimConfig.seed: init, dropout, "
                        "augmentation and synthetic-data streams; the "
                        "data split keeps DataConfig.split_seed)")
    p.add_argument("--eval-only", action="store_true",
                   help="skip training: restore the checkpoint from "
                        "--checkpoint-dir and run validation + test on "
                        "the standard split (reference equivalent: the "
                        "final test_model pass, bestengine.py:1090-1093, "
                        "without retraining); honors --report-dir")
    return p


def make_config(args):
    from ..config import (
        DataConfig, ModelConfig, OptimConfig, RECIPES, TrainConfig,
        train_config_from_json,
    )

    # Precedence (documented + tested in tests/test_cli_config.py):
    # base config comes from exactly ONE of --config / --recipe / --arch
    # (conflicts are errors, never silent); explicit flags then override
    # individual fields of that base.
    if args.recipe is not None and args.arch is not None:
        raise SystemExit("--recipe implies an arch; pass one or the other")
    if args.config and args.recipe is not None:
        raise SystemExit(
            "--config and --recipe both define a full base config; pass "
            "one or the other (flags like --epochs still override fields)"
        )
    if args.config and args.arch is not None:
        raise SystemExit(
            "--config already pins the arch; pass one or the other"
        )
    if args.config:
        with open(args.config) as f:
            cfg = train_config_from_json(f.read())
    elif args.recipe is not None:
        cfg = RECIPES[args.recipe]()
    elif args.arch in ("vit_s8", "vit_native"):
        cfg = TrainConfig.vit_default()
        if args.arch != cfg.model.arch:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, arch=args.arch)
            )
    else:
        arch = args.arch or "resnet18"
        cfg = TrainConfig.cnn_default()
        if arch != cfg.model.arch:
            cfg = dataclasses.replace(cfg, model=ModelConfig(arch=arch))
    optim = cfg.optim
    if args.epochs is not None:
        optim = dataclasses.replace(optim, epochs=args.epochs)
    if args.learning_rate is not None:
        optim = dataclasses.replace(optim, learning_rate=args.learning_rate)
    if getattr(args, "augment", None):
        optim = dataclasses.replace(optim, augment=True)
    if getattr(args, "augment_prob", None) is not None:
        # Setting a probability is explicit intent — imply --augment so
        # `--augment-prob 0.9` alone can't silently train unaugmented.
        optim = dataclasses.replace(
            optim, augment=True, augment_prob=args.augment_prob
        )
    if getattr(args, "seed", None) is not None:
        optim = dataclasses.replace(optim, seed=args.seed)
    data = cfg.data
    if args.batch_size is not None:
        data = dataclasses.replace(data, batch_size=args.batch_size)
    model = cfg.model
    if getattr(args, "stem_fusion", None) is not None:
        model = dataclasses.replace(model, stem_fusion=args.stem_fusion)
    if getattr(args, "bn_fusion", None) is not None:
        model = dataclasses.replace(model, bn_fusion=args.bn_fusion)
    cqt = cfg.cqt
    if getattr(args, "cqt_precision", None) is not None:
        cqt = dataclasses.replace(cqt, precision=args.cqt_precision)
    if getattr(args, "cqt_split", None) is not None:
        cqt = dataclasses.replace(cqt, gemm_split=args.cqt_split)
    return dataclasses.replace(
        cfg, optim=optim, data=data, model=model, cqt=cqt,
        checkpoint_dir=args.checkpoint_dir,
    )


def synthetic_loaders(cfg, num_tracks: int):
    """Render tracks -> on-device CQT features + window labels -> loaders."""
    import jax

    from ..data import make_synthetic_dataset
    from ..data.guitarset import ArrayLoader, torch_random_split_indices
    from ..labels import parse_jams
    from ..labels.tablature import tablature_first_fit_window
    from ..ops import CQTFrontend, frame_track

    frontend = CQTFrontend(cfg.cqt)
    rng = np.random.default_rng(cfg.optim.seed)
    tracks = make_synthetic_dataset(rng, num_tracks, duration=4.0, cfg=cfg.cqt)

    from ..data.guitarset import ArrayDataset

    feats_list, labels_list = [], []
    hop = cfg.cqt.window_samples  # non-overlapping 0.2 s grid (fixture grid)
    for track in tracks:
        windows = np.asarray(frame_track(track["audio"], cfg.cqt, hop_samples=hop))
        feats = np.asarray(frontend(jax.numpy.asarray(windows)))
        jam = parse_jams(track["jams"])
        for i in range(len(windows)):
            start = i * cfg.cqt.window_seconds
            # Shipped-fixture label convention (first-fit pooling) so the
            # synthetic gates exercise the same task as real GuitarSet
            # training against tablatures/*.npy, argmaxed like the
            # reference loaders (my_dataloader.py:40-44).
            tab = tablature_first_fit_window(jam, start, cfg.cqt.window_seconds)
            labels_list.append(np.argmax(tab, axis=-1).astype(np.int32))
        feats_list.append(feats)
    features = np.concatenate(feats_list)
    labels = np.stack(labels_list)
    dataset = ArrayDataset(features, labels)
    tr, va, te = torch_random_split_indices(
        len(features), (0.8, 0.1, 0.1), cfg.data.split_seed
    )
    batch = min(cfg.data.batch_size, max(8, len(tr) // 4))
    make = lambda idx, sh: ArrayLoader(  # noqa: E731
        dataset, idx, batch, shuffle=sh, seed=cfg.data.shuffle_seed
    )
    return make(tr, True), make(va, False), make(te, False)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = make_config(args)

    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    from ..data.guitarset import create_dataloaders
    from ..train import Checkpointer, test_model, train_model
    from ..train.engine import make_eval_step, make_preprocess
    from ..models import build_model
    from ..utils import MetricsLogger

    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    logger = MetricsLogger(os.path.join(cfg.checkpoint_dir, "train_log.jsonl"))

    if args.synthetic:
        train_loader, val_loader, test_loader = synthetic_loaders(
            cfg, args.synthetic_tracks
        )
    else:
        if not (args.features and args.labels):
            raise SystemExit("--features and --labels required (or --synthetic)")
        train_loader, val_loader, test_loader = create_dataloaders(
            args.features, args.labels, cfg.data.batch_size, config=cfg.data
        )

    ckpt = Checkpointer(cfg.checkpoint_dir, cfg.checkpoint_name)
    from ..utils.profiling import trace

    if args.eval_only:
        import jax
        import jax.numpy as jnp

        from ..train import create_train_state, validate_model

        if not ckpt.exists():
            raise SystemExit(
                f"--eval-only: no checkpoint in {cfg.checkpoint_dir}"
            )
        model = build_model(cfg.model)
        peek = next(iter(val_loader))
        input_kind = (
            "rgb_image" if peek["features"].ndim == 4 else "db_features"
        )
        preprocess = make_preprocess(
            cfg.model, cfg.data.image_size, input_kind
        )
        state = create_train_state(
            model, cfg.optim, jax.random.PRNGKey(cfg.optim.seed),
            preprocess(jnp.asarray(peek["features"][:1])),
        )
        from ..train.checkpoint import CheckpointMismatchError

        try:
            state, meta = ckpt.restore(
                state, expect_model=dataclasses.asdict(cfg.model)
            )
        except CheckpointMismatchError as e:
            raise SystemExit(f"--eval-only: {e}")
        eval_step = make_eval_step(
            model, preprocess, smoothing=cfg.optim.label_smoothing
        )
        val = validate_model(state, eval_step, val_loader)
        test = test_model(state, eval_step, test_loader)
        logger.log(
            "eval_only", val_loss=val["loss"], accuracy=test["accuracy"],
            per_string=test["per_string_accuracy"],
        )
        print(json.dumps({
            "test_accuracy": test["accuracy"],
            "per_string": test["per_string_accuracy"].tolist(),
            "val_loss": val["loss"],
            "val_accuracy": val["accuracy"],
            "checkpoint_step": int(state.step),
        }))
        if args.report_dir:
            history = {"epochs": [], "train_loss": [], "val_loss": [],
                       "val_accuracy": [], "lr": [],
                       "best_val_loss": val["loss"]}
            write_report(
                args.report_dir, history, state, model, cfg, test_loader,
                input_kind=input_kind,
            )
        return 0

    on_epoch_end = None
    if args.report_every:
        if not args.report_dir:
            raise SystemExit("--report-every requires --report-dir")
        on_epoch_end = make_periodic_reporter(
            args.report_dir, args.report_every, cfg, val_loader
        )

    with trace(args.profile_dir):
        state, history = train_model(
            train_loader, val_loader, cfg, checkpointer=ckpt,
            resume=args.resume, log=lambda s: logger.log("epoch", msg=s),
            on_epoch_end=on_epoch_end,
        )

    model = build_model(cfg.model)
    peek = next(iter(test_loader))
    input_kind = "rgb_image" if peek["features"].ndim == 4 else "db_features"
    eval_step = make_eval_step(
        model, make_preprocess(cfg.model, cfg.data.image_size, input_kind),
        smoothing=cfg.optim.label_smoothing,
    )
    test = test_model(state, eval_step, test_loader)
    logger.log(
        "test", accuracy=test["accuracy"],
        per_string=test["per_string_accuracy"],
    )
    print(json.dumps({
        "test_accuracy": test["accuracy"],
        "per_string": test["per_string_accuracy"].tolist(),
        "best_val_loss": history["best_val_loss"],
    }))

    if args.report_dir:
        write_report(
            args.report_dir, history, state, model, cfg, test_loader,
            input_kind=input_kind,
        )
    return 0


def make_periodic_reporter(report_dir, every: int, cfg, val_loader):
    """Mid-training artifact emitter for ``--report-every N``: every N
    epochs, write the metric curves so far plus validation confusion
    matrices (epoch-stamped filenames).  Reference behavior: metric plots
    every 5 epochs (bestengine.py:1006-1007) and confusion matrices during
    every validation pass (ViT_engine.py:473)."""
    import jax
    import jax.numpy as jnp

    from ..report import plot_confusion_matrices, plot_training_metrics
    from ..train import confusion_matrices
    from ..train.engine import make_preprocess

    os.makedirs(report_dir, exist_ok=True)
    peek = next(iter(val_loader))
    input_kind = "rgb_image" if peek["features"].ndim == 4 else "db_features"
    preprocess = make_preprocess(cfg.model, cfg.data.image_size, input_kind)
    cache: dict = {}

    def on_epoch_end(epoch, history, state):
        if (epoch + 1) % every:
            return
        if "predict" not in cache:  # jit once, reuse across epochs

            @jax.jit
            def predict(params, batch_stats, feats):
                variables = {"params": params, "batch_stats": batch_stats}
                logits = state.apply_fn(
                    variables, preprocess(feats), train=False
                )
                return jnp.argmax(logits, -1)

            cache["predict"] = predict
        predict = cache["predict"]
        preds, targets = [], []
        for batch in val_loader:
            p = np.asarray(
                predict(state.params, state.batch_stats,
                        jnp.asarray(batch["features"]))
            )
            weights = batch.get("weights")
            mask = (
                np.ones(p.shape[0], bool) if weights is None
                else np.asarray(weights)[:, 0] > 0
            )
            preds.append(p[mask])
            targets.append(np.asarray(batch["labels"])[mask])
        preds = np.concatenate(preds)
        targets = np.concatenate(targets)
        tag = f"epoch{epoch + 1:03d}"
        plot_training_metrics(
            history, os.path.join(report_dir, f"training_metrics_{tag}.png")
        )
        cm = np.asarray(
            confusion_matrices(jnp.asarray(preds), jnp.asarray(targets))
        )
        plot_confusion_matrices(
            cm, os.path.join(report_dir, f"confusion_matrices_{tag}.png")
        )

    return on_epoch_end


def write_report(
    report_dir, history, state, model, cfg, test_loader,
    input_kind="db_features",
):
    """Emit the full visualization artifact suite (reference C13 set)."""
    import jax
    import jax.numpy as jnp

    from ..report import (
        plot_confusion_matrices,
        plot_correct_incorrect_distribution,
        plot_model_architecture,
        plot_per_fret_accuracy,
        plot_prediction_overlay,
        plot_sample_inputs,
        plot_training_metrics,
    )
    from ..train import confusion_matrices, make_preprocess, per_fret_accuracy

    os.makedirs(report_dir, exist_ok=True)
    preprocess = make_preprocess(cfg.model, cfg.data.image_size, input_kind)

    @jax.jit
    def predict(feats):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return jnp.argmax(
            state.apply_fn(variables, preprocess(feats), train=False), -1
        )

    preds, targets, feats0 = [], [], None
    for batch in test_loader:
        mask = batch["weights"][:, 0] > 0
        p = np.asarray(predict(jnp.asarray(batch["features"])))
        preds.append(p[mask])
        targets.append(batch["labels"][mask])
        if feats0 is None:
            feats0 = batch["features"][mask][:8]
    preds = np.concatenate(preds)
    targets = np.concatenate(targets)

    path = lambda name: os.path.join(report_dir, name)  # noqa: E731
    plot_training_metrics(history, path("training_metrics.png"))
    plot_sample_inputs(feats0, path("sample_inputs.png"), labels=targets[:8])
    plot_prediction_overlay(
        feats0, preds[:8], targets[:8], path("prediction_overlay.png")
    )
    plot_correct_incorrect_distribution(
        preds, targets, path("correct_incorrect.png")
    )
    cm = np.asarray(
        confusion_matrices(jnp.asarray(preds), jnp.asarray(targets))
    )
    plot_confusion_matrices(cm, path("confusion_matrices.png"))
    acc, support = per_fret_accuracy(cm)
    plot_per_fret_accuracy(acc, support, path("fret_accuracy.png"))
    plot_model_architecture(state.params, path("model_architecture.png"))


if __name__ == "__main__":
    raise SystemExit(main())
