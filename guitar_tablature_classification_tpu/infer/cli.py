"""Command-line transcription: audio file -> ASCII tab + images.

Preserves the reference CLI surface (tablature_generator.py:977-1006,
tablature-generator (1).py:558-596): positional audio path, --model,
--output, --segment-duration, --overlap, --no-smooth, --visualize; adds
--arch/--image to select the model family and tab-image rendering.

Checkpoints: Orbax directories (this framework's training output) or
reference ``.pt`` files (converted on load) both work.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tab-transcribe",
        description="Transcribe guitar audio to tablature on TPU",
    )
    p.add_argument("audio", help="input audio file (WAV; MP3 with ffmpeg)")
    p.add_argument("--model", default=None,
                   help="checkpoint: Orbax dir or reference .pt file")
    p.add_argument("--arch", default=None,
                   choices=["resnet18", "resnet18_native", "vit_s8",
                            "vit_native", "small_cnn"],
                   help="architecture (default resnet18; mutually "
                        "exclusive with --recipe)")
    p.add_argument("--recipe", default=None,
                   choices=["cnn-reference", "vit-reference",
                            "native-best", "vit-small-data"],
                   help="named training preset (config.RECIPES): serve "
                        "a checkpoint trained with `tab-train --recipe X`"
                        " using the matching model config (e.g. "
                        "vit-small-data = vit_native with (16,3) patches)")
    p.add_argument("--output", default=None, help="output .txt path")
    p.add_argument("--image", default=None, help="render tab image PNG")
    p.add_argument("--visualize", default=None,
                   help="render per-string activation plot PNG")
    p.add_argument("--segment-duration", type=float, default=0.2)
    p.add_argument("--overlap", type=float, default=0.5,
                   help="window overlap fraction (0.5 -> 0.1 s hop)")
    p.add_argument("--no-smooth", action="store_true",
                   help="disable mode smoothing")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--serving-recipe", action="store_true",
                   help="use the reference CNN inference CQT recipe "
                        "(84 bins, 22.05 kHz, fmin C2; "
                        "tablature_generator.py:619) instead of the "
                        "training recipe")
    return p


def load_transcriber(args):
    import dataclasses

    from ..config import CQTConfig, ModelConfig, RECIPES
    from .transcribe import Transcriber, transcriber_from_torch_checkpoint

    if args.recipe is not None and args.arch is not None:
        raise SystemExit("--recipe implies an arch; pass one or the other")
    if args.recipe is not None:
        # serve with the same model/CQT config the preset trained with
        recipe_cfg = RECIPES[args.recipe]()
        model_cfg = recipe_cfg.model
        base = recipe_cfg.cqt
    else:
        model_cfg = ModelConfig(arch=args.arch or "resnet18")
        base = (
            CQTConfig.serving_cnn()
            if getattr(args, "serving_recipe", False)
            else CQTConfig()
        )
    cqt_cfg = dataclasses.replace(
        base,
        window_seconds=args.segment_duration,
        hop_seconds=args.segment_duration * (1.0 - args.overlap),
    )
    if args.model and args.model.endswith(".pt"):
        return transcriber_from_torch_checkpoint(
            args.model, arch=model_cfg.arch, model_cfg=model_cfg,
            cqt_cfg=cqt_cfg, batch_size=args.batch_size,
        )
    if args.model:  # Orbax checkpoint directory
        import jax

        from ..config import OptimConfig
        from ..models import build_model
        from ..train import Checkpointer, create_train_state, make_preprocess

        model = build_model(model_cfg)
        preprocess = make_preprocess(model_cfg)
        sample = preprocess(np.zeros((1, cqt_cfg.n_bins, cqt_cfg.n_frames)))
        template = create_train_state(
            model, OptimConfig(), jax.random.PRNGKey(0), sample
        )
        from ..train.checkpoint import CheckpointMismatchError

        directory, name = os.path.split(args.model.rstrip("/"))
        try:
            state, _ = Checkpointer(directory, name).restore(
                template, expect_model=dataclasses.asdict(model_cfg)
            )
        except CheckpointMismatchError as e:
            raise SystemExit(f"--model: {e}")
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:  # random init (smoke/demo mode)
        import jax

        from ..models import build_model
        from ..train import make_preprocess

        model = build_model(model_cfg)
        preprocess = make_preprocess(model_cfg)
        sample = preprocess(
            np.zeros((1, cqt_cfg.n_bins, cqt_cfg.n_frames), np.float32)
        )
        variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    return Transcriber(
        variables, model_cfg=model_cfg, cqt_cfg=cqt_cfg,
        batch_size=args.batch_size,
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..data.audio import load_audio
    from .tab_image import create_tablature_image, plot_string_activations
    from .tab_text import write_tablature_file

    transcriber = load_transcriber(args)
    audio, _ = load_audio(
        args.audio, sample_rate=transcriber.cqt_cfg.sample_rate
    )
    result = transcriber.transcribe(
        audio, smooth_window=0 if args.no_smooth else 3
    )

    out_path = args.output or os.path.splitext(args.audio)[0] + "_tab.txt"
    text = write_tablature_file(
        out_path, result.frets, result.times,
        title=os.path.basename(args.audio),
    )
    print(text)
    print(f"tablature written to {out_path}")
    if args.image:
        create_tablature_image(
            result.frets, result.times, args.image,
            title=os.path.basename(args.audio),
        )
        print(f"tab image written to {args.image}")
    if args.visualize:
        plot_string_activations(result.frets, result.times, args.visualize)
        print(f"activation plot written to {args.visualize}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
