"""ViT-S/8 train-step batch sweep + MFU (round-1 VERDICT #6).

Times the full ViT train step (CQT + preprocess + fwd/bwd/update) at
several batch sizes with both attention implementations, reporting
segments/s and model FLOPs utilization against the v5e bf16 peak.

Usage: python tools/profile_vit.py [--batches 64,128,256] [--attn xla,pallas]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from guitar_tablature_classification_tpu.config import (
    CQTConfig,
    ModelConfig,
    OptimConfig,
)
from guitar_tablature_classification_tpu.models import build_model
from guitar_tablature_classification_tpu.ops import CQTFrontend
from guitar_tablature_classification_tpu.train import (
    create_train_state,
    make_preprocess,
    make_train_step,
)

V5E_BF16_PEAK = 197e12  # TPU v5e (lite): 197 TFLOP/s bf16


def vit_train_flops(batch: int, tokens: int) -> float:
    """Approximate fwd+bwd FLOPs for a ViT-S body (12 layers, d=384,
    mlp 1536) at the given token count (785 for the 224^2/8 recipe,
    37 for vit_native's 12x3 grid + CLS)."""
    d, mlp, layers = 384, 1536, 12
    per_layer = (
        4 * tokens * d * d * 2          # qkv + out proj
        + 2 * tokens * tokens * d * 2   # scores + PV
        + 2 * tokens * d * mlp * 2      # MLP
    )
    embed = tokens * 192 * d * 2  # 8x8x3 patch pixels x d (vit_s8);
    # vit_native's 8x3x1 patches are 8x smaller — negligible either way
    # (<0.1% of per-layer cost), so one constant serves both archs.
    fwd = layers * per_layer + embed
    return 3.0 * fwd * batch  # bwd ~= 2x fwd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="64,128,256")
    p.add_argument("--attn", default="xla,pallas")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint each block (activation HBM vs "
                        "~30% extra FLOPs — probes whether the B=64 "
                        "knee is HBM pressure)")
    p.add_argument("--arch", default="vit_s8",
                   choices=["vit_s8", "vit_native"],
                   help="vit_native = rectangular (8,3) patches on the "
                        "raw 96x9 CQT (37 tokens vs 785)")
    p.add_argument("--dropout", type=float, default=None,
                   help="override ModelConfig.dropout (0 probes the "
                        "PRNG/mask share of the step)")
    p.add_argument("--fwd", action="store_true",
                   help="serving bound: CQT + preprocess + eval-mode "
                        "forward only (no loss/bwd/optimizer)")
    p.add_argument("--patch", type=int, default=None,
                   help="override vit_patch (e.g. 16 -> N=197 tokens at "
                        "224^2: probes the pallas/xla attention "
                        "crossover between the N=37 and N=785 endpoints)")
    p.add_argument("--conv-stem", action="store_true",
                   help="vit_conv_stem=True: stride-factored 3x3 "
                        "conv/BN/GELU stem instead of the patchify conv "
                        "(same token grid; the round-5 accuracy winner)")
    args = p.parse_args()

    cqt_cfg = CQTConfig()
    frontend = CQTFrontend(cqt_cfg)
    rng = np.random.default_rng(0)

    for attn in args.attn.split(","):
        kw = {} if args.dropout is None else {"dropout": args.dropout}
        if args.patch is not None:
            kw["vit_patch"] = args.patch
        if args.conv_stem:
            kw["vit_conv_stem"] = True
        model_cfg = ModelConfig(
            arch=args.arch, attention_impl=attn, remat=args.remat, **kw
        )
        # Token count from the SAME config the model is built with (both
        # patch dims — vit_native patches are rectangular (ph, pw)).
        if args.arch == "vit_native":
            ph, pw = model_cfg.vit_patch, model_cfg.vit_native_patch_w
            assert cqt_cfg.n_bins % ph == 0 and cqt_cfg.n_frames % pw == 0, (
                ph, pw, cqt_cfg.n_bins, cqt_cfg.n_frames)
            tokens = (cqt_cfg.n_bins // ph) * (cqt_cfg.n_frames // pw) + 1
        else:
            tokens = (224 // model_cfg.vit_patch) ** 2 + 1
        model = build_model(model_cfg)
        preprocess = make_preprocess(model_cfg, image_size=224)
        sample = jnp.zeros((1, cqt_cfg.n_bins, cqt_cfg.n_frames))
        for b in (int(x) for x in args.batches.split(",")):
            audio = jnp.asarray(
                rng.standard_normal((b, cqt_cfg.window_samples),
                                    dtype=np.float32)
            )
            labels = jnp.asarray(rng.integers(0, 19, (b, 6)), jnp.int32)
            state = create_train_state(
                model, OptimConfig(name="adamw"), jax.random.PRNGKey(0),
                preprocess(sample),
            )
            if args.fwd:
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}

                @jax.jit
                def run_fwd(v):
                    def body(c, _):
                        logits = model.apply(
                            v, preprocess(frontend(audio + c)), train=False
                        )
                        return jnp.sum(logits) * 1e-24, None

                    c, _ = jax.lax.scan(
                        body, jnp.zeros(()), None, length=args.steps
                    )
                    return c

                try:
                    float(run_fwd(variables))
                    t0 = time.perf_counter()
                    float(run_fwd(variables))
                    ms = 1e3 * (time.perf_counter() - t0) / args.steps
                except Exception as e:  # noqa: BLE001
                    print(f"attn={attn:<7s} B={b:<4d} fwd FAILED: "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                    continue
                print(f"attn={attn:<7s} B={b:<4d} {ms:8.2f} ms/fwd "
                      f"{b / (ms / 1e3):9,.0f} windows/s", flush=True)
                continue
            train_step = make_train_step(
                model, preprocess, smoothing=0.1, frontend=frontend
            )

            @jax.jit
            def run(s):
                # Loss feedback (x 1e-24, numerically a no-op) keeps the
                # CQT+preprocess INSIDE the scan — a loop-constant audio
                # batch lets XLA hoist the frontend out of the loop.
                def body(carry, _):
                    s, eps = carry
                    s, m = train_step(
                        s, {"audio": audio + eps, "labels": labels},
                        jax.random.PRNGKey(0), 5e-4,
                    )
                    return (s, m["loss"] * 1e-24), m["loss"]
                (s, _), losses = jax.lax.scan(
                    body, (s, jnp.zeros(())), None, length=args.steps
                )
                return s, losses[-1]

            try:
                state, loss = run(state)
                float(loss)
                t0 = time.perf_counter()
                state, loss = run(state)
                float(loss)
                ms = 1e3 * (time.perf_counter() - t0) / args.steps
            except Exception as e:  # OOM at large batch is a data point
                print(f"attn={attn:<7s} B={b:<4d} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            del state
            segs = b / (ms / 1e3)
            mfu = vit_train_flops(b, tokens) / (ms / 1e3) / V5E_BF16_PEAK
            print(
                f"attn={attn:<7s} B={b:<4d} {ms:8.2f} ms/step "
                f"{segs:9,.0f} seg/s  MFU {100 * mfu:5.1f}%", flush=True,
            )


if __name__ == "__main__":
    main()
