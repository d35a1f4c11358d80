"""resnet18_native train-step batch sweep (+ optional CQT-only timing).

Finds the batch knee for the TPU-first native recipe (96x9 CQT straight
into the backbone) and splits out the CQT frontend share, which at
B>=1024 is no longer negligible (~0.63 ms per 256 segments).

Usage: python tools/profile_native.py [--batches 1024,2048,4096]
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


def time_scan(fn, carry, steps):
    """Warm + timed run of fn scanned `steps` times; full-output barrier."""
    out, bar = fn(carry)
    float(bar)
    t0 = time.perf_counter()
    out, bar = fn(carry)
    float(bar)
    return 1e3 * (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="512,1024,2048,4096")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cqt-only", action="store_true")
    p.add_argument("--mode", default=None,
                   choices=["full", "cqt", "model", "fwd", "pipelined"],
                   help="full = CQT+model in-step (default); cqt / model "
                        "= that piece alone; pipelined = CQT for batch "
                        "i+1 issued alongside the model step on batch i "
                        "(cross-step overlap probe, VERDICT r2 #3)")
    p.add_argument("--cqt-precision", default="highest",
                   choices=["highest", "bf16x3", "default"])
    p.add_argument("--gemm-split", default="auto",
                   choices=["auto", "off"],
                   help="zero-support split CQT kernel (cqt_fused_split)")
    p.add_argument("--cqt-block", type=int, default=None,
                   help="override CQTConfig.batch_block (Pallas grid rows)")
    p.add_argument("--w1-conv", default="dense",
                   choices=["dense", "slim", "gemm", "full"],
                   help="width-1 conv contraction (ModelConfig.w1_conv): "
                        "'slim' drops the structurally-zero 3x3 side "
                        "columns on the 6x1/3x1 tail stages")
    args = p.parse_args()
    if args.cqt_only:
        args.mode = "cqt"
    if args.mode is None:
        args.mode = "full"

    import dataclasses

    cqt_cfg = dataclasses.replace(
        CQTConfig(), precision=args.cqt_precision,
        gemm_split=args.gemm_split, batch_block=args.cqt_block,
    )
    frontend = CQTFrontend(cqt_cfg)
    model_cfg = ModelConfig(arch="resnet18_native", w1_conv=args.w1_conv)
    model = build_model(model_cfg)
    preprocess = make_preprocess(model_cfg)
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()}", flush=True)

    for b in [int(x) for x in args.batches.split(",")]:
        audio = jnp.asarray(
            rng.standard_normal((b, cqt_cfg.window_samples), dtype=np.float32)
        )
        labels = jnp.asarray(rng.integers(0, 19, (b, 6)), dtype=jnp.int32)

        if args.mode == "cqt":
            @jax.jit
            def run_cqt(a):
                def body(c, _):
                    f = frontend(a + c)
                    return jnp.sum(f) * 1e-9, None

                c, _ = jax.lax.scan(
                    body, jnp.zeros(()), None, length=args.steps
                )
                return None, c

            ms = time_scan(run_cqt, audio, args.steps)
            print(f"B={b:<5d} CQT only      {ms:8.2f} ms "
                  f"({b / (ms / 1e3):,.0f} segments/s)", flush=True)
            continue

        if args.mode == "model":
            feats0 = jax.jit(frontend)(audio)
            state = create_train_state(
                model, OptimConfig(), jax.random.PRNGKey(0),
                preprocess(feats0[:1]),
            )
            step_feats = make_train_step(model, preprocess, smoothing=0.05)

            @jax.jit
            def run_model(s):
                def body(carry, _):
                    s, eps = carry
                    new_s, metrics = step_feats(
                        s, {"features": feats0 + eps, "labels": labels},
                        jax.random.PRNGKey(0), 5e-4,
                    )
                    return (new_s, metrics["loss"] * 1e-24), None

                (out, _), _ = jax.lax.scan(
                    body, (s, jnp.zeros(())), None, length=args.steps
                )
                leaf = jax.tree_util.tree_leaves(out.params)[0]
                return out, jnp.sum(leaf.astype(jnp.float32))

            ms = time_scan(run_model, state, args.steps)
            print(f"B={b:<5d} model only    {ms:8.2f} ms "
                  f"({b / (ms / 1e3):,.0f} segments/s)", flush=True)
            continue

        if args.mode == "fwd":
            # forward + loss only (train=False): bounds the inference
            # side and splits the model step into fwd vs bwd+optimizer
            from guitar_tablature_classification_tpu.ops import (
                label_smoothing_loss,
            )

            feats0 = jax.jit(frontend)(audio)
            variables = model.init(
                jax.random.PRNGKey(0), preprocess(feats0[:1]), train=False
            )

            @jax.jit
            def run_fwd(v):
                def body(c, _):
                    logits = model.apply(
                        v, preprocess(feats0 + c), train=False
                    )
                    loss = label_smoothing_loss(logits, labels, 0.05)
                    return loss * 1e-24, None

                c, _ = jax.lax.scan(
                    body, jnp.zeros(()), None, length=args.steps
                )
                return None, c

            ms = time_scan(run_fwd, variables, args.steps)
            print(f"B={b:<5d} fwd+loss only {ms:8.2f} ms "
                  f"({b / (ms / 1e3):,.0f} segments/s)", flush=True)
            continue

        if args.mode == "pipelined":
            # software pipeline: step i trains on features produced in
            # step i-1 while issuing the frontend for batch i+1 — the
            # CQT result crosses the scan carry, so the model GEMMs and
            # the frontend GEMM of the SAME iteration are independent
            # and the scheduler is free to interleave them.
            feats0 = jax.jit(frontend)(audio)
            state = create_train_state(
                model, OptimConfig(), jax.random.PRNGKey(0),
                preprocess(feats0[:1]),
            )
            step_feats = make_train_step(model, preprocess, smoothing=0.05)

            @jax.jit
            def run_pipe(s):
                def body(carry, _):
                    s, feats, eps = carry
                    next_feats = frontend(audio + eps)  # batch i+1's CQT
                    new_s, metrics = step_feats(
                        s, {"features": feats, "labels": labels},
                        jax.random.PRNGKey(0), 5e-4,
                    )
                    return (new_s, next_feats, metrics["loss"] * 1e-24), None

                (out, _, _), _ = jax.lax.scan(
                    body, (s, feats0, jnp.zeros(())), None,
                    length=args.steps,
                )
                leaf = jax.tree_util.tree_leaves(out.params)[0]
                return out, jnp.sum(leaf.astype(jnp.float32))

            ms = time_scan(run_pipe, state, args.steps)
            print(f"B={b:<5d} pipelined     {ms:8.2f} ms "
                  f"({b / (ms / 1e3):,.0f} segments/s)", flush=True)
            continue

        state = create_train_state(
            model, OptimConfig(), jax.random.PRNGKey(0),
            jax.jit(lambda a: preprocess(frontend(a)))(audio[:1]),
        )
        train_step = make_train_step(
            model, preprocess, smoothing=0.05, frontend=frontend
        )

        # audio/labels as jit ARGUMENTS: closure-captured device arrays
        # embed in the HLO as constants, and big batches (B=8192 audio is
        # ~290 MB) exceed the axon remote-compile request limit (HTTP 413).
        @jax.jit
        def run(s, audio, labels):
            # Feed the previous loss (x 1e-24, numerically a no-op) back
            # into the audio: without this data dependence XLA hoists
            # the loop-invariant CQT+preprocess OUT of the scan and the
            # "full step" excludes the frontend entirely (measured: the
            # hoisted step timed FASTER than the CQT alone).
            def body(carry, _):
                s, eps = carry
                new_s, metrics = train_step(
                    s, {"audio": audio + eps, "labels": labels},
                    jax.random.PRNGKey(0), 5e-4,
                )
                return (new_s, metrics["loss"] * 1e-24), None

            (out, _), _ = jax.lax.scan(
                body, (s, jnp.zeros(())), None, length=args.steps
            )
            leaf = jax.tree_util.tree_leaves(out.params)[0]
            return out, jnp.sum(leaf.astype(jnp.float32))

        try:
            ms = time_scan(
                lambda s: run(s, audio, labels), state, args.steps
            )
            print(f"B={b:<5d} full step     {ms:8.2f} ms "
                  f"({b / (ms / 1e3):,.0f} segments/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B={b} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
