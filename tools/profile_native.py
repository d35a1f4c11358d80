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
    p.add_argument("--cqt-precision", default="highest",
                   choices=["highest", "bf16x3", "default"])
    args = p.parse_args()

    import dataclasses

    cqt_cfg = dataclasses.replace(
        CQTConfig(), precision=args.cqt_precision
    )
    frontend = CQTFrontend(cqt_cfg)
    model_cfg = ModelConfig(arch="resnet18_native")
    model = build_model(model_cfg)
    preprocess = make_preprocess(model_cfg)
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()}", flush=True)

    for b in [int(x) for x in args.batches.split(",")]:
        audio = jnp.asarray(
            rng.standard_normal((b, cqt_cfg.window_samples), dtype=np.float32)
        )
        labels = jnp.asarray(rng.integers(0, 19, (b, 6)), dtype=jnp.int32)

        if args.cqt_only:
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

        state = create_train_state(
            model, OptimConfig(), jax.random.PRNGKey(0),
            jax.jit(lambda a: preprocess(frontend(a)))(audio[:1]),
        )
        train_step = make_train_step(
            model, preprocess, smoothing=0.05, frontend=frontend
        )

        @jax.jit
        def run(s):
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
            ms = time_scan(run, state, args.steps)
            print(f"B={b:<5d} full step     {ms:8.2f} ms "
                  f"({b / (ms / 1e3):,.0f} segments/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B={b} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
