"""Same-session A/B: bench.py's native harness vs the round-4c probe harness.

Round-4 VERDICT Weak #1: `BENCH_r04.json` recorded the native
default-tier full step at 249.5k seg/s (B=4096) while DESIGN.md's
round-4c table claims 265.8k for the same configuration — a 6.1 % gap,
outside the stated ~5 % cross-day tunnel band.  The two measurements
differ in exactly one structural way:

- bench.py (`measure_native_variant`) rotates **4 distinct device
  batches** through the scan via ``audio[i % 4]`` dynamic indexing
  (the skeptic-proof anti-hoisting harness shared with the flagship
  loop);
- the round-4c probes (tools/profile_native.py, probe_w1_gemm.py) feed
  **one batch with a carry perturbation** (``audio + prev_loss*1e-24``)
  — same anti-hoisting guarantee, no per-step dynamic slice of a
  ~580 MB array.

This probe times BOTH harnesses in one process at B=4096 and B=8192
(default CQT tier), so the 249.5k-vs-265.8k question resolves into
either (a) harness cost — the rotation's dynamic slice is real HBM
traffic the carry trick avoids, or (b) cross-day variance.  The serving
ladder headline (528.6k at B=4096, default tier) is re-measured too so
bench.py's new serving row has a same-session anchor.

Usage: python tools/probe_bench_ab.py [--steps 20]
(Measured result recorded in DESIGN.md round 5.)
"""

import argparse
import os
import sys
import time
from functools import partial

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
from guitar_tablature_classification_tpu.models import build_model
from guitar_tablature_classification_tpu.ops import CQTFrontend
from guitar_tablature_classification_tpu.train import (
    create_train_state,
    make_preprocess,
    make_train_step,
)


def build(batch, precision="default"):
    cqt_cfg = dataclasses.replace(CQTConfig(), precision=precision)
    model_cfg = ModelConfig(arch="resnet18_native")
    frontend = CQTFrontend(cqt_cfg)
    model = build_model(model_cfg)
    preprocess = make_preprocess(model_cfg)
    sample = jnp.zeros((1, cqt_cfg.n_bins, cqt_cfg.n_frames))
    state = create_train_state(
        model, OptimConfig(), jax.random.PRNGKey(0), preprocess(sample)
    )
    train_step = make_train_step(
        model, preprocess, smoothing=0.05, frontend=frontend
    )
    rng = np.random.default_rng(1)
    audio4 = jnp.asarray(
        rng.standard_normal((4, batch, cqt_cfg.window_samples)).astype(
            np.float32
        )
    )
    labels4 = jnp.asarray(
        rng.integers(0, 19, (4, batch, 6)), dtype=jnp.int32
    )
    return state, train_step, audio4, labels4


def time_rotation(state, train_step, audio4, labels4, steps):
    """bench.py's harness: 4 rotating batches, dynamic index, losses[-1]."""

    @partial(jax.jit, static_argnums=(3,))
    def run(state, audio, labels, steps):
        def one_step(state, i):
            batch = {"audio": audio[i % 4], "labels": labels[i % 4]}
            new_state, metrics = train_step(
                state, batch, jax.random.PRNGKey(0), 5e-4
            )
            return new_state, metrics["loss"]

        return jax.lax.scan(one_step, state, jnp.arange(steps))

    s, warm = run(state, audio4, labels4, steps)
    float(warm[-1])
    t0 = time.perf_counter()
    s, losses = run(state, audio4, labels4, steps)
    float(losses[-1])
    return 1e3 * (time.perf_counter() - t0) / steps


def time_carry(state, train_step, audio4, labels4, steps):
    """profile_native.py's harness: one batch + carry perturbation,
    full-param-leaf barrier."""
    audio, labels = audio4[0], labels4[0]

    @partial(jax.jit, static_argnums=(3,))
    def run(s, audio, labels, steps):
        def body(carry, _):
            s, eps = carry
            new_s, metrics = train_step(
                s, {"audio": audio + eps, "labels": labels},
                jax.random.PRNGKey(0), 5e-4,
            )
            return (new_s, metrics["loss"] * 1e-24), None

        (out, _), _ = jax.lax.scan(
            body, (s, jnp.zeros(())), None, length=steps
        )
        leaf = jax.tree_util.tree_leaves(out.params)[0]
        return out, jnp.sum(leaf.astype(jnp.float32))

    out, bar = run(state, audio, labels, steps)
    float(bar)
    t0 = time.perf_counter()
    out, bar = run(state, audio, labels, steps)
    float(bar)
    return 1e3 * (time.perf_counter() - t0) / steps


def time_serving(batch, steps):
    """The serving-ladder headline config (tools/bench_serve.py native
    default tier): forward-only, 2 rotating batches."""
    cqt_cfg = dataclasses.replace(CQTConfig(), precision="default")
    model_cfg = ModelConfig(arch="resnet18_native")
    frontend = CQTFrontend(cqt_cfg)
    model = build_model(model_cfg)
    preprocess = make_preprocess(model_cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        preprocess(jnp.zeros((1, cqt_cfg.n_bins, cqt_cfg.n_frames))),
        train=False,
    )
    rng = np.random.default_rng(2)
    audio = jnp.asarray(
        rng.standard_normal((2, batch, cqt_cfg.window_samples)).astype(
            np.float32
        )
    )

    @partial(jax.jit, static_argnums=(2,))
    def serve(variables, audio, steps):
        def body(acc, i):
            logits = model.apply(
                variables, preprocess(frontend(audio[i % 2])), train=False
            )
            return acc + jnp.argmax(logits, -1).sum(), None

        out, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.int32), jnp.arange(steps)
        )
        return out

    int(serve(variables, audio, steps))
    t0 = time.perf_counter()
    int(serve(variables, audio, steps))
    return 1e3 * (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()
    print(f"device: {jax.devices()}", flush=True)

    for batch in (4096, 8192):
        state, train_step, audio4, labels4 = build(batch)
        ms_rot = time_rotation(state, train_step, audio4, labels4, args.steps)
        print(
            f"B={batch:<6d} rotation(bench.py)  {ms_rot:8.2f} ms/step  "
            f"{batch / (ms_rot / 1e3):>10,.0f} seg/s",
            flush=True,
        )
        ms_car = time_carry(state, train_step, audio4, labels4, args.steps)
        print(
            f"B={batch:<6d} carry(profile)      {ms_car:8.2f} ms/step  "
            f"{batch / (ms_car / 1e3):>10,.0f} seg/s   "
            f"(rotation/carry = {ms_rot / ms_car:.3f})",
            flush=True,
        )

    ms_serve = time_serving(4096, args.steps)
    print(
        f"B=4096  serving default     {ms_serve:8.2f} ms/batch  "
        f"{4096 / (ms_serve / 1e3):>10,.0f} windows/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
