"""Attribute the native model step's time to trunk stages (round-4 study).

Times fwd+bwd+Adam of progressively truncated ResNet18 stacks on the
raw 96x9 input — stem only, +layer1, +layer2, +layer3, +layer4, full
model with heads — so stage costs fall out by differencing.  Guides
whether a fused Pallas tail block (VERDICT r3 #1c) can matter: if the
6x1/3x1 tail stages are a small share of the step, it cannot.

Usage: python tools/profile_native_pieces.py [--batch 8192] [--steps 20]
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
import optax
from flax import linen as nn

from guitar_tablature_classification_tpu.models.resnet import ResNet18
from guitar_tablature_classification_tpu.models import build_model
from guitar_tablature_classification_tpu.config import ModelConfig, OptimConfig
from guitar_tablature_classification_tpu.train import (
    create_train_state,
    make_preprocess,
    make_train_step,
)


def time_stack(name, model_like, x, steps, is_full=False, labels=None):
    """fwd+bwd+Adam of a truncated trunk (scalar loss = mean of output)."""
    variables = model_like.init(jax.random.PRNGKey(0), x[:1], train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, s, xin):
        out, mutated = model_like.apply(
            {"params": p, "batch_stats": s}, xin, train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean(out.astype(jnp.float32)), mutated["batch_stats"]

    @jax.jit
    def run(params, stats, opt_state, x):
        def body(carry, _):
            params, stats, opt_state, eps = carry
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats, x + eps)
            updates, new_opt = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, new_opt, loss * 1e-24), None

        (params, stats, opt_state, _), _ = jax.lax.scan(
            body, (params, stats, opt_state, jnp.zeros(())), None,
            length=steps,
        )
        leaf = jax.tree_util.tree_leaves(params)[0]
        return jnp.sum(leaf.astype(jnp.float32))

    float(run(params, stats, opt_state, x))
    t0 = time.perf_counter()
    float(run(params, stats, opt_state, x))
    ms = 1e3 * (time.perf_counter() - t0) / steps
    print(f"{name:<22s} {ms:8.2f} ms/step", flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--w1-conv", default="dense",
                   choices=["dense", "slim", "gemm", "full"])
    args = p.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(0, 1, (args.batch, 96, 9, 1)).astype(np.float32)
    )
    print(f"device: {jax.devices()}  B={args.batch}", flush=True)

    stacks = [
        ("stem only", ()),
        ("stem+layer1", (2,)),
        ("+layer2", (2, 2)),
        ("+layer3", (2, 2, 2)),
        ("+layer4 (trunk)", (2, 2, 2, 2)),
    ]
    prev = 0.0
    for name, stages in stacks:
        trunk = ResNet18(
            num_features=None, input_channels=1, stage_sizes=stages,
            w1_conv=args.w1_conv,
        )
        ms = time_stack(name, trunk, x, args.steps)
        if prev:
            print(f"{'':<22s}   delta {ms - prev:+7.2f} ms", flush=True)
        prev = ms

    # full model through the real train step (heads + loss + optimizer)
    cfg = ModelConfig(arch="resnet18_native",
                      w1_conv=args.w1_conv)
    model = build_model(cfg)
    preprocess = make_preprocess(cfg)
    feats = jnp.asarray(
        rng.uniform(-120, 0, (args.batch, 96, 9)).astype(np.float32)
    )
    labels = jnp.asarray(rng.integers(0, 19, (args.batch, 6)), jnp.int32)
    state = create_train_state(
        model, OptimConfig(), jax.random.PRNGKey(0), preprocess(feats[:1])
    )
    step = make_train_step(model, preprocess, smoothing=0.05)

    @jax.jit
    def run_full(s, feats, labels):
        def body(carry, _):
            s, eps = carry
            new_s, metrics = step(
                s, {"features": feats + eps, "labels": labels},
                jax.random.PRNGKey(0), 5e-4,
            )
            return (new_s, metrics["loss"] * 1e-24), None

        (out, _), _ = jax.lax.scan(
            body, (s, jnp.zeros(())), None, length=args.steps
        )
        leaf = jax.tree_util.tree_leaves(out.params)[0]
        return out, jnp.sum(leaf.astype(jnp.float32))

    out, bar = run_full(state, feats, labels)
    float(bar)
    t0 = time.perf_counter()
    out, bar = run_full(state, feats, labels)
    float(bar)
    ms = 1e3 * (time.perf_counter() - t0) / args.steps
    print(f"{'full model step':<22s} {ms:8.2f} ms/step "
          f"({args.batch / (ms / 1e3):,.0f} seg/s)", flush=True)


if __name__ == "__main__":
    main()
