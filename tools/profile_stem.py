"""Hardware benchmark + parity check for the fused Pallas stem.

Compares the flagship ResNet18 stem (conv1+BN+ReLU+maxpool, fwd+bwd)
and the FULL train step across stem_fusion = off | fused, and checks
numerical parity of logits on the real chip.

Usage: python tools/profile_stem.py [--full] [--parity]
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

from guitar_tablature_classification_tpu.config import ModelConfig, OptimConfig
from guitar_tablature_classification_tpu.models import build_model
from guitar_tablature_classification_tpu.train import (
    create_train_state,
    make_preprocess,
    make_train_step,
)

STEPS = 20


def timed(fn, args, label, batch):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(c, *a)
            return out, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=STEPS)
        return c

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    ms = 1e3 * (time.perf_counter() - t0) / STEPS
    print(f"{label:<52s} {ms:8.2f} ms/step  ({batch / ms * 1e3:,.0f} items/s)",
          flush=True)
    return ms


def stem_only(mode: str, batch: int):
    """fwd+bwd through just the stem (conv1 -> pooled [B,56,56,64])."""
    from flax import linen as nn

    from guitar_tablature_classification_tpu.models.resnet import (
        ResNet18,
        _QuadrantBNReLUPool,
    )

    cfg = ModelConfig(arch="resnet18", dtype="bfloat16", stem_fusion=mode)
    rng = np.random.default_rng(0)

    class StemOnly(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            net = ResNet18(
                fused_front=224 if mode != "off" else None,
                fused_tail=mode == "fused",
                stage_sizes=(),
                num_features=None,
                name="resnet",
            )
            return net(x, train=train)

    pre = make_preprocess(cfg, image_size=224)
    feats = jnp.asarray(rng.uniform(-80, 0, (batch, 96, 9)), jnp.float32)
    x = jax.block_until_ready(jax.jit(pre)(feats))
    model = StemOnly()
    variables = model.init(jax.random.PRNGKey(0), x[:2], train=False)

    def step(c, params, batch_stats, x):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x + c.astype(x.dtype), train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

        l, g = jax.value_and_grad(loss_fn)(params)
        leaves = jax.tree.leaves(g)
        # reduce over the FULL gradients (1e-12 scale, NOT zero — a zero
        # factor would let XLA dead-code-eliminate the whole backward)
        gsum = sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in leaves)
        return l + gsum * 1e-12

    timed(
        lambda c, p, b, xx: step(c, p, b, xx),
        (variables["params"], variables["batch_stats"], x),
        f"stem only fwd+bwd [{mode}]",
        batch,
    )


def full_step(mode: str, batch: int):
    cfg = ModelConfig(arch="resnet18", dtype="bfloat16", stem_fusion=mode)
    opt = OptimConfig(learning_rate=1e-3)
    rng = np.random.default_rng(0)
    model = build_model(cfg)
    pre = make_preprocess(cfg, image_size=224)
    feats = jnp.asarray(rng.uniform(-80, 0, (batch, 96, 9)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 19, (batch, 6)), jnp.int32)
    x0 = jax.jit(pre)(feats[:2])
    state = create_train_state(model, opt, jax.random.PRNGKey(0), x0)
    train_step = make_train_step(model, pre)

    @jax.jit
    def run(state, feats, labels):
        def body(st, i):
            st, metrics = train_step(
                st, {"features": feats, "labels": labels},
                jax.random.PRNGKey(1), 1e-3,
            )
            return st, metrics["loss"]

        st, losses = jax.lax.scan(body, state, jnp.arange(STEPS))
        return losses[-1]

    float(run(state, feats, labels))
    t0 = time.perf_counter()
    float(run(state, feats, labels))
    ms = 1e3 * (time.perf_counter() - t0) / STEPS
    print(
        f"{'FULL train step [' + mode + ']':<52s} {ms:8.2f} ms/step  "
        f"({batch / ms * 1e3:,.0f} segments/s)",
        flush=True,
    )


def parity(batch: int = 16):
    """Eval logits: fused vs off on hardware."""
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.uniform(-80, 0, (batch, 96, 9)), jnp.float32)
    outs = {}
    for mode in ("off", "fused"):
        cfg = ModelConfig(arch="resnet18", dtype="float32", stem_fusion=mode)
        model = build_model(cfg)
        pre = make_preprocess(cfg, image_size=224)
        x = jax.jit(pre)(feats)
        v = model.init(jax.random.PRNGKey(7), x[:2], train=False)
        outs[mode] = np.asarray(
            jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
        )
    d = np.abs(outs["off"] - outs["fused"]).max()
    s = np.abs(outs["off"]).max()
    print(f"parity (fp32 logits): max abs diff {d:.3e} (scale {s:.3e})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--parity", action="store_true")
    args = ap.parse_args()
    print(f"device: {jax.devices()}", flush=True)
    if args.parity:
        parity()
    for mode in ("off", "fused"):
        stem_only(mode, args.batch)
    if args.full:
        for mode in ("off", "fused"):
            full_step(mode, args.batch)
