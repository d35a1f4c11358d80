"""Piecewise hardware timing of the flagship train step.

The axon tunnel doesn't expose device-side profiler traces, so this
breaks the 224^2 ResNet18 recipe into separately-jitted pieces and times
each inside one lax.scan (same methodology as bench.py: warmup scan of
identical length, clock stopped by a device->host scalar fetch).

Usage: python tools/profile_step.py [--batch 256] [--steps 20]
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
from flax import linen as nn

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


def timed_scan(fn, carry, steps, label, items=None):
    """Run `steps` iterations of fn inside one jitted scan; return ms/step."""

    @jax.jit
    def run(c):
        out = jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=steps)[0]
        # single completion scalar: summing one leaf makes the fetch depend
        # on the whole scan without a per-leaf tunnel round trip each
        leaf = jax.tree_util.tree_leaves(out)[0]
        return out, jnp.sum(leaf.astype(jnp.float32))

    out, bar = run(carry)  # warmup & compile (same scan length)
    float(bar)
    t0 = time.perf_counter()
    out, bar = run(carry)
    float(bar)
    ms = 1e3 * (time.perf_counter() - t0) / steps
    extra = f"  ({items / (ms / 1e3):,.0f} items/s)" if items else ""
    print(f"{label:<44s} {ms:8.2f} ms/step{extra}", flush=True)
    return ms


class Stem(nn.Module):
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=True):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()
    b = args.batch

    cqt_cfg = CQTConfig()
    model_cfg = ModelConfig(arch="resnet18")
    frontend = CQTFrontend(cqt_cfg)
    model = build_model(model_cfg)
    preprocess = make_preprocess(model_cfg, image_size=224)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((b, cqt_cfg.window_samples), dtype=np.float32)
    )
    labels = jnp.asarray(rng.integers(0, 19, (b, 6)), dtype=jnp.int32)
    images = jax.jit(lambda a: preprocess(frontend(a)))(audio)
    images = jax.block_until_ready(images)
    print(f"batch={b} images={images.shape} {images.dtype}", flush=True)

    # 1. frontend + preprocess
    def pp(a):
        im = preprocess(frontend(a))
        return a + jnp.mean(im).astype(a.dtype)  # keep scan carry = audio
    timed_scan(pp, audio, args.steps, "cqt+preprocess", items=b)

    # 2. model forward (train mode, batch stats mutable)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)

    def fwd(im):
        out, _ = model.apply(
            variables, im, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return im + jnp.mean(out).astype(im.dtype)
    timed_scan(fwd, images, args.steps, "model fwd (train)", items=b)

    # 3. fwd + bwd
    def loss_fn(params, im):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            im, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def fwdbwd(params):
        _, grads = jax.value_and_grad(loss_fn)(params, images)
        return jax.tree.map(lambda p, g: p - 0.0 * g, params, grads)
    timed_scan(fwdbwd, variables["params"], args.steps, "model fwd+bwd", items=b)

    # 4. full train step
    state = create_train_state(
        model, OptimConfig(), jax.random.PRNGKey(0), images[:1]
    )
    train_step = make_train_step(
        model, preprocess, smoothing=0.05, frontend=frontend
    )

    def full(s):
        new_s, _ = train_step(s, {"audio": audio, "labels": labels},
                              jax.random.PRNGKey(0), 5e-4)
        return new_s
    timed_scan(full, state, args.steps, "FULL train step", items=b)

    # 5. stem only (conv1 7x7/2 + BN + relu + maxpool) fwd+bwd
    stem = Stem()
    stem_vars = stem.init(jax.random.PRNGKey(0), images[:1])

    def stem_loss(params, im):
        out, _ = stem.apply(
            {"params": params, "batch_stats": stem_vars["batch_stats"]},
            im, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def stem_fwdbwd(params):
        _, grads = jax.value_and_grad(stem_loss)(params, images)
        return jax.tree.map(lambda p, g: p - 0.0 * g, params, grads)
    timed_scan(stem_fwdbwd, stem_vars["params"], args.steps,
               "stem only fwd+bwd", items=b)

    # 6. trunk only (layers 1-4 + pool + fc) fwd+bwd on stem output
    stem_out = jax.jit(
        lambda im: stem.apply(stem_vars, im, train=False)
    )(images)
    stem_out = jax.block_until_ready(stem_out)
    # stage blocks only (the full model minus its stem):
    from guitar_tablature_classification_tpu.models.resnet import BasicBlock

    class Trunk(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            for stage, blocks in enumerate((2, 2, 2, 2)):
                filters = 64 * 2**stage
                for blk in range(blocks):
                    strides = 2 if stage > 0 and blk == 0 else 1
                    x = BasicBlock(filters, strides,
                                   name=f"layer{stage+1}_{blk}")(x, train)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(256, dtype=jnp.bfloat16, name="fc")(x)

    trunk = Trunk()
    trunk_vars = trunk.init(jax.random.PRNGKey(0), stem_out[:1])

    def trunk_loss(params, xin):
        out, _ = trunk.apply(
            {"params": params, "batch_stats": trunk_vars["batch_stats"]},
            xin, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def trunk_fwdbwd(params):
        _, grads = jax.value_and_grad(trunk_loss)(params, stem_out)
        return jax.tree.map(lambda p, g: p - 0.0 * g, params, grads)
    timed_scan(trunk_fwdbwd, trunk_vars["params"], args.steps,
               "trunk only fwd+bwd (56x56x64 in)", items=b)


if __name__ == "__main__":
    main()
