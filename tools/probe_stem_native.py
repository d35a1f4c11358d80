"""A/B probe: native-geometry fused stem (ops/stem_native.py) — round 4.

The round-4 per-stage attribution (DESIGN.md) bounded the native stem at
5.43 ms of the 31.04 ms B=8192 full step (22 %), of which ~3.2 ms is the
fusible BN/ReLU/pool tail -> a best case of ~+8 % end-to-end.  This
probe measures the shipped candidate at native shapes, same-session:

  - stem-only stack (ResNet18 stage_sizes=()): unfused vs fused,
    both lane-pad variants (w_pad=1 -> 384 lanes, w_pad=0 -> 320);
  - full resnet18_native model (heads, no CQT): same three variants.

Timing: N steps inside one lax.scan, carry-fed input perturbation
(loss*1e-24) so nothing hoists, full-output barrier (sum over a param
leaf after the final step) — the house anti-DCE/anti-hoist harness.

Usage: python tools/probe_stem_native.py [--batch 8192] [--steps 20]
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

from guitar_tablature_classification_tpu.models.resnet import ResNet18
from guitar_tablature_classification_tpu.models.tabnet import GuitarTabNet


def time_stack(name, model_like, x, steps):
    """fwd+bwd+Adam, chained scan, full-output barrier (see module doc)."""
    variables = model_like.init(jax.random.PRNGKey(0), x[:8], train=False)
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

    t0 = time.perf_counter()
    float(run(params, stats, opt_state, x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(params, stats, opt_state, x))
    ms = 1e3 * (time.perf_counter() - t0) / steps
    b = x.shape[0]
    print(
        f"{name:<28s} {ms:8.2f} ms/step  {b / (ms / 1e3):>10,.0f} seg/s"
        f"   (compile {compile_s:.0f}s)",
        flush=True,
    )
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--skip-stem-only", action="store_true")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(0, 1, (args.batch, 96, 9, 1)).astype(np.float32)
    )
    print(f"device: {jax.devices()}  B={args.batch}", flush=True)

    variants = [
        ("unfused", dict(fused_native_stem=False)),
        ("fused wpad=1 (384L)", dict(fused_native_stem=True,
                                     native_stem_pad=1)),
        ("fused wpad=0 (320L)", dict(fused_native_stem=True,
                                     native_stem_pad=0)),
    ]

    if not args.skip_stem_only:
        for name, kw in variants:
            try:
                time_stack(
                    f"stem-only {name}",
                    ResNet18(num_features=None, input_channels=1,
                             stage_sizes=(), **kw),
                    x, args.steps,
                )
            except Exception as e:  # Mosaic layout rejections possible
                print(f"stem-only {name:<17s} FAILED: {e}", flush=True)

    for name, kw in variants:
        try:
            time_stack(
                f"full model {name}",
                GuitarTabNet(input_channels=1, **kw),
                x, args.steps,
            )
        except Exception as e:
            print(f"full model {name:<17s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
