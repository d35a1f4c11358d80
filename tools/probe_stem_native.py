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
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        if isinstance(out, (tuple, list)):  # GuitarTabNet returns 6 heads
            out = jnp.stack(out)
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


def time_fn(name, fn, params, steps, *data):
    """fwd+bwd chained scan over `fn(params, *data)` -> scalar; carry-fed
    perturbation + full-output barrier (house anti-DCE/anti-hoist)."""
    @jax.jit
    def run(params, *data):
        def body(carry, _):
            params, eps = carry
            loss, grads = jax.value_and_grad(fn)(
                params, *(d + eps.astype(d.dtype) if i == 0 else d
                          for i, d in enumerate(data))
            )
            params = jax.tree.map(lambda p, g: p - 1e-6 * g, params, grads)
            return (params, loss * 1e-24), None

        (params, _), _ = jax.lax.scan(
            body, (params, jnp.zeros(())), None, length=steps
        )
        leaf = jax.tree_util.tree_leaves(params)[0]
        return jnp.sum(leaf.astype(jnp.float32))

    t0 = time.perf_counter()
    float(run(params, *data))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(params, *data))
    ms = 1e3 * (time.perf_counter() - t0) / steps
    print(f"{name:<34s} {ms:8.2f} ms/step   (compile {compile_s:.0f}s)",
          flush=True)
    return ms


def probe_pieces(x, steps):
    """Localize the fused-native-stem cost: conv1 plain vs parity, tail
    Pallas vs XLA twin, each fwd+bwd in isolation."""
    from guitar_tablature_classification_tpu.ops.stem_native import (
        conv1_parity_native,
        native_bn_relu_pool_train,
        stem_geometry,
    )

    rng = np.random.default_rng(1)
    kernel = jnp.asarray(rng.normal(0, 0.1, (7, 7, 1, 64)).astype(np.float32))
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    h2, wy = stem_geometry(h, w)

    def conv_plain(k, xin):
        y = jax.lax.conv_general_dilated(
            xin.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y.astype(jnp.float32))

    def conv_parity(k, xin):
        ye, yo = conv1_parity_native(xin, k, w_pad=1)
        return jnp.sum(ye.astype(jnp.float32)) + jnp.sum(
            yo.astype(jnp.float32))

    time_fn("conv1 plain (no tail)", conv_plain, kernel, steps, x)
    time_fn("conv1 parity (no tail)", conv_parity, kernel, steps, x)

    ye, yo = conv1_parity_native(jnp.asarray(x), kernel, w_pad=1)
    ye = jax.block_until_ready(ye)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)

    for impl in ("pallas", "xla"):
        def tail(p, ye, yo, impl=impl):
            out, _, _ = native_bn_relu_pool_train(
                ye, yo, p["scale"], p["bias"], wreal=wy, impl=impl
            )
            return jnp.sum(out.astype(jnp.float32))

        try:
            time_fn(f"tail {impl} (on parity planes)", tail,
                    {"scale": scale, "bias": bias}, steps, ye, yo)
        except Exception as e:  # no Mosaic on CPU
            print(f"tail {impl} FAILED: {e}", flush=True)

    # Block-size sweep: _pick_bt's 4 MB budget was tuned for the 224²
    # quadrant geometry; at native shapes it yields bt=64 -> 128 grid
    # steps/kernel, and the ~15-20 us fixed per-step cost dominates.
    import guitar_tablature_classification_tpu.ops.stem_native as sn

    def tail_pallas(p, ye, yo):
        out, _, _ = native_bn_relu_pool_train(
            ye, yo, p["scale"], p["bias"], wreal=wy, impl="pallas"
        )
        return jnp.sum(out.astype(jnp.float32))

    orig = sn._pick_bt
    for bt in (128, 256, 512, 1024):
        sn._pick_bt = lambda b, bps, budget, bt=bt: bt if b % bt == 0 \
            else orig(b, bps, budget)
        # the inner pallas wrappers are jitted with bt=None static —
        # clear their trace caches so the patched picker is consulted
        for f in (sn._fwd_pallas, sn._bwd_pallas, sn._stats_pallas):
            f.clear_cache()
        try:
            time_fn(f"tail pallas bt={bt}", tail_pallas,
                    {"scale": scale, "bias": bias}, steps, ye, yo)
        except Exception as e:
            print(f"tail pallas bt={bt} FAILED: {e}", flush=True)
        finally:
            sn._pick_bt = orig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--skip-stem-only", action="store_true")
    p.add_argument("--pieces", action="store_true",
                   help="time conv1 plain/parity + tail pallas/xla "
                        "in isolation instead of whole stacks")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(0, 1, (args.batch, 96, 9, 1)).astype(np.float32)
    )
    print(f"device: {jax.devices()}  B={args.batch}", flush=True)

    if args.pieces:
        probe_pieces(x, args.steps)
        return

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
