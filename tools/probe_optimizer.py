"""Probe: optimizer tax of the native model step (round 4c).

The round-4 per-stage attribution (DESIGN.md) left ~20 % of the B=8192
native model step attributed to "layer4 small-M GEMM + Adam" — but the
isolated layer4 stack measures AT the conv ceiling (probe_w1_gemm.py),
so the residual must be the optimizer + per-leaf update scheduling.
This probe decomposes it same-session on the full resnet18_native
model (no CQT), fwd+bwd held constant:

  - sgd-inline : params -= 1e-6 * grads (pure fused elementwise; the
                 floor — what fwd+bwd costs with a near-free update)
  - adam-optax : optax.adam(1e-3) per-leaf chain (the shipped default)
  - adam-flat  : the same Adam math over ONE flattened f32 buffer per
                 (params, m, v) — all ~62 leaves ravel'd into a single
                 elementwise pass (leaf views are reshaped back out for
                 the model apply), isolating per-leaf kernel-launch
                 overhead from the arithmetic.

Timing: N steps inside one lax.scan, carry-fed input perturbation
(loss*1e-24), full-output barrier — the house anti-DCE/anti-hoist
harness.

Usage: python tools/probe_optimizer.py [--batch 8192] [--steps 20]
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

from guitar_tablature_classification_tpu.models.tabnet import GuitarTabNet


def make_loss(model):
    def loss_fn(p, s, xin):
        out, mutated = model.apply(
            {"params": p, "batch_stats": s}, xin, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        if isinstance(out, (tuple, list)):
            out = jnp.stack(out)
        return jnp.mean(out.astype(jnp.float32)), mutated["batch_stats"]

    return loss_fn


def timed(name, run, *args, steps):
    t0 = time.perf_counter()
    float(run(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(*args))
    ms = 1e3 * (time.perf_counter() - t0) / steps
    print(f"{name:<18s} {ms:8.2f} ms/step   (compile {compile_s:.0f}s)",
          flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()
    steps = args.steps

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(0, 1, (args.batch, 96, 9, 1)).astype(np.float32)
    )
    print(f"device: {jax.devices()}  B={args.batch}", flush=True)

    model = GuitarTabNet(input_channels=1)
    variables = model.init(jax.random.PRNGKey(0), x[:8], train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})
    loss_fn = make_loss(model)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"{n_leaves} param leaves, {n_params / 1e6:.1f} M params",
          flush=True)

    # --- sgd-inline -------------------------------------------------
    @jax.jit
    def run_sgd(params, stats, x):
        def body(carry, _):
            params, stats, eps = carry
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats, x + eps)
            params = jax.tree.map(lambda p, g: p - 1e-6 * g, params, grads)
            return (params, new_stats, loss * 1e-24), None

        (params, stats, _), _ = jax.lax.scan(
            body, (params, stats, jnp.zeros(())), None, length=steps
        )
        leaf = jax.tree_util.tree_leaves(params)[0]
        return jnp.sum(leaf.astype(jnp.float32))

    timed("sgd-inline", run_sgd, params, stats, x, steps=steps)

    # --- adam-optax (shipped default) -------------------------------
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def run_adam(params, stats, opt_state, x):
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

    timed("adam-optax", run_adam, params, stats, opt_state, x, steps=steps)

    # --- adam-flat: one elementwise pass over a single ravel'd buffer
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [l.shape for l in leaves]
    sizes = [l.size for l in leaves]
    offsets = np.concatenate([[0], np.cumsum(sizes)])

    def pack(tree):
        return jnp.concatenate(
            [l.astype(jnp.float32).ravel()
             for l in jax.tree_util.tree_leaves(tree)]
        )

    def unpack(flat):
        return jax.tree_util.tree_unflatten(
            treedef,
            [
                jax.lax.dynamic_slice_in_dim(
                    flat, int(offsets[i]), int(sizes[i])
                ).reshape(shapes[i])
                for i in range(len(sizes))
            ],
        )

    flat0 = pack(params)
    m0 = jnp.zeros_like(flat0)
    v0 = jnp.zeros_like(flat0)

    @jax.jit
    def run_flat(flat, m, v, stats, x):
        def body(carry, t):
            flat, m, v, stats, eps = carry
            params = unpack(flat)
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats, x + eps)
            g = pack(grads)
            b1, b2, lr, e = 0.9, 0.999, 1e-3, 1e-8
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            tc = t.astype(jnp.float32) + 1.0
            mh = m / (1 - b1**tc)
            vh = v / (1 - b2**tc)
            flat = flat - lr * mh / (jnp.sqrt(vh) + e)
            return (flat, m, v, new_stats, loss * 1e-24), None

        (flat, m, v, stats, _), _ = jax.lax.scan(
            body, (flat, m, v, stats, jnp.zeros(())), jnp.arange(steps)
        )
        return jnp.sum(flat)

    timed("adam-flat", run_flat, flat0, m0, v0, stats, x, steps=steps)


if __name__ == "__main__":
    main()
