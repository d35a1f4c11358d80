"""A/B probe: width-1 convs as batch-major GEMMs (round 4c).

The round-4 per-stage attribution (DESIGN.md) left layer4 (3x1 maps,
512ch — 4.92 ms, 20 % of the B=8192 model step) explained as "small-M
GEMM + Adam": XLA's conv tiling pads the 3-6-row feature maps onto
8-sublane registers, wasting 25-62 % of the MXU rows.  The round-3
VERDICT's unprobed lever (b) is batch-major packing.  Conv3x3
``mode="gemm"`` (models/resnet.py) computes the identical width-1
center-column contraction as one explicit row-stacked GEMM
``[B*h_out, 3C] @ [3C, F]`` whose M dimension is batch-major and always
fills sublanes.  This probe measures it same-session:

  - full resnet18_native model (heads, no CQT): w1_conv slim vs gemm;
  - (--stack) isolated layer4 stack ([B,6,1,256] -> 2 BasicBlocks
    filters=512, the exact native tail): slim vs gemm.

Timing: N steps inside one lax.scan, carry-fed input perturbation
(loss*1e-24) so nothing hoists, full-output barrier (sum over a param
leaf after the final step) — the house anti-DCE/anti-hoist harness.

Usage: python tools/probe_w1_gemm.py [--batch 8192] [--steps 20] [--stack]
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

from guitar_tablature_classification_tpu.models.resnet import BasicBlock
from guitar_tablature_classification_tpu.models.tabnet import GuitarTabNet


class Layer4Stack(nn.Module):
    """The native trunk's layer4 in isolation: [B, 6, 1, 256] ->
    BasicBlock(512, s2) -> BasicBlock(512, s1) (resnet18_native tail)."""

    w1_conv: str = "slim"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicBlock(512, 2, w1_conv=self.w1_conv, name="layer4_0")(
            x, train
        )
        x = BasicBlock(512, 1, w1_conv=self.w1_conv, name="layer4_1")(
            x, train
        )
        return x


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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--stack", action="store_true",
                   help="also time the isolated layer4 stack")
    p.add_argument("--skip-model", action="store_true")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()}  B={args.batch}", flush=True)

    if args.stack:
        x4 = jnp.asarray(
            rng.uniform(0, 1, (args.batch, 6, 1, 256)).astype(np.float32)
        ).astype(jnp.bfloat16)
        for mode in ("slim", "gemm", "dense"):
            time_stack(f"layer4 stack {mode}", Layer4Stack(w1_conv=mode),
                       x4, args.steps)

    if not args.skip_model:
        x = jnp.asarray(
            rng.uniform(0, 1, (args.batch, 96, 9, 1)).astype(np.float32)
        )
        for mode in ("slim", "gemm", "dense"):
            time_stack(
                f"full model w1={mode}",
                GuitarTabNet(input_channels=1, w1_conv=mode),
                x, args.steps,
            )


if __name__ == "__main__":
    main()
