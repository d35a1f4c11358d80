"""Probe: fused attention kernel isolated timings (fwd / fwd+bwd).

ViT-S/8 shapes: B=64, N=785, H=6, Dh=64.  Ideal bf16 MXU time for one
forward call is ~0.1 ms (5 GF); anything much above that is VPU
(softmax transcendentals, per-head slicing) or grid overhead.

Usage: python tools/probe_attn.py
"""

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

from guitar_tablature_classification_tpu.ops.attention_pallas import (
    fused_attention,
)

STEPS = 50


def timed(fn, args, label, flops):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            s = sum(
                jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)
            )
            return s * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=STEPS)
        return c

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    ms = 1e3 * (time.perf_counter() - t0) / STEPS
    print(f"{label:<46s} {ms:8.3f} ms  {flops / (ms / 1e3) / 1e12:6.1f} TF/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    b, n, h, dh = 64, 785, 6, 64
    print(f"device: {jax.devices()}", flush=True)
    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        q = jnp.asarray(rng.standard_normal((b, n, h, dh)), dtype)
        k = jnp.asarray(rng.standard_normal((b, n, h, dh)), dtype)
        v = jnp.asarray(rng.standard_normal((b, n, h, dh)), dtype)
        fwd_flops = 4 * b * h * n * n * dh

        for qt in (128, 256, 448, 896):
            timed(
                lambda q, k, v, qt=qt: fused_attention(q, k, v, qt),
                (q, k, v), f"{tag} fwd q_tile={qt}", fwd_flops,
            )

        for qt in (128, 448, 896):
            def fwd_bwd(q, k, v, qt=qt):
                return jax.grad(
                    lambda q, k, v: jnp.sum(
                        fused_attention(q, k, v, qt).astype(jnp.float32)
                    ),
                    argnums=(0, 1, 2),
                )(q, k, v)

            timed(fwd_bwd, (q, k, v), f"{tag} fwd+bwd q_tile={qt}",
                  3 * fwd_flops)

        want = jax.nn.dot_product_attention(q, k, v)
        timed(
            lambda q, k, v: jax.nn.dot_product_attention(q, k, v),
            (q, k, v), f"{tag} XLA dot_product_attention fwd", fwd_flops,
        )


if __name__ == "__main__":
    main()
