"""Probe the v5e int8 MXU path: is a quantized serving recipe worth it?

The v5e datasheet peak is 394 TOP/s int8 vs 197 TF/s bf16.  This probe
measures (a) a large int8 matmul vs its bf16 twin and (b) an int8
convolution at the resnet18_native trunk shapes — if XLA lowers either
at ~2x the bf16 rate, a post-training-quantized serving path could
roughly double the native serving ceiling; if not, the idea is dead on
this backend and we record that with numbers.

Usage: python tools/probe_int8.py [--steps 30]
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
from jax import lax


def time_op(fn, *args, steps):
    """Chained scan timing with a full-output reduction barrier (see
    CLAUDE.md: slice barriers let XLA DCE the compute; loop-invariant
    inputs hoist — we feed the carry back in)."""

    @jax.jit
    def run(*xs):
        def body(c, _):
            # carry-fed inputs (c is ~0 but data-dependent) so the op
            # can't hoist out of the scan — for int8 the cast rounds to
            # exactly 0 yet stays traced
            out = fn(*[x + c.astype(x.dtype) for x in xs])
            return jnp.sum(out.astype(jnp.float32)) * 1e-30, None

        c, _ = lax.scan(body, jnp.zeros(()), None, length=steps)
        return c

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--size", type=int, default=8192)
    args = p.parse_args()
    rng = np.random.default_rng(0)
    n = args.size
    print(f"device: {jax.devices()}", flush=True)

    # (a) big matmul: bf16 vs int8->int32
    a_f = jnp.asarray(rng.standard_normal((n, n), dtype=np.float32),
                      jnp.bfloat16)
    b_f = jnp.asarray(rng.standard_normal((n, n), dtype=np.float32),
                      jnp.bfloat16)
    s = time_op(lambda x, y: jnp.dot(x, y), a_f, b_f, steps=args.steps)
    tf = 2 * n**3 / s / 1e12
    print(f"matmul {n}^3 bf16      {s * 1e3:8.2f} ms  {tf:6.1f} TF/s",
          flush=True)

    a_i = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    b_i = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    try:
        s = time_op(
            lambda x, y: lax.dot(x, y, preferred_element_type=jnp.int32),
            a_i, b_i, steps=args.steps,
        )
        tf = 2 * n**3 / s / 1e12
        print(f"matmul {n}^3 int8->i32 {s * 1e3:8.2f} ms  {tf:6.1f} TOP/s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"matmul int8 FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)

    # (b) conv at a resnet18_native trunk shape (B=2048, 24x3, 64ch)
    for ch, hw in ((64, (24, 3)), (256, (6, 1))):
        x_f = jnp.asarray(
            rng.standard_normal((2048, hw[0], hw[1], ch), dtype=np.float32),
            jnp.bfloat16,
        )
        k_f = jnp.asarray(
            rng.standard_normal((3, 3, ch, ch), dtype=np.float32),
            jnp.bfloat16,
        )
        conv = lambda x, k: lax.conv_general_dilated(  # noqa: E731
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        s = time_op(conv, x_f, k_f, steps=args.steps)
        fl = 2 * 2048 * hw[0] * hw[1] * ch * ch * 9
        print(f"conv3x3 {ch}ch {hw} bf16 {s * 1e3:8.2f} ms "
              f"{fl / s / 1e12:6.1f} TF/s", flush=True)

        x_i = jnp.asarray(rng.integers(-127, 127, x_f.shape), jnp.int8)
        k_i = jnp.asarray(rng.integers(-8, 8, k_f.shape), jnp.int8)
        conv_i = lambda x, k: lax.conv_general_dilated(  # noqa: E731
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        try:
            s = time_op(conv_i, x_i, k_i, steps=args.steps)
            print(f"conv3x3 {ch}ch {hw} int8 {s * 1e3:8.2f} ms "
                  f"{fl / s / 1e12:6.1f} TOP/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"conv3x3 {ch}ch int8 FAILED: "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
