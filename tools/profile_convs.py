"""Microbenchmarks: bare MXU matmul + the ResNet18 conv shapes.

Establishes (a) the chip's practical bf16 matmul ceiling (sanity check on
the peak-FLOPs figure used for MFU claims) and (b) per-conv-shape
efficiency, separating "XLA conv is slow at this shape" from "the model
glues convs together badly".

Usage: python tools/profile_convs.py [--extra]
(--extra adds im2col-GEMM formulations and narrow-N GEMM probes)
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

STEPS = 30


def timed(fn, args, flops, label):
    @jax.jit
    def run(*a):
        def body(c, _):
            # feed the carry into the op's input and reduce over the FULL
            # output — slicing would let XLA skip most of the compute
            # (an out[:1,:1] barrier "measured" an impossible 913 TF/s).
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            return jnp.sum(out).astype(jnp.float32) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=STEPS)
        return c

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    ms = 1e3 * (time.perf_counter() - t0) / STEPS
    tf = flops / (ms / 1e3) / 1e12
    print(f"{label:<52s} {ms:8.3f} ms  {tf:7.1f} TF/s", flush=True)
    return tf


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()}", flush=True)

    # MXU ceiling: big square bf16 matmul
    for n in (4096, 8192):
        a = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((n, n)), dtype=jnp.bfloat16)
        timed(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
            (a, b), 2 * n**3, f"matmul {n}x{n}x{n} bf16",
        )

    # ResNet18 conv shapes at B=256, NHWC bf16 (fwd only)
    B = 256
    shapes = [
        # (H, W, Cin, Cout, k, stride, label)
        (224, 224, 3, 64, 7, 2, "conv1 7x7/2 3->64 @224"),
        (56, 56, 64, 64, 3, 1, "layer1 3x3 64->64 @56"),
        (56, 56, 64, 128, 3, 2, "layer2.0 3x3/2 64->128 @56"),
        (28, 28, 128, 128, 3, 1, "layer2 3x3 128->128 @28"),
        (14, 14, 256, 256, 3, 1, "layer3 3x3 256->256 @14"),
        (7, 7, 512, 512, 3, 1, "layer4 3x3 512->512 @7"),
    ]
    for h, w, cin, cout, k, s, label in shapes:
        x = jnp.asarray(
            rng.standard_normal((B, h, w, cin)), dtype=jnp.bfloat16
        )
        wgt = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)) * 0.01, dtype=jnp.bfloat16
        )
        pad = k // 2

        def conv(x, wgt, s=s, pad=pad):
            return jax.lax.conv_general_dilated(
                x, wgt, (s, s), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        out_h, out_w = h // s, w // s
        flops = 2 * B * out_h * out_w * cout * k * k * cin
        timed(conv, (x, wgt), flops, f"{label} (B={B})")

    # space-to-depth variant of conv1: [B,112,112,12] x 4x4 -> [B,112,112,64]
    x = jnp.asarray(
        rng.standard_normal((B, 112, 112, 12)), dtype=jnp.bfloat16
    )
    wgt = jnp.asarray(rng.standard_normal((4, 4, 12, 64)) * 0.01, jnp.bfloat16)

    def conv_s2d(x, wgt):
        return jax.lax.conv_general_dilated(
            x, wgt, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    flops = 2 * B * 112 * 112 * 64 * 4 * 4 * 12
    timed(conv_s2d, (x, wgt), flops, "conv1 as space-to-depth 4x4 12->64 @112")


def extra():
    """im2col-GEMM conv formulations + narrow-N GEMM penalty probes."""
    rng = np.random.default_rng(0)
    B = 256

    # N=64 penalty: GEMM with layer1's effective shape
    for m, k, n in [(8192, 4096, 64), (8192, 4096, 128), (802816, 576, 64),
                    (200704, 1152, 128), (12544, 4608, 512)]:
        a = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
        bm = jnp.asarray(rng.standard_normal((k, n)), dtype=jnp.bfloat16)
        timed(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
            (a, bm), 2 * m * k * n, f"matmul M={m} K={k} N={n} bf16",
        )

    # layer1 3x3 64->64 @56 as explicit shifted-view im2col + GEMM
    for h, w, cin, cout, label in [
        (56, 56, 64, 64, "layer1 im2col-GEMM 64->64 @56"),
        (7, 7, 512, 512, "layer4 im2col-GEMM 512->512 @7"),
        (28, 28, 128, 128, "layer2 im2col-GEMM 128->128 @28"),
    ]:
        x = jnp.asarray(rng.standard_normal((B, h, w, cin)), jnp.bfloat16)
        wgt = jnp.asarray(
            rng.standard_normal((3 * 3 * cin, cout)) * 0.01, jnp.bfloat16
        )

        def im2col_conv(x, wgt, h=h, w=w, cin=cin, cout=cout):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            patches = jnp.concatenate(
                [
                    xp[:, dy : dy + h, dx : dx + w, :]
                    for dy in range(3)
                    for dx in range(3)
                ],
                axis=-1,
            )  # [B, H, W, 9*Cin]
            out = jnp.einsum(
                "bhwk,kn->bhwn", patches, wgt.reshape(9 * cin, cout),
                preferred_element_type=jnp.float32,
            )
            return out

        flops = 2 * B * h * w * cout * 9 * cin
        timed(im2col_conv, (x, wgt), flops, f"{label} (B={B})")


if __name__ == "__main__":
    import sys as _sys

    main()
    if "--extra" in _sys.argv:
        extra()
