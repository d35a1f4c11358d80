"""Probe: can a Pallas implicit-GEMM conv3x3 (with fused input
relu(x*s+o) affine) match or beat XLA's conv at ResNet18 trunk shapes?
Decision data for a fused-trunk rewrite — not product code.

Two formulations per shape:
  concat — build [M, 9C] patches in VMEM, one GEMM (lane-concat at C
           granularity; C=64 is not 128-aligned, Mosaic may relayout)
  sum9   — nine [M, C] x [C, F] GEMMs accumulated in f32 registers
           (no concat; K=C per GEMM)

Usage: python tools/probe_pallas_conv.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 30


def timed(fn, args, flops, label):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            return jnp.sum(out.astype(jnp.float32)) * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=STEPS)
        return c

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    ms = 1e3 * (time.perf_counter() - t0) / STEPS
    tf = flops / (ms / 1e3) / 1e12
    print(f"{label:<58s} {ms:8.3f} ms  {tf:7.1f} TF/s", flush=True)
    return ms


def pallas_conv3x3(x, w9, s, o, *, row_chunk, bt, variant):
    """relu(x*s+o) -> 3x3 same conv, NHWC bf16.
    x [B,H,W,C], w9 [9, C, F], s/o [1, C]."""
    b, h, wd, c = x.shape
    f = w9.shape[-1]

    def kernel(x_ref, w_ref, s_ref, o_ref, out_ref):
        t = jnp.maximum(
            x_ref[:] * s_ref[0] + o_ref[0], 0.0
        ).astype(x_ref.dtype)
        zrow = jnp.zeros((bt, 1, wd, c), t.dtype)
        tp = jnp.concatenate([zrow, t, zrow], axis=1)
        zcol = jnp.zeros((bt, h + 2, 1, c), t.dtype)
        tp = jnp.concatenate([zcol, tp, zcol], axis=2)
        for r0 in range(0, h, row_chunk):
            m = bt * row_chunk * wd
            if variant == "concat":
                views = [
                    tp[:, r0 + dy : r0 + dy + row_chunk, dx : dx + wd, :]
                    for dy in range(3)
                    for dx in range(3)
                ]
                patches = jnp.concatenate(views, axis=-1)
                acc = jax.lax.dot_general(
                    patches.reshape(m, 9 * c),
                    w_ref[:].reshape(9 * c, f),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:  # sum9
                acc = jnp.zeros((m, f), jnp.float32)
                for k, (dy, dx) in enumerate(
                    (a, b_) for a in range(3) for b_ in range(3)
                ):
                    v = tp[:, r0 + dy : r0 + dy + row_chunk,
                           dx : dx + wd, :]
                    acc = acc + jax.lax.dot_general(
                        v.reshape(m, c), w_ref[k],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            out_ref[:, r0 : r0 + row_chunk] = acc.reshape(
                bt, row_chunk, wd, f
            ).astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, wd, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, f), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, h, wd, f), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, f), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wd * f * 9 * c,
            bytes_accessed=(b * h * wd * (c + f)) * 2,
            transcendentals=0,
        ),
    )(x, w9, s.reshape(1, c), o.reshape(1, c))


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()}", flush=True)
    B = 256
    cases = [
        # (H, C, F, bt, row_chunk)
        (56, 64, 64, 4, 8),
        (28, 128, 128, 8, 7),
        (14, 256, 256, 8, 7),
    ]
    for h, c, f, bt, rc in cases:
        x = jnp.asarray(rng.standard_normal((B, h, h, c)), jnp.bfloat16)
        wk = jnp.asarray(
            rng.standard_normal((3, 3, c, f)) * 0.02, jnp.bfloat16
        )
        s = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.bfloat16)
        o = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.bfloat16)
        flops = 2 * B * h * h * f * 9 * c

        def xla_ref(x, wk, s, o):
            t = jnp.maximum(x * s + o, 0.0)
            return jax.lax.conv_general_dilated(
                t, wk, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        timed(xla_ref, (x, wk, s, o), flops,
              f"XLA  relu-affine+conv3x3 {c}->{f} @{h}")
        w9 = wk.reshape(9, c, f)
        for variant in ("sum9", "concat"):
            try:
                got = pallas_conv3x3(
                    x[:bt], w9, s, o, row_chunk=rc, bt=bt, variant=variant
                )
                want = xla_ref(x[:bt], wk, s, o)
                d = float(
                    jnp.max(jnp.abs(got.astype(jnp.float32) - want))
                )
                sc = float(jnp.max(jnp.abs(want)))
                timed(
                    lambda x, w, s, o, v=variant: pallas_conv3x3(
                        x, w, s, o, row_chunk=rc, bt=bt, variant=v
                    ),
                    (x, w9, s, o), flops,
                    f"PLAS {variant} conv3x3 {c}->{f} @{h} bt={bt} "
                    f"(par {d / max(sc, 1e-9):.1e})",
                )
            except Exception as e:  # noqa: BLE001
                msg = f"{type(e).__name__}: {e}"
                print(f"  PALLAS {variant} failed: {msg[:400]}")


if __name__ == "__main__":
    main()
