"""Piecewise timings of the fused stem (find where the time hides).

Usage: python tools/profile_stem_pieces.py
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

from guitar_tablature_classification_tpu.ops.stem_fusion import (
    precomposed_conv1_quadrant,
)
from guitar_tablature_classification_tpu.ops.stem_pallas import (
    _bwd_pallas,
    _fwd_pallas,
    _lane_affine,
    bn_relu_pool,
)

STEPS = 20
B = 256
H2, C = 56, 64
L = 2 * H2 * C


def timed(fn, args, label):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            return jnp.sum(out.astype(jnp.float32)) * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=STEPS)
        return c

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    ms = 1e3 * (time.perf_counter() - t0) / STEPS
    print(f"{label:<58s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()}", flush=True)
    x = jnp.asarray(rng.uniform(0, 1, (B, 96, 9)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, jnp.float32)
    yq = jax.jit(
        lambda x, w: precomposed_conv1_quadrant(x, w, dtype=jnp.bfloat16)
    )(x, w)
    yq = jax.block_until_ready(yq)
    mean = jnp.zeros(C, jnp.float32)
    var = jnp.ones(C, jnp.float32)
    scale = jnp.ones(C, jnp.float32)
    bias = jnp.zeros(C, jnp.float32)
    se, oe, _, _ = _lane_affine(mean, var, scale, bias, 1e-5, L)
    g = jnp.asarray(
        rng.standard_normal((B, H2, H2 * C)) * 0.1, jnp.bfloat16
    )

    # 1. quadrant GEMM front, fwd only
    timed(
        lambda x, w: precomposed_conv1_quadrant(x, w, dtype=jnp.bfloat16),
        (x, w), "GEMM front fwd (B=256)",
    )

    # 2. GEMM front fwd+bwd (dW path)
    def gemm_fwdbwd(x, w):
        def loss(w):
            yq = precomposed_conv1_quadrant(x, w, dtype=jnp.bfloat16)
            return jnp.sum(yq.astype(jnp.float32) ** 2) * 1e-9

        l, gw = jax.value_and_grad(loss)(w)
        return l + jnp.sum(gw**2) * 1e-12

    timed(gemm_fwdbwd, (x, w), "GEMM front fwd+bwd")

    # 3. raw bare GEMM [B*112, 70] x [70, 7168] for reference
    hq = jnp.asarray(rng.standard_normal((B, 2, 56, 70)), jnp.bfloat16)
    sq = jnp.asarray(rng.standard_normal((70, 7168)) * 0.05, jnp.bfloat16)
    timed(
        lambda hq, sq: jnp.einsum(
            "brhk,kn->brhn", hq, sq, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16),
        (hq, sq), "bare GEMM [28672,70]x[70,7168]",
    )

    # 3b. Pallas GEMM + fused stats epilogue
    from guitar_tablature_classification_tpu.ops.stem_pallas import (
        _gemm_stats_pallas,
    )

    hq2 = hq.reshape(256 * 112, 70)

    def gemm_stats(hq2, sq):
        y, sums = _gemm_stats_pallas(hq2, sq)
        return jnp.sum(y.astype(jnp.float32)) * 1e-9 + jnp.sum(sums) * 1e-9

    for mt in (256, 512):
        try:
            timed(
                lambda hq2, sq, mt=mt: (
                    lambda o: jnp.sum(o[0].astype(jnp.float32)) * 1e-9
                    + jnp.sum(o[1]) * 1e-9
                )(_gemm_stats_pallas(hq2, sq, m_tile=mt)),
                (hq2, sq), f"PALLAS GEMM+stats m_tile={mt}",
            )
        except Exception as e:  # noqa: BLE001
            print(f"  GEMM+stats m_tile={mt} failed: {str(e)[:160]}")

    # 4. BN stats reductions over yq
    def stats(yq):
        yf = yq.astype(jnp.float32)
        t1, t2 = yf, yf * yf
        while t1.ndim > 1:
            t1 = jnp.sum(t1, axis=0)
            t2 = jnp.sum(t2, axis=0)
        return jnp.sum(t1) + jnp.sum(t2)

    timed(stats, (yq,), "BN stats reductions (XLA)")

    # 5. K2 forward kernel alone, batch-tile sweep
    for bt in (2, 4, 8, 16):
        try:
            timed(
                lambda yq, bt=bt: _fwd_pallas(
                    yq, se, oe, h2=H2, c=C, interpret=False, bt=bt
                ),
                (yq,), f"K2 fwd kernel (BN+ReLU+pool) bt={bt}",
            )
        except Exception as e:  # noqa: BLE001
            print(f"  K2 bt={bt} failed: {str(e)[:160]}")

    # 6. K3 backward kernel alone, batch-tile sweep
    def k3(yq, g, bt):
        dy, sdz, sdzy = _bwd_pallas(
            yq, g, se, oe, h2=H2, c=C, interpret=False, bt=bt
        )
        return (
            jnp.sum(dy.astype(jnp.float32)) + jnp.sum(sdz) + jnp.sum(sdzy)
        )

    for bt in (1, 2, 4):
        try:
            timed(
                lambda yq, g, bt=bt: k3(yq, g, bt), (yq, g),
                f"K3 bwd kernel (pool/relu/BN grads) bt={bt}",
            )
        except Exception as e:  # noqa: BLE001
            print(f"  K3 bt={bt} failed: {str(e)[:160]}")

    # 7. full custom op fwd+bwd (fixed stats)
    def op_fwdbwd(yq, g4):
        def loss(yq):
            out = bn_relu_pool(yq, mean, var, scale, bias, 1e-5, "pallas")
            return jnp.sum(out.astype(jnp.float32) * g4)

        l, dyq = jax.value_and_grad(loss)(yq)
        return l + jnp.sum(dyq.astype(jnp.float32) ** 2) * 1e-12

    g4 = g.reshape(B, H2, H2, C).astype(jnp.float32)
    timed(op_fwdbwd, (yq, g4), "bn_relu_pool custom op fwd+bwd")


if __name__ == "__main__":
    main()
