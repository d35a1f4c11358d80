"""Probe: CQT GEMM precision sweep (HIGHEST vs HIGH vs DEFAULT).

The CQT frame-GEMM runs fp32 at Precision.HIGHEST (6 bf16 MXU passes)
for exact spec parity; at B=1024 it costs ~7 ms — over half the
resnet18_native train step.  HIGH (3 passes) and DEFAULT (1 pass)
trade accuracy for ~2x / ~6x GEMM rate.  This probe measures, on
guitar-like harmonic signals, noise, and near-gate content:

- wall time per batch
- max |dB| error on un-gated bins vs HIGHEST
- gate-decision flips (the -60 dB threshold is the sensitive spot)

Usage: python tools/probe_cqt_precision.py [--batch 1024]
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

from guitar_tablature_classification_tpu.config import CQTConfig
from guitar_tablature_classification_tpu.ops import CQTFrontend

STEPS = 30


def make_signals(cfg, batch, rng):
    """Guitar-ish harmonic stacks + noise + near-silent tails."""
    t = np.arange(cfg.window_samples) / cfg.sample_rate
    out = np.zeros((batch, cfg.window_samples), np.float32)
    f0s = rng.uniform(82.0, 880.0, batch)  # open E2 .. fret-17 E5
    for i in range(batch):
        sig = np.zeros_like(t)
        for h in range(1, 9):
            sig += (
                rng.uniform(0.2, 1.0) / h
                * np.sin(2 * np.pi * f0s[i] * h * t + rng.uniform(0, 6.28))
            )
        sig *= np.exp(-t / rng.uniform(0.05, 0.5))  # pluck decay
        kind = i % 4
        if kind == 1:
            sig += 0.01 * rng.standard_normal(t.shape)  # noisy floor
        elif kind == 2:
            sig *= 1e-3  # near-gate quiet content
        elif kind == 3:
            sig = 0.05 * rng.standard_normal(t.shape)  # pure noise
        out[i] = sig.astype(np.float32)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    args = p.parse_args()
    cfg = CQTConfig()
    rng = np.random.default_rng(0)
    audio = jnp.asarray(make_signals(cfg, args.batch, rng))
    print(f"device: {jax.devices()}  batch={args.batch}", flush=True)

    results = {}
    for name, prec in (
        ("HIGHEST", jax.lax.Precision.HIGHEST),
        # Mosaic's dot lowering rejects the HIGH enum; "bf16x3" is the
        # manual 3-pass hi/lo split (ops/cqt_pallas.py:_dot_any).
        ("BF16X3", "bf16x3"),
        ("DEFAULT", jax.lax.Precision.DEFAULT),
    ):
        try:
            fe = CQTFrontend(cfg, precision=prec)
            feats = np.asarray(fe(audio))
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {str(e)[:200]}", flush=True)
            continue
        results[name] = feats

        @jax.jit
        def run(a):
            def body(c, _):
                f = fe(a + c)
                return jnp.sum(f) * 1e-9, None

            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=STEPS)
            return c

        float(run(audio))
        t0 = time.perf_counter()
        float(run(audio))
        ms = 1e3 * (time.perf_counter() - t0) / STEPS
        line = f"{name:<8s} {ms:8.3f} ms ({args.batch / (ms / 1e3):,.0f} seg/s)"
        if name != "HIGHEST":
            ref = results["HIGHEST"]
            gate = cfg.gate_floor_db
            flips = int(np.sum((feats == gate) != (ref == gate)))
            both = (feats != gate) & (ref != gate)
            derr = float(np.max(np.abs(feats[both] - ref[both]))) if both.any() else 0.0
            total = feats.size
            line += (
                f"  gate flips {flips}/{total} ({100*flips/total:.4f}%)"
                f"  max |dB| err (ungated) {derr:.4f}"
            )
        print(line, flush=True)


if __name__ == "__main__":
    main()
