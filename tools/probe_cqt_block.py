"""Probe: cqt_fused batch_block / k_tile sweep at large batch.

At B=1024 the training-recipe CQT costs ~7 ms (vs 0.63 ms at B=256):
with batch_block=16 the 24 MB padded filterbank is re-streamed per
16-row block (1.5 GB/step) and the frame GEMM's M dim is only 144.
Larger blocks amortize both.  Decision data for CQTFrontend's block
heuristic — not product code.

Usage: python tools/probe_cqt_block.py [--batches 256,1024]
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
from guitar_tablature_classification_tpu.ops.cqt_pallas import cqt_fused

STEPS = 30


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="256,1024")
    p.add_argument("--precision", default="highest",
                   choices=["highest", "bf16x3", "default"])
    p.add_argument("--blocks", default="16,32,64,128")
    args = p.parse_args()
    precision = {
        "highest": jax.lax.Precision.HIGHEST,
        "bf16x3": "bf16x3",
        "default": jax.lax.Precision.DEFAULT,
    }[args.precision]
    cfg = CQTConfig()
    frontend = CQTFrontend(cfg)  # reference output (auto path)
    kernels = frontend.kernels
    print(f"device: {jax.devices()} kernels {kernels.shape}", flush=True)
    rng = np.random.default_rng(0)

    for b in [int(x) for x in args.batches.split(",")]:
        x = jnp.asarray(
            rng.standard_normal((b, cfg.window_samples), dtype=np.float32)
        )
        want = np.asarray(frontend(x))
        pad = kernels.shape[0] // 2
        padded = jnp.pad(x, ((0, 0), (pad, pad)))
        t = want.shape[-1]

        for bb in [int(x) for x in args.blocks.split(",")]:
            if b % bb:
                continue
            for kt in (2048, 4096):
                label = f"B={b} bb={bb} kt={kt} prec={args.precision}"
                try:
                    fn = lambda pa: cqt_fused(  # noqa: E731
                        pa, kernels, hop_length=cfg.hop_length, n_frames=t,
                        n_bins=cfg.n_bins,
                        magnitude_power=cfg.magnitude_power, amin=cfg.amin,
                        top_db=cfg.top_db,
                        gate_threshold_db=cfg.gate_threshold_db,
                        gate_floor_db=cfg.gate_floor_db,
                        batch_block=bb, k_tile=kt, precision=precision,
                    )
                    got = np.asarray(fn(padded))
                    exact = np.array_equal(got, want)

                    @jax.jit
                    def run(pa):
                        def body(c, _):
                            out = fn(pa + c)
                            return jnp.sum(out) * 1e-9, None

                        c, _ = jax.lax.scan(
                            body, jnp.zeros(()), None, length=STEPS
                        )
                        return c

                    float(run(padded))
                    t0 = time.perf_counter()
                    float(run(padded))
                    ms = 1e3 * (time.perf_counter() - t0) / STEPS
                    print(
                        f"{label:<22s} {ms:8.3f} ms "
                        f"({b / (ms / 1e3):,.0f} seg/s) exact={exact}",
                        flush=True,
                    )
                except Exception as e:  # noqa: BLE001
                    print(f"{label} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
