"""Probe: stack-layout vs chunk-contraction split CQT kernel.

The stack-layout split kernel (cqt_fused_split) measures flat across
batch blocks and ~10x above its bandwidth+FLOP floor — the in-kernel
im2col frame stack (T=9 overlapping VMEM copies of every audio byte)
dominates.  cqt_fused_split_chunked removes the stack by contracting
hop-sized filterbank chunks directly against outer-dim slices of a
[C, B, hop] audio view.  This probe times both on hardware and checks
parity (gate flips vs the stack kernel must be zero at HIGHEST).

Usage: python tools/probe_cqt_chunk.py [--batch 2048] [--precisions ...]
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
from guitar_tablature_classification_tpu.ops import CQTFrontend, make_filterbank
from guitar_tablature_classification_tpu.ops.cqt import split_geometry
from guitar_tablature_classification_tpu.ops.cqt_pallas import (
    cqt_fused_split,
    cqt_fused_split_chunked,
)

STEPS = 30


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--precisions", default="highest,bf16x3,default")
    p.add_argument("--blocks", default="32")
    args = p.parse_args()
    cfg = CQTConfig()
    fb = make_filterbank(cfg)
    geom = split_geometry(fb, cfg, cfg.window_samples)
    split_bin, k_b, b_off, data_lo, data_hi = geom
    fe = CQTFrontend(cfg)
    kernels = fe.kernels
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((args.batch, cfg.window_samples), dtype=np.float32)
    )
    pad = fb.kernel_width // 2
    padded = jnp.pad(x, ((0, 0), (pad, pad)))
    t = cfg.n_frames
    print(f"device: {jax.devices()} batch={args.batch}", flush=True)

    prec_map = {
        "highest": jax.lax.Precision.HIGHEST,
        "bf16x3": "bf16x3",
        "default": jax.lax.Precision.DEFAULT,
    }
    ref = {}
    for pname in args.precisions.split(","):
        prec = prec_map[pname]
        for bb in [int(v) for v in args.blocks.split(",")]:
            for label, fn in (("stack", cqt_fused_split),
                              ("chunk", cqt_fused_split_chunked)):
                tag = f"{pname:<8s} bb={bb:<3d} {label}"
                try:
                    call = lambda pa: fn(  # noqa: E731
                        pa, kernels, hop_length=cfg.hop_length, n_frames=t,
                        n_bins=cfg.n_bins,
                        magnitude_power=cfg.magnitude_power, amin=cfg.amin,
                        top_db=cfg.top_db,
                        gate_threshold_db=cfg.gate_threshold_db,
                        gate_floor_db=cfg.gate_floor_db,
                        split_bin=split_bin, k_b=k_b, b_off=b_off,
                        data_lo=data_lo, data_hi=data_hi,
                        batch_block=bb, precision=prec,
                    )
                    got = np.asarray(call(padded))
                    line = ""
                    key = (pname, bb)
                    if label == "stack":
                        ref[key] = got
                    elif key in ref:
                        w = ref[key]
                        flips = int(np.sum(
                            (got == cfg.gate_floor_db) != (w == cfg.gate_floor_db)
                        ))
                        both = (got != cfg.gate_floor_db) & (w != cfg.gate_floor_db)
                        err = (float(np.max(np.abs(got[both] - w[both])))
                               if both.any() else 0.0)
                        line = f"  flips-vs-stack {flips} maxerr {err:.5f}"

                    @jax.jit
                    def run(pa):
                        def body(c, _):
                            out = call(pa + c)
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
                        f"{tag} {ms:8.3f} ms "
                        f"({args.batch / (ms / 1e3):,.0f} seg/s){line}",
                        flush=True,
                    )
                except Exception as e:  # noqa: BLE001
                    print(f"{tag} FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
