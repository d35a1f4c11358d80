"""Full flagship train-step timing: stem_fusion off vs fused.

The quadrant-layout Pallas stem tail (ops/stem_pallas.py) only matters
if it wins END TO END inside the real train step — the round-1 "on"
variant won its microbench and lost 8 ms to XLA layout conversions.
Same methodology as bench.py (one lax.scan, device-fetch barrier).

Usage: python tools/profile_stem_e2e.py [--batch 256] [--steps 20]
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

from guitar_tablature_classification_tpu.config import (
    CQTConfig,
    ModelConfig,
    OptimConfig,
)
from guitar_tablature_classification_tpu.models import build_model
from guitar_tablature_classification_tpu.ops import CQTFrontend
from guitar_tablature_classification_tpu.train import (
    create_train_state,
    make_preprocess,
    make_train_step,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--variants", nargs="+", default=["off", "fused"],
                   help="stem_fusion modes, optionally suffixed '+bn' to "
                        "also enable bn_fusion (e.g. 'fused+bn')")
    args = p.parse_args()
    b = args.batch

    cqt_cfg = CQTConfig()
    frontend = CQTFrontend(cqt_cfg)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((b, cqt_cfg.window_samples), dtype=np.float32)
    )
    labels = jnp.asarray(rng.integers(0, 19, (b, 6)), dtype=jnp.int32)
    print(f"device: {jax.devices()}  batch={b}", flush=True)

    for variant in args.variants:
        stem, _, bn = variant.partition("+")
        model_cfg = ModelConfig(
            arch="resnet18", stem_fusion=stem,
            bn_fusion="on" if bn == "bn" else "off",
        )
        model = build_model(model_cfg)
        preprocess = make_preprocess(model_cfg, image_size=224)
        state = create_train_state(
            model, OptimConfig(), jax.random.PRNGKey(0),
            jax.jit(lambda a: preprocess(frontend(a)))(audio[:1]),
        )
        train_step = make_train_step(
            model, preprocess, smoothing=0.05, frontend=frontend
        )

        @jax.jit
        def run(s):
            # Loss feedback (x 1e-24, numerically a no-op) keeps the
            # CQT+preprocess INSIDE the scan — a loop-constant audio
            # batch lets XLA hoist the whole frontend out of the loop.
            def body(carry, _):
                s, eps = carry
                new_s, metrics = train_step(
                    s, {"audio": audio + eps, "labels": labels},
                    jax.random.PRNGKey(0), 5e-4,
                )
                return (new_s, metrics["loss"] * 1e-24), None

            (out, _), _ = jax.lax.scan(
                body, (s, jnp.zeros(())), None, length=args.steps
            )
            leaf = jax.tree_util.tree_leaves(out.params)[0]
            return out, jnp.sum(leaf.astype(jnp.float32))

        try:
            out, bar = run(state)
            float(bar)
            t0 = time.perf_counter()
            out, bar = run(state)
            float(bar)
            ms = 1e3 * (time.perf_counter() - t0) / args.steps
            print(
                f"variant={variant:<9s} {ms:8.2f} ms/step"
                f"  ({b / (ms / 1e3):,.0f} segments/s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"variant={variant} FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
