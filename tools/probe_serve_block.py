"""Serving CQT batch_block A/B: is the +5.8 % isolated block-128 win
(DESIGN.md round-4 sweep, B=8192 train-tier CQT) real at SERVE time?

Training hides the CQT behind the model's compute (block 128 was only
+1.3 % in the full train step), but forward-only serving is
CQT-dominated (DESIGN.md serving table) — the block choice is EXPOSED
there.  This times the full native serve step (CQT -> preprocess ->
model fwd -> argmax; the exact tools/bench_serve.py "default tier"
path) at B=4096 with the auto heuristic block (32) vs 128, same
session, chained scan with a full-output barrier.

One JSON line out.  Run on the real chip.
"""

import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from guitar_tablature_classification_tpu.config import CQTConfig, ModelConfig
from guitar_tablature_classification_tpu.models import build_model
from guitar_tablature_classification_tpu.ops import CQTFrontend
from guitar_tablature_classification_tpu.train import make_preprocess

B = 4096
STEPS = 20


def main():
    model_cfg = ModelConfig(arch="resnet18_native")
    model = build_model(model_cfg)
    pre = make_preprocess(model_cfg)
    base = CQTConfig(precision="default")
    variables = model.init(
        jax.random.PRNGKey(0),
        pre(jnp.zeros((1, base.n_bins, base.n_frames))),
        train=False,
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((2, B, base.window_samples)).astype(np.float32)
    )

    def time_block(block):
        frontend = CQTFrontend(dataclasses.replace(base, batch_block=block))

        @partial(jax.jit, static_argnums=(2,))
        def serve(vs, aud, steps):
            def body(acc, i):
                logits = model.apply(vs, pre(frontend(aud[i % 2])), train=False)
                return acc + jnp.argmax(logits, -1).sum(), None
            out, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.int32), jnp.arange(steps)
            )
            return out

        int(serve(variables, audio, STEPS))  # compile + warm
        t = time.perf_counter()
        int(serve(variables, audio, STEPS))
        dt = time.perf_counter() - t
        return 1e3 * dt / STEPS, B * STEPS / dt

    rows = {}
    for block in (None, 64, 128):
        ms, wps = time_block(block)
        rows[str(block or "auto")] = {
            "ms_per_batch": round(ms, 2), "windows_per_s": round(wps)
        }
        print(f"block={block or 'auto(32)'}: {ms:.2f} ms/batch "
              f"({wps:,.0f} windows/s)", file=sys.stderr)
    print(json.dumps({"probe": "serve_cqt_batch_block", "batch": B,
                      "precision": "default", "rows": rows}))


if __name__ == "__main__":
    main()
