"""Serving throughput: windows/sec for batched audio -> tablature inference.

The reference serves one 0.2 s window per forward with per-window CPU CQT
and disk round trips (tablature-generator (1).py:374-404,
tablature_generator.py:880-893).  This measures this framework's batched
path: on-device CQT + preprocess + model forward at a fixed batch size,
steady state, with a forced device->host round trip.

Prints one JSON line (not the headline bench; see bench.py).
"""

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

BATCH = 512
STEPS = 20


def main():
    cqt_cfg = CQTConfig()
    model_cfg = ModelConfig(arch="resnet18")
    frontend = CQTFrontend(cqt_cfg)
    model = build_model(model_cfg)
    preprocess = make_preprocess(model_cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        preprocess(jnp.zeros((1, cqt_cfg.n_bins, cqt_cfg.n_frames))),
        train=False,
    )

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((2, BATCH, cqt_cfg.window_samples)).astype(np.float32)
    )

    @partial(jax.jit, static_argnums=(2,))
    def serve(variables, audio, steps):
        def body(acc, i):
            logits = model.apply(
                variables, preprocess(frontend(audio[i % 2])), train=False
            )
            frets = jnp.argmax(logits, -1)
            return acc + frets.sum(), None
        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), jnp.arange(steps))
        return out

    int(serve(variables, audio, STEPS))  # compile + warm
    t0 = time.perf_counter()
    int(serve(variables, audio, STEPS))  # forced round trip
    dt = time.perf_counter() - t0

    value = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "serving windows/sec/chip (CQT->CNN infer)",
        "value": round(value, 1),
        "unit": "windows/sec",
        "detail": {
            "batch": BATCH,
            "forward_ms": round(1e3 * dt / STEPS, 2),
            "audio_hours_per_minute": round(value * 0.1 / 3600 * 60, 1),
        },
    }))


if __name__ == "__main__":
    main()
