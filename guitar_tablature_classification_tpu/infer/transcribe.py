"""Batched audio -> tablature transcription.

The reference serves one 0.2 s window at a time — a CPU CQT, a disk
round trip and a batch-size-1 forward per window
(tablature-generator (1).py:374-404; tablature_generator.py:880-893 even
writes temp WAV + PNG files inside the loop).  Here a whole track is
framed once, CQT'd and classified in fixed-size jitted batches (last
batch padded — no recompilation), then mode-smoothed; a 3-minute track
is a handful of device calls.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CQTConfig, ModelConfig
from ..models import build_model
from ..ops import CQTFrontend, frame_track, mode_filter, window_times
from ..train import make_preprocess


@dataclass
class Transcription:
    frets: np.ndarray  # [T, 6] int
    times: np.ndarray  # [T] seconds (window starts)
    logits: np.ndarray | None = None


class Transcriber:
    """Load once, transcribe many tracks.

    variables: flax variables dict ({'params': ..., 'batch_stats': ...})
    from training, an Orbax checkpoint, or a converted torch checkpoint
    (:mod:`..models.torch_import`).
    """

    def __init__(
        self,
        variables: dict,
        *,
        model_cfg: ModelConfig | None = None,
        cqt_cfg: CQTConfig | None = None,
        batch_size: int = 128,
        image_size: int = 224,
        mesh=None,
        bucket_sizes: tuple[int, ...] | None = None,
    ):
        self.model_cfg = model_cfg or ModelConfig()
        self.cqt_cfg = cqt_cfg or CQTConfig()
        self.model = build_model(self.model_cfg)
        self.frontend = CQTFrontend(self.cqt_cfg)
        self.preprocess = make_preprocess(self.model_cfg, image_size)
        self.batch_size = batch_size
        self.mesh = mesh
        # Bucketed batch shapes: a short tail (or a single streaming
        # window) pads only to the smallest bucket that fits instead of a
        # full batch — a batch-1 feed stops paying a 128-row forward.
        # Each bucket compiles once (jit caches by shape).  Under a mesh,
        # every bucket must divide over the data axis, so buckets are
        # filtered accordingly (falling back to just batch_size).
        # The 1-bucket ships since round 4: a single streaming window
        # measured 53.1 ms/feed vs 73.2 with the 8-row pad (same-session
        # A/B, tools/bench_serve.py stream_chunk_feed_ms_bucket1).
        if bucket_sizes is None:
            bucket_sizes = (1, 8, 32, batch_size)
        buckets = sorted({min(int(b), batch_size) for b in bucket_sizes})
        if mesh is not None:
            dp = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                              if a == "data"]) or 1)
            buckets = [b for b in buckets if b % dp == 0] or [batch_size]
        self.bucket_sizes = tuple(buckets)
        if mesh is not None:
            # Multi-chip serving: replicate params, shard the window batch
            # over the mesh's data axis (batch_size must divide evenly).
            from ..parallel.mesh import batch_sharding, replicated

            self._batch_sharding = batch_sharding(mesh)
            variables = jax.device_put(variables, replicated(mesh))
        self.variables = variables

        model = self.model
        preprocess = self.preprocess
        frontend = self.frontend

        @jax.jit
        def _predict(variables, audio_windows):
            feats = frontend(audio_windows)
            images = preprocess(feats)
            logits = model.apply(variables, images, train=False)
            return logits  # [B, 6, 19]

        self._predict = _predict

    def _bucket_for(self, remaining: int) -> int:
        # largest bucket the remainder fills completely (no padding) ...
        for b in reversed(self.bucket_sizes):
            if remaining >= b:
                return b
        # ... else the smallest bucket (minimal padding for the tail)
        return self.bucket_sizes[0]

    def predict_windows(self, windows: np.ndarray) -> np.ndarray:
        """[N, window_samples] -> [N, 6, 19] logits, in fixed bucketed
        batch shapes (full batches stream at batch_size; the tail pads
        only to the smallest bucket that fits)."""
        n = windows.shape[0]
        outs = []
        lo = 0
        while lo < n:
            b = self._bucket_for(n - lo)
            chunk = windows[lo : lo + b]
            take = chunk.shape[0]
            if take < b:  # pad to the bucket's static shape
                chunk = np.concatenate(
                    [chunk, np.zeros((b - take, chunk.shape[1]), chunk.dtype)]
                )
            chunk_dev = jnp.asarray(chunk)
            if self.mesh is not None:
                chunk_dev = jax.device_put(chunk_dev, self._batch_sharding)
            logits = self._predict(self.variables, chunk_dev)
            outs.append(np.asarray(logits)[:take])
            lo += take
        return np.concatenate(outs)

    def transcribe(
        self,
        audio: np.ndarray,
        *,
        smooth_window: int = 3,
        hop_samples: int | None = None,
        keep_logits: bool = False,
    ) -> Transcription:
        """audio: 1-D float track at cqt_cfg.sample_rate."""
        windows = np.asarray(
            frame_track(audio.astype(np.float32), self.cqt_cfg,
                        hop_samples=hop_samples)
        )
        logits = self.predict_windows(windows)
        frets = np.argmax(logits, axis=-1)  # [T, 6]
        if smooth_window and frets.shape[0] > smooth_window:
            frets = np.asarray(
                mode_filter(jnp.asarray(frets), window=smooth_window)
            )
        times = window_times(
            audio.shape[0], self.cqt_cfg, hop_samples=hop_samples
        )
        return Transcription(
            frets=frets,
            times=times,
            logits=logits if keep_logits else None,
        )


def transcriber_from_torch_checkpoint(
    path: str, *, arch: str = "resnet18", **kwargs
) -> Transcriber:
    """Serve directly from a reference ``.pt`` checkpoint
    (best_guitar_tab_model.pt / best_vit_guitar_tab_model.pt)."""
    from ..models.torch_import import (
        guitartabnet_variables_from_torch,
        load_torch_checkpoint,
        vittab_variables_from_torch,
    )

    sd = load_torch_checkpoint(path)
    model_cfg = kwargs.pop("model_cfg", None) or ModelConfig(arch=arch)
    if getattr(model_cfg, "vit_conv_stem", False):
        raise ValueError(
            "torch checkpoints carry the reference patchify layout; a "
            "conv-stem ViT (vit_conv_stem=True) cannot be served from "
            "one. Serve the Orbax checkpoint it was trained to, or "
            "retrain with vit_conv_stem=False for torch portability."
        )
    # The converters are shape-agnostic key mappers, so the native twins
    # (resnet18_native / vit_native — e.g. a .pt this repo's
    # save_torch_checkpoint wrote) route through the same paths.
    if arch in ("resnet18", "resnet18_native"):
        variables = guitartabnet_variables_from_torch(sd)
    elif arch in ("vit_s8", "vit_native"):
        variables = vittab_variables_from_torch(sd)
    else:
        raise ValueError(f"unknown arch {arch!r}")
    return Transcriber(variables, model_cfg=model_cfg, **kwargs)
