"""guitar_tablature_classification_tpu — TPU-native guitar tablature
transcription framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
AshishBhardwaj01/Guitar-Tablature-Classification (reference mounted at
/root/reference): GuitarSet audio -> batched on-device CQT -> CNN/ViT
per-string fret classifiers -> trained under jit over a TPU mesh ->
served as batched transcription with ASCII/image tablature rendering.

Layer map (SURVEY.md §7):
  ops/       device-side DSP + math (CQT, resize, loss, augment, ...)
  models/    Flax model zoo (ResNet18, ViT-S/8, small CNN, string heads)
  labels/    JAMS -> (6, 19) tablature targets (both conventions)
  data/      packing, pairing, splits, loaders, synthesis, audio IO
  train/     jitted engine, schedules, Orbax checkpoints, metrics
  parallel/  device mesh + shardings (SPMD DP, string-head model axis)
  infer/     batched transcription + tablature renderers + CLI
  report/    visualization artifact suite
  utils/     PRNG threading, structured logging, profiling
"""

from .config import (
    CQTConfig,
    DataConfig,
    MeshConfig,
    ModelConfig,
    NUM_FRETS,
    NUM_STRINGS,
    OPEN_STRING_MIDI,
    OptimConfig,
    TrainConfig,
)
from .version import __version__

__all__ = [
    "CQTConfig",
    "DataConfig",
    "MeshConfig",
    "ModelConfig",
    "NUM_FRETS",
    "NUM_STRINGS",
    "OPEN_STRING_MIDI",
    "OptimConfig",
    "TrainConfig",
    "__version__",
]
