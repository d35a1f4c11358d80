"""Label-smoothing cross-entropy over per-string fret logits.

Semantics of reference ``LabelSmoothingLoss`` (bestengine.py:63-87,
ViT_engine.py:219-233): every class gets ``smoothing / (classes - 1)``
mass, the target class is then *overwritten* with ``1 - smoothing``
(so the distribution sums to ``1 + smoothing/(classes-1) - smoothing``,
a quirk preserved here for parity), and the loss is
``mean_batch sum_classes -true * log_softmax(pred)``.  The engines sum
this over the 6 strings and divide by the string count
(bestengine.py:945-947) — i.e. a mean over (batch, string).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smoothed_true_dist(
    targets: jax.Array, num_classes: int, smoothing: float
) -> jax.Array:
    """[..., ] int targets -> [..., num_classes] smoothed distribution."""
    confidence = 1.0 - smoothing
    fill = smoothing / (num_classes - 1)
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    return one_hot * (confidence - fill) + fill


def label_smoothing_loss(
    logits: jax.Array,
    targets: jax.Array,
    smoothing: float = 0.05,
    *,
    weights: jax.Array | None = None,
) -> jax.Array:
    """logits [B, S, C] float, targets [B, S] int -> scalar loss.

    ``weights`` (optional, [B, S]) masks invalid samples — the jit-safe
    replacement for the reference's skip-bad-targets branches
    (bestengine.py:927-929).
    """
    num_classes = logits.shape[-1]
    targets = jnp.clip(targets, 0, num_classes - 1)  # bestengine.py:79-81
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    true_dist = smoothed_true_dist(targets, num_classes, smoothing)
    per_example = -jnp.sum(true_dist * logp, axis=-1)  # [B, S]
    if weights is None:
        return jnp.mean(per_example)
    weights = weights.astype(jnp.float32)
    return jnp.sum(per_example * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def per_string_accuracy(
    logits: jax.Array, targets: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Top-1 fret accuracy per string + overall micro-average
    (bestengine.py:370-380).  Returns ([S] accuracies, scalar overall)."""
    pred = jnp.argmax(logits, axis=-1)  # [B, S]
    correct = (pred == targets).astype(jnp.float32)
    return jnp.mean(correct, axis=0), jnp.mean(correct)
