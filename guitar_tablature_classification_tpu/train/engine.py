"""Jitted train/eval engine.

The reference's hot loop (bestengine.py:899-954) is a Python batch loop
with per-step H2D copies, six per-string loss calls and a device->host
sync on every ``loss.item()``.  Here one jitted ``train_step`` does
forward + backward + optimizer update + metrics for the whole [B, 6, 19]
problem on device; the host loop only schedules epochs, the LR schedule
and checkpointing.  Data parallelism falls out of batch sharding over
the mesh's ``data`` axis (XLA inserts the psum over ICI) — the SPMD
replacement for ``nn.DataParallel`` (bestengine.py:1032-1034).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from ..config import ModelConfig, OptimConfig, TrainConfig
from ..models import build_model
from ..ops import (
    db_to_unit,
    imagenet_normalize,
    label_smoothing_loss,
    per_string_accuracy,
    resize_bicubic,
    tile_channels,
)
from .schedules import make_scheduler


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: core.FrozenDict[str, Any]
    batch_stats: core.FrozenDict[str, Any]
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def _backbone_mask(params) -> Any:
    """True for backbone subtrees (resnet/vit) — the ViT recipe trains the
    backbone at lr * backbone_lr_scale (ViT_engine.py:244-251)."""
    return {
        k: jax.tree.map(lambda _: k in ("resnet", "vit"), v)
        for k, v in params.items()
    }


def make_optimizer(cfg: OptimConfig, params=None) -> optax.GradientTransformation:
    """torch-faithful chains:
    adam  = clip -> L2-into-grads -> adam -> -lr   (torch Adam(weight_decay))
    adamw = clip -> adam -> decoupled wd -> -lr    (torch AdamW)
    """

    def build(learning_rate):
        chain = []
        if cfg.grad_clip_norm:
            chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
        if cfg.name == "adam":
            if cfg.weight_decay:
                chain.append(optax.add_decayed_weights(cfg.weight_decay))
            chain.append(optax.scale_by_adam())
        elif cfg.name == "adamw":
            chain.append(optax.scale_by_adam())
            if cfg.weight_decay:
                chain.append(optax.add_decayed_weights(cfg.weight_decay))
        else:
            raise ValueError(f"unknown optimizer {cfg.name!r}")
        chain.append(optax.scale(-1.0 * learning_rate))
        if cfg.backbone_lr_scale != 1.0 and params is not None:
            chain.append(
                optax.masked(
                    optax.scale(cfg.backbone_lr_scale), _backbone_mask(params)
                )
            )
        return optax.chain(*chain)

    return optax.inject_hyperparams(build)(learning_rate=cfg.learning_rate)


def make_preprocess(
    model_cfg: ModelConfig,
    image_size: int = 224,
    input_kind: str = "db_features",
) -> Callable[[jax.Array], jax.Array]:
    """Raw batch features -> model input images, on device.

    ``db_features``: [B, n_bins, n_frames] dB spectrograms -> [0,1],
    bicubic resize, channel tile, (CNN path) ImageNet normalize —
    replacing the CPU per-item transforms of my_dataloader.py:17-30 /
    ViT_dataloader.py:31-51.

    ``rgb_image``: [B, H, W, 3] uint8 spectrogram renders (the reference
    CNN's cqt_images/*.png path) -> [0,1], resize, ImageNet normalize.
    """
    arch = model_cfg.arch
    if input_kind == "rgb_image" and arch in ("resnet18_native", "vit_native"):
        # The PNG path carries colormapped renders; the native archs
        # consume the raw 1-channel dB map, which cannot be recovered
        # from a colormap. Fail here with a clear message instead of a
        # shape error deep inside the model.
        raise ValueError(
            f"arch {arch!r} consumes raw 1-channel CQT features; the "
            "PNG image path is only supported by the 224^2 archs "
            "(resnet18, vit_s8) and small_cnn"
        )

    def preprocess(feats: jax.Array) -> jax.Array:
        if input_kind == "rgb_image":
            x = feats.astype(jnp.float32) / 255.0
            # small_cnn consumes native resolution (its flatten layer
            # scales with pixel count); the 224^2 backbones resize.
            needs_resize = arch != "small_cnn" and (
                x.shape[1] != image_size or x.shape[2] != image_size
            )
            if needs_resize:
                x = resize_bicubic(
                    x, (image_size, image_size), channels_last=True
                )
            if arch == "resnet18":
                x = imagenet_normalize(x)
            return x
        x = db_to_unit(feats)
        if arch in ("small_cnn", "resnet18_native", "vit_native"):
            return x[..., None]  # raw [B, 96, T, 1], no resize needed
        if (
            arch == "resnet18"
            and image_size == 224
            and getattr(model_cfg, "stem_fusion", "off") in ("on", "fused")
        ):
            # Precomposed stem front (ops/stem_fusion.py): the model's
            # fused conv1 consumes the raw unit CQT; resize/tile/
            # normalize are folded into its GEMMs (exact at fp32).
            return x[..., None]
        x = resize_bicubic(x, (image_size, image_size))
        x = tile_channels(x, model_cfg.input_channels)
        if arch == "resnet18":
            x = imagenet_normalize(x)  # CNN/PNG path (my_dataloader.py:21-30)
        return x

    return preprocess


def make_train_step(
    model,
    preprocess: Callable | None = None,
    *,
    smoothing: float = 0.05,
    skip_nonfinite: bool = True,
    frontend: Callable | None = None,
    augment: Callable | None = None,
):
    """Build the jitted train step.

    batch: dict with either 'features' [B,F,T] dB or 'audio' [B,W] raw
    windows (requires ``frontend``), plus 'labels' [B,6] int frets and
    optional 'weights' [B,6].
    """

    def _features(batch, key):
        if "audio" in batch:
            feats = frontend(batch["audio"])
        else:
            feats = batch["features"]
        if augment is not None:
            feats = augment(key, feats)
        return preprocess(feats) if preprocess is not None else feats

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng, lr):
        aug_key, dropout_key = jax.random.split(jax.random.fold_in(rng, state.step))
        images = _features(batch, aug_key)
        labels = batch["labels"]

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, mutated = state.apply_fn(
                variables, images, train=True,
                rngs={"dropout": dropout_key},
                mutable=["batch_stats"],
            )
            loss = label_smoothing_loss(
                out, labels, smoothing, weights=batch.get("weights")
            )
            return loss, (out, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        state.opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        if skip_nonfinite:
            # jit-safe analogue of the reference's skip-bad-batch guards
            # (bestengine.py:935, ViT_engine.py:309-321).
            ok = jnp.isfinite(loss)
            new_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_state,
                state.replace(step=state.step + 1),
            )
        per_string, overall = per_string_accuracy(logits, labels)
        metrics = {
            "loss": loss,
            "accuracy": overall,
            "per_string_accuracy": per_string,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def make_eval_step(model, preprocess=None, *, smoothing=0.05, frontend=None):
    @jax.jit
    def eval_step(state: TrainState, batch):
        feats = frontend(batch["audio"]) if "audio" in batch else batch["features"]
        images = preprocess(feats) if preprocess is not None else feats
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = state.apply_fn(variables, images, train=False)
        labels = batch["labels"]
        # weights mask out padded rows of the final short batch — they must
        # not count toward loss or accuracy.
        weights = batch.get("weights")
        if weights is None:
            weights = jnp.ones(labels.shape, jnp.float32)
        loss = label_smoothing_loss(logits, labels, smoothing, weights=weights)
        correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        correct = correct * weights
        count = jnp.sum(weights, axis=0)
        per_string = jnp.sum(correct, axis=0) / jnp.maximum(count, 1.0)
        overall = jnp.sum(correct) / jnp.maximum(jnp.sum(weights), 1.0)
        return {
            "loss": loss,
            "accuracy": overall,
            "per_string_accuracy": per_string,
            "correct": jnp.sum(correct, axis=0),
            "count": count,
        }

    return eval_step


def create_train_state(
    model, optim_cfg: OptimConfig, rng, sample_input
) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(optim_cfg, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def validate_model(state, eval_step, loader: Iterable) -> dict[str, float]:
    """Aggregate eval metrics over a loader; per-string accuracy is the
    exact correct/total ratio (bestengine.py:230-299 semantics).  Loss is
    likewise the exact weighted mean over all (sample, string) cells: each
    batch's weighted-mean loss is re-scaled by its weight total so a padded
    or short final batch contributes proportionally, not equally."""
    import numpy as np

    loss_weighted_sum = 0.0
    correct = np.zeros(6)
    count = np.zeros(6)
    for batch in loader:
        m = eval_step(state, batch)
        # eval_step's loss = weighted_sum / weight_total for the batch and
        # count.sum() = weight_total, so this recovers the weighted sum.
        loss_weighted_sum += float(m["loss"]) * float(np.asarray(m["count"]).sum())
        correct += np.asarray(m["correct"])
        count += np.asarray(m["count"])
    per_string = correct / np.maximum(count, 1.0)
    return {
        "loss": loss_weighted_sum / max(count.sum(), 1.0),
        "per_string_accuracy": per_string,
        "accuracy": float(correct.sum() / max(count.sum(), 1.0)),
    }


def test_model(state, eval_step, loader: Iterable) -> dict[str, float]:
    """Per-string + overall test accuracy (bestengine.py:331-380)."""
    return validate_model(state, eval_step, loader)


def train_model(
    train_loader: Iterable,
    val_loader: Iterable,
    config: TrainConfig | None = None,
    *,
    model=None,
    state: TrainState | None = None,
    frontend=None,
    checkpointer=None,
    resume: bool = False,
    log: Callable[[str], None] = print,
    on_epoch_end: Callable[[int, dict, "TrainState"], None] | None = None,
) -> tuple[TrainState, dict]:
    """Reference-compatible training driver (bestengine.py:870-1016):
    epoch loop, validation, LR schedule on val loss, best-val checkpoint,
    early stopping.  ``resume=True`` restarts from the checkpointer's last
    saved state and epoch (capability absent in the reference, which only
    reloads its best model for final eval).  Returns (best_state, history).
    """
    config = config or TrainConfig()
    ocfg = config.optim
    if model is None:
        model = build_model(config.model)

    init_batch = next(iter(train_loader))
    input_kind = (
        "rgb_image"
        if "features" in init_batch and init_batch["features"].ndim == 4
        else "db_features"
    )
    preprocess = make_preprocess(
        config.model, config.data.image_size, input_kind
    )

    rng = jax.random.PRNGKey(ocfg.seed)
    if state is None:
        feats = (
            frontend(init_batch["audio"])
            if "audio" in init_batch
            else init_batch["features"]
        )
        sample = preprocess(feats[:1])
        state = create_train_state(model, ocfg, rng, sample)

    start_epoch = 0
    resumed_best = None
    import dataclasses as _dc

    model_meta = _dc.asdict(config.model)
    if resume and checkpointer is not None and checkpointer.exists():
        state, meta = checkpointer.restore(state, expect_model=model_meta)
        start_epoch = int(meta.get("epoch", -1)) + 1
        resumed_best = meta.get("metrics", {}).get("loss")
        log(f"resumed from epoch {start_epoch} (step {int(state.step)})")

    augment = None
    if ocfg.augment:
        from functools import partial as _partial

        from ..ops.augment import augment_batch

        augment = _partial(augment_batch, augment_prob=ocfg.augment_prob)
    train_step = make_train_step(
        model, preprocess, smoothing=ocfg.label_smoothing, frontend=frontend,
        augment=augment,
    )
    eval_step = make_eval_step(
        model, preprocess, smoothing=ocfg.label_smoothing, frontend=frontend
    )
    scheduler = make_scheduler(ocfg)

    lr = ocfg.learning_rate
    best_val = float(resumed_best) if resumed_best is not None else float("inf")
    best_state = state
    patience = 0
    history: dict[str, list] = {
        "train_loss": [], "val_loss": [], "val_accuracy": [], "lr": [],
        "val_per_string": [], "epoch_time": [],
    }

    for epoch in range(start_epoch, ocfg.epochs):
        t0 = time.perf_counter()
        running_loss, steps, seen = 0.0, 0, 0
        for batch in train_loader:
            state, metrics = train_step(state, batch, rng, lr)
            running_loss += float(metrics["loss"])
            steps += 1
            seen += int(batch["labels"].shape[0])
        train_loss = running_loss / max(steps, 1)
        train_time = time.perf_counter() - t0

        val = validate_model(state, eval_step, val_loader)
        lr = scheduler(epoch, val["loss"], lr)
        dt = time.perf_counter() - t0

        history["train_loss"].append(train_loss)
        history["val_loss"].append(val["loss"])
        history["val_accuracy"].append(val["accuracy"])
        history["val_per_string"].append(val["per_string_accuracy"].tolist())
        history["lr"].append(lr)
        history["epoch_time"].append(dt)
        segments_per_sec = seen / max(train_time, 1e-9)
        history.setdefault("segments_per_sec", []).append(segments_per_sec)
        log(
            f"epoch {epoch + 1}/{ocfg.epochs}: train {train_loss:.4f} "
            f"val {val['loss']:.4f} acc {val['accuracy']:.4f} "
            f"lr {lr:.2e} ({dt:.1f}s, {segments_per_sec:,.0f} segments/s)"
        )

        if on_epoch_end is not None:
            # e.g. periodic metric plots (bestengine.py:1006-1007) /
            # per-epoch confusion matrices (ViT_engine.py:473) — the
            # state enables mid-training prediction artifacts.
            on_epoch_end(epoch, history, state)

        if val["loss"] < best_val:
            best_val = val["loss"]
            # Device-side copy: train_step donates its input state, so a
            # bare reference would hold deleted buffers once training
            # continues past this epoch (donation is real on TPU only —
            # CPU tests won't catch a missing copy here).
            best_state = jax.tree.map(
                lambda x: jnp.array(x) if isinstance(x, jax.Array) else x,
                state,
            )
            patience = 0
            if checkpointer is not None:
                checkpointer.save(
                    state, epoch=epoch, metrics=val,
                    model_meta=model_meta,
                )
        else:
            patience += 1
            if patience >= ocfg.early_stop_patience:
                log(f"early stopping at epoch {epoch + 1}")
                break

    history["best_val_loss"] = best_val
    return best_state, history
