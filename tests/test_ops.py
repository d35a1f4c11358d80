"""Loss, resize, normalize, augment, smoothing ops — incl. torch parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guitar_tablature_classification_tpu.ops import (
    augment_batch,
    db_to_unit,
    imagenet_normalize,
    label_smoothing_loss,
    min_max_normalize,
    mode_filter,
    mode_filter_sequential,
    per_string_accuracy,
    resize_bicubic,
    tile_channels,
    z_score_normalize,
)


def test_label_smoothing_matches_torch_reference():
    torch = pytest.importorskip("torch")

    class TorchLabelSmoothingLoss(torch.nn.Module):
        """Reference LabelSmoothingLoss semantics (bestengine.py:63-87)."""

        def __init__(self, classes, smoothing):
            super().__init__()
            self.confidence = 1.0 - smoothing
            self.smoothing = smoothing
            self.cls = classes

        def forward(self, pred, target):
            pred = pred.log_softmax(dim=1)
            true_dist = torch.zeros_like(pred)
            true_dist.fill_(self.smoothing / (self.cls - 1))
            true_dist.scatter_(1, target.unsqueeze(1), self.confidence)
            return torch.mean(torch.sum(-true_dist * pred, dim=1))

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((8, 6, 19)).astype(np.float32)
    targets = rng.integers(0, 19, (8, 6))

    crit = TorchLabelSmoothingLoss(19, 0.05)
    # reference engines: sum per-string losses / num strings
    want = float(
        sum(
            crit(
                torch.from_numpy(logits[:, s]), torch.from_numpy(targets[:, s])
            )
            for s in range(6)
        )
        / 6
    )
    got = float(label_smoothing_loss(jnp.asarray(logits), jnp.asarray(targets), 0.05))
    assert abs(got - want) < 1e-5


def test_label_smoothing_weights_mask():
    logits = jnp.zeros((4, 6, 19))
    targets = jnp.zeros((4, 6), jnp.int32)
    w = jnp.ones((4, 6)).at[0].set(0.0)
    full = label_smoothing_loss(logits, targets)
    masked = label_smoothing_loss(logits, targets, weights=w)
    # uniform logits: same per-example loss, masking shouldn't change it
    assert abs(float(full) - float(masked)) < 1e-6


def test_per_string_accuracy():
    logits = jnp.asarray(np.eye(19)[[0, 3, 5, 0, 0, 0]][None])  # [1,6,19]
    targets = jnp.asarray([[0, 3, 4, 0, 0, 0]])
    per, overall = per_string_accuracy(logits, targets)
    np.testing.assert_allclose(np.asarray(per), [1, 1, 0, 1, 1, 1])
    assert abs(float(overall) - 5 / 6) < 1e-6


def test_resize_matches_torch_bicubic():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 96, 9)).astype(np.float32)
    want = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x)[:, None], size=(224, 224), mode="bicubic",
            align_corners=False,
        )[:, 0]
        .numpy()
    )
    got = np.asarray(resize_bicubic(jnp.asarray(x), (224, 224)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_resize_channels_last():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 32, 16, 3)), jnp.float32)
    y = resize_bicubic(x, (64, 64), channels_last=True)
    assert y.shape == (2, 64, 64, 3)
    # channel independence: resizing channel 0 alone gives same result
    y0 = resize_bicubic(x[..., 0], (64, 64))
    np.testing.assert_allclose(np.asarray(y[..., 0]), np.asarray(y0), atol=1e-5)


def test_normalizers():
    x = jnp.asarray([[-120.0, -60.0], [-30.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(db_to_unit(x)), [[0.0, 0.5], [0.75, 1.0]]
    )
    z = z_score_normalize(x)
    assert abs(float(jnp.mean(z))) < 1e-6
    m = min_max_normalize(x)
    assert float(jnp.min(m)) == 0.0 and float(jnp.max(m)) == 1.0
    img = tile_channels(jnp.ones((2, 4, 4)))
    assert img.shape == (2, 4, 4, 3)
    n = imagenet_normalize(img)
    np.testing.assert_allclose(
        np.asarray(n[0, 0, 0]),
        (1 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]),
        rtol=1e-5,
    )


def test_augment_batch_shapes_and_gate():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((8, 96, 9))
    y = augment_batch(key, x, augment_prob=0.5)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # prob=0 is identity
    y0 = augment_batch(key, x, augment_prob=0.0)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))
    # prob=1 changes at least some samples
    y1 = augment_batch(key, x, augment_prob=1.0)
    assert np.abs(np.asarray(y1) - np.asarray(x)).max() > 0


def test_mode_filter_matches_sequential_on_stable_data():
    rng = np.random.default_rng(3)
    # piecewise-constant predictions with isolated glitches
    base = np.repeat(rng.integers(0, 19, (8, 6)), 5, axis=0)
    base[7, 2] = 18  # glitch
    got = np.asarray(mode_filter(jnp.asarray(base), window=3))
    want = mode_filter_sequential(base, window=3)
    np.testing.assert_array_equal(got, want)
    assert got[7, 2] != 18  # glitch removed


def test_mode_filter_short_input_passthrough():
    preds = jnp.asarray([[1, 2, 3, 4, 5, 6]])
    np.testing.assert_array_equal(np.asarray(mode_filter(preds)), np.asarray(preds))


def test_time_shift_zero_fill_semantics():
    from guitar_tablature_classification_tpu.ops import time_shift

    x = jnp.asarray(np.arange(1, 10, dtype=np.float32)[None, :].repeat(4, 0))
    x = x[None]  # [1, 4, 9] (F=4, T=9)
    # deterministic check across many keys: zeros appear at the correct end
    for seed in range(8):
        y = np.asarray(time_shift(jax.random.PRNGKey(seed), x, 0.4))[0]
        row = y[0]
        nz = np.nonzero(row)[0]
        if len(nz) == 0 or len(nz) == len(row):
            continue
        zeros = np.nonzero(row == 0)[0]
        # zero block must be contiguous at one end (reference zero fill)
        assert zeros[0] == 0 or zeros[-1] == len(row) - 1
        np.testing.assert_array_equal(zeros, np.arange(zeros[0], zeros[-1] + 1))


def test_masks_zero_correct_axis():
    from guitar_tablature_classification_tpu.ops import frequency_mask, time_mask

    x = jnp.ones((1, 96, 9))
    yf = np.asarray(frequency_mask(jax.random.PRNGKey(0), x, max_width=5))[0]
    zero_rows = np.nonzero((yf == 0).all(axis=1))[0]
    assert 1 <= len(zero_rows) <= 5  # a span of bins zeroed
    yt = np.asarray(time_mask(jax.random.PRNGKey(1), x, max_width=4))[0]
    zero_cols = np.nonzero((yt == 0).all(axis=0))[0]
    assert 1 <= len(zero_cols) <= 4  # a span of frames zeroed


def test_mode_filter_np_matches_jnp():
    """The host-side NumPy twin used by the streaming path must be
    bit-identical to the jitted mode_filter."""
    import numpy as np

    from guitar_tablature_classification_tpu.ops.smoothing import (
        mode_filter,
        mode_filter_np,
    )

    rng = np.random.default_rng(0)
    for t in (2, 3, 4, 7, 50):
        for w in (1, 3, 5):
            preds = rng.integers(0, 19, (t, 6)).astype(np.int32)
            got = mode_filter_np(preds, window=w)
            want = np.asarray(mode_filter(preds, window=w))
            np.testing.assert_array_equal(got, want, err_msg=f"t={t} w={w}")
