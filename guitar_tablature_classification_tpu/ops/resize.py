"""Device-side bicubic resize as separable MXU matmuls.

Replaces the reference's CPU resizes — ``F.interpolate(..., 'bicubic',
align_corners=False)`` (ViT_dataloader.py:42-47) and PIL/torchvision
``Resize(224)`` (my_dataloader.py:17-21) — with precomputed interpolation
matrices applied as two matmuls: ``out = R_h @ x @ R_w^T``.  Resizing a
whole batch is then two GEMMs, fused with the surrounding normalize ops
under jit, instead of a per-item CPU loop in DataLoader workers.

``a=-0.75`` reproduces torch's bicubic kernel; ``a=-0.5`` is the
PIL/Catmull-Rom variant.  For the upscales used here (96x9 -> 224x224)
PIL's antialias prefiltering is inactive, so both paths are pure kernel
interpolation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    ax = np.abs(x)
    return np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(
            ax < 2.0,
            a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a,
            0.0,
        ),
    )


@functools.lru_cache(maxsize=64)
def resize_matrix(in_size: int, out_size: int, a: float = -0.75) -> np.ndarray:
    """[out_size, in_size] bicubic interpolation matrix
    (align_corners=False source-center mapping, edge-clamped taps)."""
    scale = in_size / out_size
    out = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        base = int(np.floor(src))
        taps = np.arange(base - 1, base + 3)
        w = _cubic_kernel(src - taps, a)
        w = w / w.sum()
        np.add.at(out[i], np.clip(taps, 0, in_size - 1), w)
    return out.astype(np.float32)


def resize_bicubic(
    x: jax.Array,
    out_hw: tuple[int, int],
    *,
    channels_last: bool = False,
    a: float = -0.75,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Bicubic-resize spatial dims: x is [..., H, W] or, with
    ``channels_last``, [..., H, W, C]."""
    if channels_last:
        h_axis, w_axis = x.ndim - 3, x.ndim - 2
    else:
        h_axis, w_axis = x.ndim - 2, x.ndim - 1
    rh = jnp.asarray(resize_matrix(x.shape[h_axis], out_hw[0], a))
    rw = jnp.asarray(resize_matrix(x.shape[w_axis], out_hw[1], a))
    x = jnp.tensordot(x, rh.T, axes=[[h_axis], [0]], precision=precision)
    # tensordot moved H to the last axis; W shifted left by one.
    x = jnp.moveaxis(x, -1, h_axis)
    x = jnp.tensordot(x, rw.T, axes=[[w_axis], [0]], precision=precision)
    x = jnp.moveaxis(x, -1, w_axis)
    return x
