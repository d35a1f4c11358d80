"""Batched, jit-compiled CQT frontend for TPU.

Replaces the reference's per-segment CPU librosa loop (``cqt.py:36-63``:
one ``librosa.cqt`` call per 0.2 s window, thousands of calls per track)
with ONE fused device computation over a whole batch of windows:

    center-pad -> frame gather -> dense GEMM against the CQT filterbank
    (MXU) -> |.|**4 -> dB(ref=max) -> -60 dB noise gate  (all under jit).

The filterbank is precomputed at trace time (:mod:`.cqt_kernels`) and fed
as a device array, so the hot path is a single [B*T, K] x [K, 2F] matmul
plus cheap VPU elementwise math — XLA fuses the tail into the GEMM's
epilogue.  Numerics are validated against :func:`.cqt_kernels.cqt_reference`
in ``tests/test_cqt.py``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CQTConfig
from .cqt_kernels import CQTFilterbank, make_filterbank, n_frames_for


def reflect_index(num_samples: int, pad: int) -> np.ndarray:
    """Static gather indices implementing np.pad(mode='reflect') for any
    pad size (jnp.pad rejects pad >= length; CQT kernels are ~2.7x longer
    than a 0.2 s window, so that case is the norm here)."""
    if num_samples < 2:
        raise ValueError("reflect padding needs at least 2 samples")
    period = 2 * (num_samples - 1)
    j = np.arange(-pad, num_samples + pad, dtype=np.int64)
    jm = np.mod(j, period)
    return np.where(jm >= num_samples, period - jm, jm).astype(np.int32)


def auto_batch_block(padded_width: int, batch: int) -> int:
    """Rows per Pallas grid block for the fused CQT kernel.

    The filterbank (~25 MB for the training recipe) is re-streamed from
    HBM once per block, so bigger blocks cut that bandwidth linearly;
    the cap is the VMEM-resident audio slab (rows x padded width x 4 B,
    double-buffered).  Picks the largest power-of-two block <=64 whose
    slab stays <=8 MB — 32 rows for the 0.2 s training recipe (hardware
    sweep optimum: tools/probe_cqt_block.py; 64 is WORSE, VMEM pressure
    beats the bandwidth save), 8 for wide serving windows (3 s x
    22.05 kHz) — without padding tiny batches up to the block."""
    block = 8
    while (
        block < min(64, max(8, batch))
        # double only while the DOUBLED slab still fits the budget
        and padded_width * (block * 2) * 2 * 4 <= 8 * 2**20
    ):
        block *= 2
    return block


def split_geometry(
    fb: CQTFilterbank, cfg: CQTConfig, num_samples: int
) -> tuple[int, int, int, int, int] | None:
    """Static geometry for the zero-support split kernel
    (:func:`.cqt_pallas.cqt_fused_split`), or None when it doesn't apply:
    (split_bin, k_b, b_off, data_lo, data_hi).  Requires constant padding
    (the skipped k-tiles rely on structural zeros) and both column groups
    fitting a 128-lane block."""
    if cfg.pad_mode != "constant":
        return None
    n_bins = cfg.n_bins
    split = n_bins // 2
    if 2 * (n_bins - split) > 128 or 2 * split > 128:
        return None
    kw = fb.kernel_width
    # slab for bins [split:): longest is bin `split` (lengths decrease
    # with frequency); +2 covers the ceil(l/2)+floor(l/2) support rule
    k_b = ((int(fb.lengths[split]) + 2 + 511) // 512) * 512
    if k_b * 4 > kw:  # upper half not meaningfully shorter: no win
        return None
    b_off = kw // 2 - k_b // 2
    if b_off < 0 or b_off % 128:
        return None
    t = n_frames_for(num_samples, cfg.hop_length)
    pad = kw // 2
    data_lo = max(0, pad - (t - 1) * cfg.hop_length)
    data_hi = min(kw, pad + num_samples)
    return (split, k_b, b_off, data_lo, data_hi)


@functools.partial(
    jax.jit,
    static_argnames=(
        "hop_length", "n_bins", "magnitude_power", "amin", "top_db",
        "gate_threshold_db", "gate_floor_db", "precision", "use_pallas",
        "interpret", "batch_block", "split_geom",
    ),
)
def _cqt_windows_impl(
    x: jax.Array,
    kernels: jax.Array,
    pad_index: jax.Array | None,
    *,
    hop_length: int,
    n_bins: int,
    magnitude_power: float,
    amin: float,
    top_db: float,
    gate_threshold_db: float,
    gate_floor_db: float,
    precision: Any,
    use_pallas: bool = False,
    interpret: bool = False,
    batch_block: int | None = None,
    split_geom: tuple[int, int, int, int, int] | None = None,
) -> jax.Array:
    batch, num_samples = x.shape
    kernel_width = kernels.shape[0]
    t = n_frames_for(num_samples, hop_length)

    if pad_index is None:  # pad_mode='constant' (librosa 0.10 default)
        pad = kernel_width // 2
        padded = jnp.pad(x, ((0, 0), (pad, pad)))
    else:  # pad_mode='reflect' via static gather indices
        padded = jnp.take(x, pad_index, axis=-1)  # [B, W + 2*pad]
    if use_pallas:
        from .cqt_pallas import (
            cqt_fused,
            cqt_fused_split,
            cqt_fused_split_chunked,
        )

        block = (
            batch_block if batch_block is not None
            else auto_batch_block(padded.shape[1], batch)
        )
        pad_rows = (-batch) % block
        if pad_rows:
            padded = jnp.pad(padded, ((0, pad_rows), (0, 0)))
        common = dict(
            hop_length=hop_length, n_frames=t, n_bins=n_bins,
            magnitude_power=magnitude_power, amin=amin, top_db=top_db,
            gate_threshold_db=gate_threshold_db,
            gate_floor_db=gate_floor_db, batch_block=block,
            interpret=interpret, precision=precision,
        )
        if split_geom is not None:
            split_bin, k_b, b_off, data_lo, data_hi = split_geom
            # chunk-contraction layout (no in-kernel im2col stack) when
            # the hop is lane-aligned and divides the k-tile — measured
            # 1.5-1.8x over the stack-layout split kernel on v5e
            # (tools/probe_cqt_chunk.py; both recipes qualify)
            kernel_fn = (
                cqt_fused_split_chunked
                if hop_length % 128 == 0 and 2048 % hop_length == 0
                else cqt_fused_split
            )
            return kernel_fn(
                padded, kernels, split_bin=split_bin, k_b=k_b, b_off=b_off,
                data_lo=data_lo, data_hi=data_hi, **common,
            )[:batch]
        return cqt_fused(padded, kernels, **common)[:batch]
    else:
        # Static overlapping slices; XLA folds the views into GEMM reads.
        frames = jnp.stack(
            [
                padded[:, i * hop_length : i * hop_length + kernel_width]
                for i in range(t)
            ],
            axis=1,
        )  # [B, T, K]
        if precision == "bf16x3":
            # 3-pass bf16 hi/lo emulation of fp32 (see cqt_pallas._dot_any)
            from .cqt_pallas import split_bf16

            f_hi, f_lo = split_bf16(frames)
            k_hi, k_lo = split_bf16(kernels)
            ein = functools.partial(
                jnp.einsum, "btk,kf->btf",
                preferred_element_type=jnp.float32,
            )
            coeff = ein(f_hi, k_hi) + ein(f_hi, k_lo) + ein(f_lo, k_hi)
        else:
            coeff = jnp.einsum(
                "btk,kf->btf", frames, kernels, precision=precision,
                preferred_element_type=jnp.float32,
            )  # [B, T, 2F]
    re, im = coeff[..., :n_bins], coeff[..., n_bins:]
    mag2 = re * re + im * im
    s = mag2 ** (magnitude_power / 2.0)  # |CQT|**p  (p=4: cqt.py:56)

    # amplitude_to_db(ref=max) per window (cqt.py:57), then top_db clamp.
    ref = jnp.max(s, axis=(1, 2), keepdims=True)
    db = 20.0 * jnp.log10(jnp.maximum(amin, s)) - 20.0 * jnp.log10(
        jnp.maximum(amin, ref)
    )
    db = jnp.maximum(db, -top_db)  # max db == 0 by construction (ref=max)
    # cqt_lim noise gate (cqt.py:10-13).
    db = jnp.where(db < gate_threshold_db, gate_floor_db, db)
    return jnp.transpose(db, (0, 2, 1))  # [B, n_bins, T]


class CQTFrontend:
    """Callable CQT for fixed-length analysis windows.

    >>> frontend = CQTFrontend(CQTConfig())
    >>> feats = frontend(windows)   # [B, 8820] -> [B, 96, 9] float32 dB
    """

    def __init__(
        self,
        cfg: CQTConfig | None = None,
        *,
        precision: jax.lax.Precision | None = None,
        use_pallas: bool | None = None,
        pallas_interpret: bool = False,
    ):
        self.cfg = cfg or CQTConfig()
        self.filterbank: CQTFilterbank = make_filterbank(self.cfg)
        self.kernels = jnp.asarray(self.filterbank.stacked())  # [K, 2F]
        if precision is None:  # CQTConfig.precision
            precision = {
                "highest": jax.lax.Precision.HIGHEST,
                "bf16x3": "bf16x3",  # 3-pass hi/lo split (~fp32, 2x rate)
                "default": jax.lax.Precision.DEFAULT,
            }[getattr(self.cfg, "precision", "highest")]
        self.precision = precision
        if use_pallas is None:  # auto: Mosaic kernels need a real TPU
            from .cqt_pallas import supports_pallas

            use_pallas = supports_pallas()
        self.use_pallas = use_pallas
        self.pallas_interpret = pallas_interpret
        self.gemm_split = getattr(self.cfg, "gemm_split", "auto")
        self._pad_index: dict[int, np.ndarray] = {}
        self._split_geom: dict[int, tuple | None] = {}

    @property
    def n_frames(self) -> int:
        return self.cfg.n_frames

    def output_shape(self, num_samples: int | None = None) -> tuple[int, int]:
        n = num_samples if num_samples is not None else self.cfg.window_samples
        return (self.cfg.n_bins, n_frames_for(n, self.cfg.hop_length))

    def _split_for(self, num_samples: int) -> tuple | None:
        """Zero-support split geometry for this window length (cached
        NumPy-free static tuple; see :func:`split_geometry`)."""
        if not self.use_pallas or self.gemm_split == "off":
            return None
        if num_samples not in self._split_geom:
            geom = split_geometry(self.filterbank, self.cfg, num_samples)
            if geom is None and self.gemm_split == "on":
                raise ValueError(
                    "CQTConfig.gemm_split='on' but the split geometry "
                    "does not apply to this recipe"
                )
            self._split_geom[num_samples] = geom
        return self._split_geom[num_samples]

    def _index_for(self, num_samples: int) -> np.ndarray | None:
        if self.cfg.pad_mode == "constant":
            return None  # zero-pad happens inside the jitted impl
        # Cache NumPy (not device arrays): __call__ may run inside an outer
        # jit trace, where caching a traced constant would leak tracers.
        idx = self._pad_index.get(num_samples)
        if idx is None:
            idx = reflect_index(num_samples, self.filterbank.kernel_width // 2)
            self._pad_index[num_samples] = idx
        return idx

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, num_samples] (or [num_samples]) audio at cfg.sample_rate.
        Returns [B, n_bins, n_frames] float32 dB features."""
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        if x.ndim != 2:
            raise ValueError(f"expected [B, N] audio, got shape {x.shape}")
        cfg = self.cfg
        out = _cqt_windows_impl(
            x.astype(jnp.float32),
            self.kernels,
            self._index_for(x.shape[-1]),
            hop_length=cfg.hop_length,
            n_bins=cfg.n_bins,
            magnitude_power=cfg.magnitude_power,
            amin=cfg.amin,
            top_db=cfg.top_db,
            gate_threshold_db=cfg.gate_threshold_db,
            gate_floor_db=cfg.gate_floor_db,
            precision=self.precision,
            use_pallas=self.use_pallas,
            interpret=self.pallas_interpret,
            batch_block=getattr(cfg, "batch_block", None),
            split_geom=self._split_for(x.shape[-1]),
        )
        return out[0] if squeeze else out
