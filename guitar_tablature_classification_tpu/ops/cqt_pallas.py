"""Pallas TPU kernel for the CQT frame-GEMM.

The XLA path (:mod:`.cqt`) materializes the im2col frame tensor
[B, T, kernel_width] in HBM — at hop 1024 and kernel_width 23552 each
input sample is re-read ~23x.  This kernel keeps each padded window
resident in VMEM and builds the T=9 overlapping frame views on-chip, so
HBM sees each input byte once plus one pass over the filterbank:

  grid = (batch_blocks, k_tiles)
  VMEM: padded audio block [BB, P] (constant across k_tiles -> fetched
        once), filterbank tile [KT, 2F] (streamed), accumulator
        [BB, T, 2F] (revisited across k_tiles).

:func:`cqt_frame_gemm` returns raw coefficients (epilogue in XLA);
:func:`cqt_fused` additionally runs the full reference epilogue —
|.|^4 -> dB(ref=max) -> top_db clamp -> -60 dB gate (cqt.py:55-58) —
inside the kernel on the VMEM-resident accumulator, so one pallas_call
maps raw padded audio to finished dB features.  Numerics match the XLA
path exactly (tested on hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def split_bf16(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """fp32 -> (hi, lo) bf16 pair with hi + lo == fp32 to ~16 mantissa
    bits (hi keeps the top 8, lo the next 8)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mxu_passes(precision) -> int:
    """bf16 MXU passes per dot for the cost estimate: HIGHEST emulates
    fp32 with 6 passes, bf16x3 issues 3, DEFAULT is a single pass."""
    if precision == "bf16x3":
        return 3
    if precision in (jax.lax.Precision.HIGHEST, "highest"):
        return 6
    return 1


def _stream_dtype(precision):
    """HBM-resident operand dtype for the GEMM inputs.

    The DEFAULT tier's single MXU pass reads bf16 operands regardless of
    the stored dtype, so streaming audio + filterbank as bf16 halves the
    HBM traffic and the VMEM slab footprint for free (accumulation stays
    f32; the epilogue is untouched).  HIGHEST / bf16x3 need the full f32
    mantissa in VMEM and keep f32 streaming."""
    if precision in (jax.lax.Precision.DEFAULT, "default"):
        return jnp.bfloat16
    return jnp.float32


def _column_groups(
    kernels, n_bins, split_bin, k_tile, data_lo, data_hi, b_lo, b_width,
    f_pad,
):
    """Column-group slabs shared by the split kernels.

    Returns ``(ka, kb, s_mat, jlo, jhi)``: the group-A slab (re|im of
    bins [0, split) packed to 128 lanes, restricted to the k-tiles
    intersecting [data_lo, data_hi)), the group-B slab (re|im of bins
    [split, n_bins) over rows [b_lo, b_lo + b_width), zero-padded past
    the filterbank's end), and the 0/1 re-alignment matrix summing each
    bin's re^2 + im^2 into bin-indexed lane-aligned columns.
    """
    kw = kernels.shape[0]
    nb_a = split_bin
    nb_b = n_bins - split_bin
    jlo = data_lo // k_tile
    jhi = -(-data_hi // k_tile)  # ceil
    ka = jnp.concatenate(
        [
            jnp.pad(kernels[:, :nb_a], ((0, 0), (0, 64 - nb_a)))
            if nb_a < 64 else kernels[:, :nb_a],
            jnp.pad(kernels[:, n_bins : n_bins + nb_a],
                    ((0, 0), (0, 64 - nb_a)))
            if nb_a < 64 else kernels[:, n_bins : n_bins + nb_a],
        ],
        axis=1,
    )  # [kw, <=128]
    ka = jnp.pad(ka, ((0, max(0, jhi * k_tile - kw)), (0, 128 - ka.shape[1])))
    ka = ka[jlo * k_tile : jhi * k_tile]

    kb = jnp.concatenate(
        [
            jnp.pad(kernels[b_lo : b_lo + b_width, nb_a : n_bins],
                    ((0, 0), (0, 64 - nb_b))),
            jnp.pad(kernels[b_lo : b_lo + b_width, n_bins + nb_a :],
                    ((0, 0), (0, 64 - nb_b))),
        ],
        axis=1,
    )  # [<=b_width, 128]
    if kb.shape[0] < b_width:  # slab ran past kw: keep stored zeros
        kb = jnp.pad(kb, ((0, b_width - kb.shape[0]), (0, 0)))

    s_np = np.zeros((256, f_pad), np.float32)
    for c in range(nb_a):
        s_np[c, c] = 1.0          # A re
        s_np[64 + c, c] = 1.0     # A im
    for c in range(nb_b):
        s_np[128 + c, nb_a + c] = 1.0        # B re
        s_np[128 + 64 + c, nb_a + c] = 1.0   # B im
    return ka, kb, jnp.asarray(s_np), jlo, jhi


def _dot_any(frames, ktile, dims, precision, k_split=None):
    """dot_general with fp32 accumulation at the requested precision.

    precision == "bf16x3" emulates ~fp32 with THREE default-precision bf16
    MXU passes (hi*hi + hi*lo + lo*hi; the lo*lo term is below 2^-16
    relative and dropped) — Mosaic rejects lax.Precision.HIGH, so the
    3-pass middle point between HIGHEST (6 passes) and DEFAULT (1 pass)
    needs this manual split.  k_split optionally supplies a precomputed
    (k_hi, k_lo) pair so loop-invariant operands split once.
    """
    if precision == "bf16x3":
        f_hi, f_lo = split_bf16(frames)
        k_hi, k_lo = k_split if k_split is not None else split_bf16(ktile)

        def d(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )

        return d(f_hi, k_hi) + d(f_hi, k_lo) + d(f_lo, k_hi)
    return jax.lax.dot_general(
        frames, ktile, dimension_numbers=dims,
        preferred_element_type=jnp.float32, precision=precision,
    )


@functools.partial(
    jax.jit,
    static_argnames=("hop_length", "n_frames", "batch_block", "k_tile",
                     "interpret", "precision"),
)
def cqt_frame_gemm(
    padded: jax.Array,
    kernels: jax.Array,
    *,
    hop_length: int,
    n_frames: int,
    batch_block: int = 16,
    k_tile: int = 2048,
    interpret: bool = False,
    precision: jax.lax.Precision | str = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """padded [B, P] fp32, kernels [Kw, 2F] fp32 -> coefficients
    [B, n_frames, 2F] fp32 (real block | imag block).

    Requires B % batch_block == 0 and P >= (n_frames-1)*hop + Kw_padded
    (the wrapper in :class:`.cqt.CQTFrontend` arranges both).
    """
    b, p = padded.shape
    kw, two_f = kernels.shape
    if b % batch_block:
        raise ValueError(f"batch {b} not divisible by block {batch_block}")
    kw_pad = _round_up(kw, k_tile)
    if kw_pad != kw:
        kernels = jnp.pad(kernels, ((0, kw_pad - kw), (0, 0)))
    need = (n_frames - 1) * hop_length + kw_pad
    if p < need:
        padded = jnp.pad(padded, ((0, 0), (0, need - p)))
    sd = _stream_dtype(precision)
    padded = padded.astype(sd)
    kernels = kernels.astype(sd)
    k_tiles = kw_pad // k_tile
    t = n_frames

    frame_tile = min(t, 16)  # bound the [BB, FT, KT] stack's VMEM footprint

    def kernel(x_ref, k_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        ktile = k_ref[:]  # [KT, 2F]
        k_split = split_bf16(ktile) if precision == "bf16x3" else None
        base = j * k_tile
        for c in range(0, t, frame_tile):
            tc = min(frame_tile, t - c)
            frames = jnp.stack(
                [
                    x_ref[:, pl.ds(base + (c + i) * hop_length, k_tile)]
                    for i in range(tc)
                ],
                axis=1,
            )  # [BB, tc, KT]
            out_ref[:, c : c + tc, :] += _dot_any(
                frames, ktile, (((2,), (0,)), ((), ())),
                precision,  # HIGHEST = true-fp32 MXU passes (default)
                k_split=k_split,
            )

    grid = (b // batch_block, k_tiles)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_block, padded.shape[1]),
                lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k_tile, two_f), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (batch_block, t, two_f), lambda i, j: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, two_f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * kw_pad * two_f * _mxu_passes(precision),
            bytes_accessed=(
                padded.size * padded.dtype.itemsize
                + kernels.size * kernels.dtype.itemsize
                + b * t * two_f * 4
            ),
            transcendentals=0,
        ),
        # large batch blocks (audio block + frame stack) exceed the
        # default 16 MB scoped-vmem limit; v5e has headroom above it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(padded, kernels)


@functools.partial(
    jax.jit,
    static_argnames=(
        "hop_length", "n_frames", "n_bins", "magnitude_power", "amin",
        "top_db", "gate_threshold_db", "gate_floor_db", "batch_block",
        "k_tile", "interpret", "precision",
    ),
)
def cqt_fused(
    padded: jax.Array,
    kernels: jax.Array,
    *,
    hop_length: int,
    n_frames: int,
    n_bins: int,
    magnitude_power: float,
    amin: float,
    top_db: float,
    gate_threshold_db: float,
    gate_floor_db: float,
    batch_block: int = 16,
    k_tile: int = 2048,
    interpret: bool = False,
    precision: jax.lax.Precision | str = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """padded [B, P] fp32, kernels [Kw, 2F] -> gated dB features
    [B, n_bins, n_frames] — frames, GEMM and the full cqt.py:55-58
    epilogue in one kernel.

    Mosaic layout notes: the real/imag halves are re-packed to 128-lane
    alignment (f_pad = round_up(n_bins, 128)) so the epilogue's slices
    stay lane-aligned, and the kernel writes frames-major [BB, T, F] —
    the tiny [B, T, F] -> [B, F, T] transpose happens in XLA afterwards.
    """
    b, p = padded.shape
    kw, two_f = kernels.shape
    if two_f != 2 * n_bins:
        raise ValueError(f"kernels last dim {two_f} != 2 * n_bins {n_bins}")
    if b % batch_block:
        raise ValueError(f"batch {b} not divisible by block {batch_block}")
    f_pad = _round_up(n_bins, 128)
    # re-pack [Kw, re|im] -> lane-aligned [Kw, re_pad | im_pad]
    kernels = jnp.concatenate(
        [
            jnp.pad(kernels[:, :n_bins], ((0, 0), (0, f_pad - n_bins))),
            jnp.pad(kernels[:, n_bins:], ((0, 0), (0, f_pad - n_bins))),
        ],
        axis=1,
    )
    kw_pad = _round_up(kw, k_tile)
    if kw_pad != kw:
        kernels = jnp.pad(kernels, ((0, kw_pad - kw), (0, 0)))
    need = (n_frames - 1) * hop_length + kw_pad
    if p < need:
        padded = jnp.pad(padded, ((0, 0), (0, need - p)))
    sd = _stream_dtype(precision)
    padded = padded.astype(sd)
    kernels = kernels.astype(sd)
    k_tiles = kw_pad // k_tile
    t = n_frames

    frame_tile = min(t, 16)  # bound the [BB, FT, KT] stack's VMEM footprint

    def kernel(x_ref, k_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        ktile = k_ref[:]
        k_split = split_bf16(ktile) if precision == "bf16x3" else None
        for c in range(0, t, frame_tile):
            tc = min(frame_tile, t - c)
            frames = jnp.stack(
                [
                    x_ref[:, pl.ds(j * k_tile + (c + i) * hop_length, k_tile)]
                    for i in range(tc)
                ],
                axis=1,
            )  # [BB, tc, KT]
            acc_ref[:, c : c + tc, :] += _dot_any(
                frames, ktile, (((2,), (0,)), ((), ())),
                precision, k_split=k_split,
            )

        @pl.when(j == k_tiles - 1)
        def _epilogue():
            re = acc_ref[:, :, :f_pad]
            im = acc_ref[:, :, f_pad:]
            mag2 = re * re + im * im
            s = mag2 ** (magnitude_power / 2.0)  # |CQT|**p
            # per-sample max; chained single-axis reduces — Mosaic's layout
            # inference rejects multi-axis keepdims reductions on 3D vectors
            ref = jnp.max(jnp.max(s, axis=2, keepdims=True), axis=1,
                          keepdims=True)
            db = 20.0 * jnp.log10(jnp.maximum(amin, s)) - 20.0 * jnp.log10(
                jnp.maximum(amin, ref)
            )
            db = jnp.maximum(db, -top_db)
            db = jnp.where(db < gate_threshold_db, gate_floor_db, db)
            out_ref[:] = db  # [BB, T, F_pad], frames-major

    grid = (b // batch_block, k_tiles)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_block, padded.shape[1]), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k_tile, 2 * f_pad), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (batch_block, t, f_pad), lambda i, j: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, f_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((batch_block, t, 2 * f_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * kw_pad * 2 * f_pad * _mxu_passes(precision),
            bytes_accessed=(
                padded.size * padded.dtype.itemsize
                + kernels.size * kernels.dtype.itemsize
                + b * t * f_pad * 4
            ),
            transcendentals=b * t * f_pad,
        ),
        # large batch blocks (audio block + frame stack) exceed the
        # default 16 MB scoped-vmem limit; v5e has headroom above it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(padded, kernels)
    return jnp.transpose(out[:, :, :n_bins], (0, 2, 1))  # [B, F, T]


@functools.partial(
    jax.jit,
    static_argnames=(
        "hop_length", "n_frames", "n_bins", "magnitude_power", "amin",
        "top_db", "gate_threshold_db", "gate_floor_db", "batch_block",
        "k_tile", "interpret", "precision",
        "split_bin", "k_b", "b_off", "data_lo", "data_hi",
    ),
)
def cqt_fused_split(
    padded: jax.Array,
    kernels: jax.Array,
    *,
    hop_length: int,
    n_frames: int,
    n_bins: int,
    magnitude_power: float,
    amin: float,
    top_db: float,
    gate_threshold_db: float,
    gate_floor_db: float,
    split_bin: int,
    k_b: int,
    b_off: int,
    data_lo: int,
    data_hi: int,
    batch_block: int = 16,
    k_tile: int = 2048,
    interpret: bool = False,
    precision: jax.lax.Precision | str = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """:func:`cqt_fused` exploiting the filterbank's exact-zero structure.

    Two stored-zero families dominate the dense GEMM (~2.2x of its work
    for the 0.2 s training recipe):

    1. **Kernel support**: bin b's wavelet occupies only ``Q*sr/f_b``
       centered rows of the [Kw, 2F] slab — the upper half of the bins
       (``split_bin:``) all fit in a short centered slab of ``k_b`` rows
       (16x shorter than Kw for the training recipe), so their columns
       get their own single-tile GEMM (group B) instead of riding the
       full k-tile loop.
    2. **Audio padding**: with ``pad_mode='constant'`` every kernel row
       outside [data_lo, data_hi) multiplies structural zeros for every
       frame, so the group-A k-tile grid shrinks to the tiles
       intersecting the real-data span (12 -> 10 tiles at 0.2 s).

    Only terms that are exactly zero are dropped — the math per output
    coefficient is identical to the dense kernel up to fp32 summation
    regrouping (HIGHEST-precision parity vs the dense path is asserted in
    tests/test_cqt.py).  Column groups are re-packed to 128-lane blocks
    (A = re|im of bins [0, split), B = re|im of [split, n_bins)) and the
    squared accumulator is re-aligned to bin columns with a 0/1 matmul so
    every in-kernel slice stays lane-aligned (Mosaic requirement).
    """
    b, p = padded.shape
    kw, two_f = kernels.shape
    if two_f != 2 * n_bins:
        raise ValueError(f"kernels last dim {two_f} != 2 * n_bins {n_bins}")
    if b % batch_block:
        raise ValueError(f"batch {b} not divisible by block {batch_block}")
    if 2 * split_bin > 128 or 2 * (n_bins - split_bin) > 128:
        raise ValueError(f"split {split_bin} of {n_bins} exceeds 128 lanes")
    f_pad = _round_up(n_bins, 128)
    # group-A slab restricted to real-audio k-tiles; group-B slab over
    # the centered k_b rows; 0/1 re-alignment matrix (see _column_groups)
    ka, kb, s_mat, jlo, jhi = _column_groups(
        kernels, n_bins, split_bin, k_tile, data_lo, data_hi, b_off, k_b,
        f_pad,
    )
    k_tiles = jhi - jlo

    need = (n_frames - 1) * hop_length + max(jhi * k_tile, b_off + k_b)
    if p < need:
        padded = jnp.pad(padded, ((0, 0), (0, need - p)))
    sd = _stream_dtype(precision)
    padded = padded.astype(sd)
    ka = ka.astype(sd)
    kb = kb.astype(sd)
    t = n_frames
    frame_tile = min(t, 16)
    base0 = jlo * k_tile  # static row offset of the restricted A slab

    def kernel(x_ref, ka_ref, kb_ref, s_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        katile = ka_ref[:]
        ka_split = split_bf16(katile) if precision == "bf16x3" else None
        for c in range(0, t, frame_tile):
            tc = min(frame_tile, t - c)
            frames = jnp.stack(
                [
                    x_ref[:, pl.ds(
                        base0 + j * k_tile + (c + i) * hop_length, k_tile
                    )]
                    for i in range(tc)
                ],
                axis=1,
            )  # [BB, tc, KT]
            acc_ref[:, c : c + tc, 0:128] += _dot_any(
                frames, katile, (((2,), (0,)), ((), ())),
                precision, k_split=ka_split,
            )

        @pl.when(j == 0)
        def _group_b():
            kbt = kb_ref[:]
            kb_split = split_bf16(kbt) if precision == "bf16x3" else None
            for c in range(0, t, frame_tile):
                tc = min(frame_tile, t - c)
                frames_b = jnp.stack(
                    [
                        x_ref[:, pl.ds(b_off + (c + i) * hop_length, k_b)]
                        for i in range(tc)
                    ],
                    axis=1,
                )  # [BB, tc, k_b]
                acc_ref[:, c : c + tc, 128:256] += _dot_any(
                    frames_b, kbt, (((2,), (0,)), ((), ())),
                    precision, k_split=kb_split,
                )

        @pl.when(j == k_tiles - 1)
        def _epilogue():
            sq = acc_ref[:] * acc_ref[:]  # [BB, T, 256]
            # re-align squared columns to bins: exact 0/1 sums (HIGHEST
            # keeps the fp32 values intact through the MXU)
            mag2 = jax.lax.dot_general(
                sq, s_ref[:], (((2,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [BB, T, f_pad]
            s = mag2 ** (magnitude_power / 2.0)
            ref = jnp.max(jnp.max(s, axis=2, keepdims=True), axis=1,
                          keepdims=True)
            db = 20.0 * jnp.log10(jnp.maximum(amin, s)) - 20.0 * jnp.log10(
                jnp.maximum(amin, ref)
            )
            db = jnp.maximum(db, -top_db)
            db = jnp.where(db < gate_threshold_db, gate_floor_db, db)
            out_ref[:] = db  # [BB, T, F_pad], frames-major

    grid = (b // batch_block, k_tiles)
    passes = _mxu_passes(precision)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_block, padded.shape[1]), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k_tile, 128), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k_b, 128), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (256, f_pad), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (batch_block, t, f_pad), lambda i, j: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, f_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((batch_block, t, 256), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * (k_tiles * k_tile + k_b) * 128 * passes,
            bytes_accessed=(
                padded.size * padded.dtype.itemsize
                + (ka.size + kb.size) * ka.dtype.itemsize
                + b * t * f_pad * 4
            ),
            transcendentals=b * t * f_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(padded, ka, kb, s_mat)
    return jnp.transpose(out[:, :, :n_bins], (0, 2, 1))  # [B, F, T]


@functools.partial(
    jax.jit,
    static_argnames=(
        "hop_length", "n_frames", "n_bins", "magnitude_power", "amin",
        "top_db", "gate_threshold_db", "gate_floor_db", "batch_block",
        "k_tile", "interpret", "precision",
        "split_bin", "k_b", "b_off", "data_lo", "data_hi",
    ),
)
def cqt_fused_split_chunked(
    padded: jax.Array,
    kernels: jax.Array,
    *,
    hop_length: int,
    n_frames: int,
    n_bins: int,
    magnitude_power: float,
    amin: float,
    top_db: float,
    gate_threshold_db: float,
    gate_floor_db: float,
    split_bin: int,
    k_b: int,
    b_off: int,
    data_lo: int,
    data_hi: int,
    batch_block: int = 16,
    k_tile: int = 2048,
    interpret: bool = False,
    precision: jax.lax.Precision | str = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """:func:`cqt_fused_split` with a chunk-contraction audio layout that
    eliminates the in-kernel im2col stack.

    The stack-layout kernels spend most of their time building the
    [BB, T, KT] frame stack in VMEM (T=9 overlapping copies of every
    audio byte; measured: the fused split kernel is flat across batch
    blocks and ~10x above its bandwidth+FLOP floor).  Because
    ``hop_length`` divides ``k_tile``, frame t's rows [t*hop + c*hop,
    t*hop + (c+1)*hop) of filterbank chunk c are audio chunk ``t + c``
    — so with the padded audio pre-shaped to [C, B, hop] (chunks
    OUTERMOST, a layout-free producer fusion in XLA), each filterbank
    chunk contracts directly against the ref slice ``x[c : c + T]``:

      acc[t, bb, f] += sum_r x3[c + t, bb, r] * K[c*hop + r, f]

    No copies, M = T*BB GEMM rows, and outer-dim slices are free in
    Mosaic's (sublane, lane) tiling.  Requires hop_length % 128 == 0
    (lane alignment) and k_tile % hop_length == 0; the group-B slab is
    chunk-realigned (b_off/k_b rounded out to hop multiples — the extra
    rows multiply stored zeros only, so parity is unchanged).
    Accumulation regroups the k-sum at hop granularity instead of
    k_tile granularity (pure f32 summation reordering, same class as
    the split kernel's tolerance vs the dense kernel).
    """
    b, p = padded.shape
    kw, two_f = kernels.shape
    h = hop_length
    if two_f != 2 * n_bins:
        raise ValueError(f"kernels last dim {two_f} != 2 * n_bins {n_bins}")
    if b % batch_block:
        raise ValueError(f"batch {b} not divisible by block {batch_block}")
    if h % 128 or k_tile % h:
        raise ValueError(
            f"chunked layout needs hop % 128 == 0 and k_tile % hop == 0 "
            f"(hop {h}, k_tile {k_tile})"
        )
    if 2 * split_bin > 128 or 2 * (n_bins - split_bin) > 128:
        raise ValueError(f"split {split_bin} of {n_bins} exceeds 128 lanes")
    f_pad = _round_up(n_bins, 128)
    cph = k_tile // h  # chunks per group-A k-tile

    # group-B slab, chunk-realigned: [b_off, b_off + k_b) rounded out to
    # hop multiples.  The added rows hold stored zeros (outside the
    # support of every group-B wavelet), so only 0-terms join the sum.
    b_off_c = (b_off // h) * h
    k_b_c = _round_up(b_off + k_b - b_off_c, h)
    ka, kb, s_mat, jlo, jhi = _column_groups(
        kernels, n_bins, split_bin, k_tile, data_lo, data_hi,
        b_off_c, k_b_c, f_pad,
    )
    k_tiles = jhi - jlo

    t = n_frames
    need = (t - 1) * h + max(jhi * k_tile, b_off_c + k_b_c)
    c_all = -(-need // h)
    if p < c_all * h:
        padded = jnp.pad(padded, ((0, 0), (0, c_all * h - p)))
    sd = _stream_dtype(precision)
    # chunks OUTERMOST: XLA fuses pad+reshape+transpose into the single
    # producer write the stack layout also needs — no extra HBM pass.
    x3 = jnp.transpose(
        padded[:, : c_all * h].astype(sd).reshape(b, c_all, h), (1, 0, 2)
    )  # [C, B, h]
    ka = ka.astype(sd)
    kb = kb.astype(sd)
    ca0 = (jlo * k_tile) // h  # first group-A chunk
    cb0 = b_off_c // h         # first group-B chunk

    def kernel(x_ref, ka_ref, kb_ref, s_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        katile = ka_ref[:]  # [k_tile, 128]
        ka_split = split_bf16(katile) if precision == "bf16x3" else None
        for d in range(cph):
            # frames 0..T-1 of filterbank chunk (j*cph + d): audio chunks
            # [ca0 + j*cph + d, +T) — static outer-dim slice, no copy
            c0 = ca0 + j * cph + d
            xs = x_ref[pl.ds(c0, t)]  # [T, BB, h]
            kd = katile[d * h : (d + 1) * h, :]
            kd_split = (
                (ka_split[0][d * h : (d + 1) * h, :],
                 ka_split[1][d * h : (d + 1) * h, :])
                if ka_split is not None else None
            )
            acc_ref[:, :, 0:128] += _dot_any(
                xs, kd, (((2,), (0,)), ((), ())),
                precision, k_split=kd_split,
            )

        @pl.when(j == 0)
        def _group_b():
            kbt = kb_ref[:]  # [k_b_c, 128]
            kb_split = split_bf16(kbt) if precision == "bf16x3" else None
            for d in range(k_b_c // h):
                kd = kbt[d * h : (d + 1) * h, :]
                kd_split = (
                    (kb_split[0][d * h : (d + 1) * h, :],
                     kb_split[1][d * h : (d + 1) * h, :])
                    if kb_split is not None else None
                )
                acc_ref[:, :, 128:256] += _dot_any(
                    x_ref[cb0 + d : cb0 + d + t], kd,
                    (((2,), (0,)), ((), ())),
                    precision, k_split=kd_split,
                )

        @pl.when(j == k_tiles - 1)
        def _epilogue():
            sq = acc_ref[:] * acc_ref[:]  # [T, BB, 256]
            mag2 = jax.lax.dot_general(
                sq, s_ref[:], (((2,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [T, BB, f_pad]
            s = mag2 ** (magnitude_power / 2.0)
            ref = jnp.max(jnp.max(s, axis=2, keepdims=True), axis=0,
                          keepdims=True)  # per-sample max over (T, F)
            db = 20.0 * jnp.log10(jnp.maximum(amin, s)) - 20.0 * jnp.log10(
                jnp.maximum(amin, ref)
            )
            db = jnp.maximum(db, -top_db)
            db = jnp.where(db < gate_threshold_db, gate_floor_db, db)
            out_ref[:] = db  # [T, BB, F_pad]

    grid = (b // batch_block, k_tiles)
    passes = _mxu_passes(precision)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (c_all, batch_block, h), lambda i, j: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k_tile, 128), lambda i, j: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k_b_c, 128), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (256, f_pad), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (t, batch_block, f_pad), lambda i, j: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, b, f_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t, batch_block, 256), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * (k_tiles * k_tile + k_b_c) * 128 * passes,
            bytes_accessed=(
                x3.size * x3.dtype.itemsize
                + (ka.size + kb.size) * ka.dtype.itemsize
                + b * t * f_pad * 4
            ),
            transcendentals=b * t * f_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x3, ka, kb, s_mat)
    return jnp.transpose(out, (1, 2, 0))[:, :n_bins]  # [B, F, T]


def supports_pallas() -> bool:
    """True when running on a real TPU backend (Mosaic lowering)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
