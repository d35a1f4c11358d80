"""Fused ResNet stem tail for the NATIVE (96x9) geometry.

``resnet18_native`` feeds the raw CQT straight into the backbone, so its
stem runs conv1 7x7/s2 on a [B, 96, 9, 1] input -> y [B, 48, 5, 64],
then BN + ReLU + 3x3/s2 max-pool -> [B, 24, 3, 64].  The round-4
per-stage attribution (DESIGN.md, tools/profile_native_pieces.py) shows
this stem is 22 % of the native full step and HBM-bound: y is 250 MB at
B=8192 and XLA crosses HBM separately for BN stats, BN apply, pool
forward and the pool/BN backward.  These kernels fuse the tail into one
stats pass + one apply/pool pass forward and one pass backward — the
same design as the 224-square :mod:`.stem_pallas`, re-derived for the
non-square odd-width native geometry where the quadrant layout does not
apply (its column-parity lane split requires W == H and even W).

Layout: conv1 is evaluated as TWO stride-(4, 2) convolutions sharing
the same kernel parameter (:func:`conv1_parity_native`) — one producing
the even output rows, one the odd rows — so the row-parity planes
``ye``/``yo`` [B, H2, L] (L = Wp*C) arrive as separate arrays with zero
repacking traffic.  A 3x3 stride-2 max-pool window around output row i
then reads rows {2i-1, 2i, 2i+1} = {O[i-1], E[i], O[i]} — unit sublane
shifts — while the column neighbours {w-1, w+1} are lane rotates by
``±C`` (``pltpu.roll``) with iota edge masks: no strided slicing, no
``reduce_window``, no ``select_and_scatter``.  ``Wp`` may carry one
extra conv output column (lane width 6*64 = 384 = 3 tiles) whose values
are masked out of the pool, the batch statistics and the gradients, so
results and the training trajectory are bit-comparable to the plain
(3, 3)-padded conv path.

The forward/backward cores are shared verbatim between the Pallas
kernels and a pure-XLA twin (``impl='xla'``) — the CPU test oracle and
no-Mosaic fallback.

Reference semantics covered: torchvision ``maxpool(relu(bn1(conv1(x))))``
(bestengine.py:23, torchvision resnet.py) at the native input geometry
(a TPU-first extension — the reference always upsamples to 224-square).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stem_pallas import (
    _chain_sum,
    _mosaic_roll,
    _pick_bt,
    _resolve_impl,
    _row_down,
    _row_up,
    _xla_roll,
)

_NEG = -1.0  # below every post-ReLU value: stands in for -inf pool pad


def stem_geometry(h: int, w: int) -> tuple[int, int]:
    """(H2, Wy) of the parity planes for a [H, W] input through
    conv1 7x7/s2 pad 3 (torchvision arithmetic)."""
    hy = (h + 6 - 7) // 2 + 1
    wy = (w + 6 - 7) // 2 + 1
    if hy % 2:
        raise ValueError(f"conv1 output height {hy} must be even (H={h})")
    return hy // 2, wy


def conv1_parity_native(
    x: jax.Array,
    kernel: jax.Array,
    *,
    w_pad: int = 1,
    dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """conv1 7x7/s2 evaluated as two stride-(4, 2) convs -> row-parity
    planes (ye, yo), each [B, H2, (Wy + w_pad) * C].

    ``ye[b, i] == conv(x)[b, 2i]`` and ``yo[b, i] == conv(x)[b, 2i+1]``
    exactly (same kernel parameter, same taps: output row h of the
    stride-2 conv covers input rows [2h-3, 2h+3], so even rows are a
    stride-4 conv padded (3, ·) and odd rows one padded (1, ·)).  With
    ``w_pad=1`` the width is over-padded to produce one extra output
    column (garbage values over right padding) so the lane width is a
    multiple of 128; every consumer here masks that column out.
    """
    b, h, w, _cin = x.shape
    kh, kw = kernel.shape[0], kernel.shape[1]
    c = kernel.shape[3]
    h2, wy = stem_geometry(h, w)
    wp = wy + w_pad
    # width padding producing wy + w_pad output columns (lo stays 3)
    w_hi = 2 * (wp - 1) + kw - 3 - w
    pe_hi = max(0, 4 * (h2 - 1) + (kh - 3) - (h - 1))
    po_hi = max(0, 4 * (h2 - 1) + (kh - 1) - (h - 1))
    x = x.astype(dtype)
    k = kernel.astype(dtype)
    conv = functools.partial(
        jax.lax.conv_general_dilated,
        rhs=k,
        window_strides=(4, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ye = conv(x, padding=[(3, pe_hi), (3, w_hi)])
    yo = conv(x, padding=[(1, po_hi), (3, w_hi)])
    assert ye.shape == (b, h2, wp, c), (ye.shape, (b, h2, wp, c))
    assert yo.shape == (b, h2, wp, c), (yo.shape, (b, h2, wp, c))
    return ye.reshape(b, h2, wp * c), yo.reshape(b, h2, wp * c)


# ------------------------------------------------------------- cores


def _col_views(r, *, wp, c, roll, lane):
    """r [N, H2, L] -> (left, right) column-neighbour views: at lane
    l = w*c + ch, left reads column w-1 and right column w+1; out-of-
    range columns read the -inf stand-in (torch pool padding)."""
    lanes = wp * c
    neg = jnp.asarray(_NEG, r.dtype)
    left = roll(r, c)
    left = jnp.where(lane < c, neg, left)
    right = roll(r, lanes - c)
    right = jnp.where(lane >= lanes - c, neg, right)
    return left, right


def _native_fwd_core(ye, yo, s_lane, o_lane, *, wreal, wp, c, roll):
    """Shared forward: parity planes -> pooled [N, H2, L] (values valid
    at even real columns w = 2j; other lanes carry junk the caller
    slices away)."""
    n, h2, lanes = ye.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, h2, lanes), 2)
    neg = jnp.asarray(_NEG, ye.dtype)

    def colmax(y):
        z = y * s_lane.astype(y.dtype) + o_lane.astype(y.dtype)
        r = jnp.maximum(z, jnp.asarray(0.0, z.dtype))
        r = jnp.where(lane >= wreal * c, neg, r)
        left, right = _col_views(r, wp=wp, c=c, roll=roll, lane=lane)
        return jnp.maximum(jnp.maximum(left, r), right)

    cme = colmax(ye)
    cmo = colmax(yo)
    return jnp.maximum(jnp.maximum(cme, cmo), _row_down(cmo, _NEG))


def _native_bwd_core(ye, yo, g, s_lane, o_lane, *, wreal, wp, c, roll):
    """Shared backward: (dye, dyo [N,H2,L], sum_dz [L] f32, sum_dzy [L]
    f32) where dz is the gradient at the BN output and dy = dz *
    scale_eff the gradient at the BN input (conv1 output).

    Pool gradient goes to the first window tap attaining the max in
    row-major (row, col) window order — XLA's select_and_scatter
    tie-break, as in stem_pallas.  g must be the full-lane layout
    (zeros at odd / pad columns, :func:`_expand_pool_grad`).
    """
    n, h2, lanes = ye.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, h2, lanes), 2)
    neg = jnp.asarray(_NEG, ye.dtype)

    def prep(y):
        z = y * s_lane.astype(y.dtype) + o_lane.astype(y.dtype)
        r = jnp.maximum(z, jnp.asarray(0.0, z.dtype))
        r = jnp.where(lane >= wreal * c, neg, r)
        left, right = _col_views(r, wp=wp, c=c, roll=roll, lane=lane)
        return z, (left, r, right)  # col-offset order -1, 0, +1

    ze, cve = prep(ye)
    zo, cvo = prep(yo)
    cme = jnp.maximum(jnp.maximum(cve[0], cve[1]), cve[2])
    cmo = jnp.maximum(jnp.maximum(cvo[0], cvo[1]), cvo[2])
    m = jnp.maximum(jnp.maximum(cme, cmo), _row_down(cmo, _NEG))

    # comparisons in f32 (Mosaic rejects bf16 cmpf; exact for bf16)
    m32 = m.astype(jnp.float32)
    taken = jnp.zeros(m.shape, jnp.bool_)
    zero = jnp.zeros_like(g)
    acc = {"e": zero, "o": zero}
    # window taps row-major: a = row offset (-1, 0, +1), b = col offset
    for a in range(3):
        plane = "e" if a == 1 else "o"
        cv = cve if a == 1 else cvo
        for b in range(3):
            v = cv[b]
            if a == 0:  # row 2i-1 lives at O[i-1]
                v = _row_down(v, _NEG)
            eq = v.astype(jnp.float32) == m32
            sel = jnp.logical_and(eq, jnp.logical_not(taken))
            taken = jnp.logical_or(taken, eq)
            contrib = jnp.where(sel, g, zero)
            if a == 0:  # source row i-1 gathers from output row i
                contrib = _row_up(contrib)
            if b == 0:  # source col w-1 gathers from output col w
                contrib = roll(contrib, wp * c - c)
                contrib = jnp.where(
                    lane >= wp * c - c,
                    jnp.asarray(0.0, contrib.dtype), contrib,
                )
            elif b == 2:  # source col w+1 gathers from output col w
                contrib = roll(contrib, c)
                contrib = jnp.where(
                    lane < c, jnp.asarray(0.0, contrib.dtype), contrib
                )
            acc[plane] = acc[plane] + contrib

    def finish(z, a):
        live = jnp.logical_and(
            z.astype(jnp.float32) > 0, lane < wreal * c
        )
        return jnp.where(live, a, jnp.asarray(0.0, a.dtype))

    dze = finish(ze, acc["e"])
    dzo = finish(zo, acc["o"])
    dye = (dze.astype(jnp.float32) * s_lane).astype(ye.dtype)
    dyo = (dzo.astype(jnp.float32) * s_lane).astype(yo.dtype)
    dzf = dze.astype(jnp.float32)
    dzof = dzo.astype(jnp.float32)
    sum_dz = _chain_sum(dzf) + _chain_sum(dzof)
    sum_dzy = _chain_sum(dzf * ye.astype(jnp.float32)) + _chain_sum(
        dzof * yo.astype(jnp.float32)
    )
    return dye, dyo, sum_dz, sum_dzy


# ------------------------------------------------------------- pallas


@functools.partial(
    jax.jit, static_argnames=("wreal", "wp", "c", "interpret", "bt")
)
def _fwd_pallas(ye, yo, s_lane, o_lane, *, wreal, wp, c, interpret,
                bt=None):
    b, h2, lanes = ye.shape
    if bt is None:
        bt = _pick_bt(b, 2 * h2 * lanes * ye.dtype.itemsize, 4 * 2**20)
    roll = _xla_roll if interpret else _mosaic_roll

    def kernel(ye_ref, yo_ref, s_ref, o_ref, out_ref):
        # f32-uniform compute (see stem_pallas: avoids bf16/f32 tile
        # relayouts; pltpu.roll has no sub-32-bit lowering)
        out_ref[:] = _native_fwd_core(
            ye_ref[:].astype(jnp.float32),
            yo_ref[:].astype(jnp.float32),
            s_ref[0], o_ref[0],
            wreal=wreal, wp=wp, c=c, roll=roll,
        ).astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h2, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, h2, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, h2, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h2, lanes), ye.dtype),
        cost_estimate=pl.CostEstimate(
            flops=20 * b * h2 * lanes,
            bytes_accessed=3 * b * h2 * lanes * ye.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(ye, yo, s_lane.reshape(1, lanes), o_lane.reshape(1, lanes))


@functools.partial(
    jax.jit, static_argnames=("wreal", "wp", "c", "interpret", "bt")
)
def _bwd_pallas(ye, yo, g, s_lane, o_lane, *, wreal, wp, c, interpret,
                bt=None):
    b, h2, lanes = ye.shape
    if bt is None:
        bt = _pick_bt(b, 3 * h2 * lanes * ye.dtype.itemsize, 2 * 2**20)
    roll = _xla_roll if interpret else _mosaic_roll

    def kernel(ye_ref, yo_ref, g_ref, s_ref, o_ref,
               dye_ref, dyo_ref, sums_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            sums_ref[:] = jnp.zeros_like(sums_ref)

        dye, dyo, sum_dz, sum_dzy = _native_bwd_core(
            ye_ref[:].astype(jnp.float32),
            yo_ref[:].astype(jnp.float32),
            g_ref[:].astype(jnp.float32),
            s_ref[0], o_ref[0],
            wreal=wreal, wp=wp, c=c, roll=roll,
        )
        dye_ref[:] = dye.astype(dye_ref.dtype)
        dyo_ref[:] = dyo.astype(dyo_ref.dtype)
        sums_ref[0, :] += sum_dz
        sums_ref[1, :] += sum_dzy

    dye, dyo, sums = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h2, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, h2, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, h2, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, h2, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, h2, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h2, lanes), ye.dtype),
            jax.ShapeDtypeStruct((b, h2, lanes), yo.dtype),
            jax.ShapeDtypeStruct((2, lanes), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * b * h2 * lanes,
            bytes_accessed=5 * b * h2 * lanes * ye.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(ye, yo, g, s_lane.reshape(1, lanes), o_lane.reshape(1, lanes))
    return dye, dyo, sums[0], sums[1]


@functools.partial(jax.jit, static_argnames=("interpret", "bt"))
def _stats_pallas(ye, yo, *, interpret=False, bt=None):
    """One fused read of both parity planes -> per-lane (sum, sum of
    squares) [2, L] f32 (pad columns included; the caller's fold
    excludes them)."""
    b, h2, lanes = ye.shape
    if bt is None:
        bt = _pick_bt(b, 2 * h2 * lanes * ye.dtype.itemsize, 8 * 2**20)

    def kernel(ye_ref, yo_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        for ref in (ye_ref, yo_ref):
            y = ref[:].astype(jnp.float32)
            s1, s2 = y, y * y
            while s1.ndim > 1:
                s1 = jnp.sum(s1, axis=0)
                s2 = jnp.sum(s2, axis=0)
            out_ref[0, :] += s1
            out_ref[1, :] += s2

    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, h2, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, h2, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, lanes), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h2 * lanes,
            bytes_accessed=2 * b * h2 * lanes * ye.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(ye, yo)


# ------------------------------------------------------------------ xla


@functools.partial(jax.jit, static_argnames=("wreal", "wp", "c"))
def _fwd_xla(ye, yo, s_lane, o_lane, *, wreal, wp, c):
    return _native_fwd_core(
        ye, yo, s_lane, o_lane, wreal=wreal, wp=wp, c=c, roll=_xla_roll
    )


@functools.partial(jax.jit, static_argnames=("wreal", "wp", "c"))
def _bwd_xla(ye, yo, g, s_lane, o_lane, *, wreal, wp, c):
    return _native_bwd_core(
        ye, yo, g, s_lane, o_lane, wreal=wreal, wp=wp, c=c,
        roll=_xla_roll,
    )


# ------------------------------------------------------------ public op


def _lane_affine(mean, var, scale, bias, eps, lanes):
    rstd = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    se = scale.astype(jnp.float32) * rstd
    oe = bias.astype(jnp.float32) - mean.astype(jnp.float32) * se
    reps = lanes // se.shape[0]
    return jnp.tile(se, reps), jnp.tile(oe, reps), rstd, se


def _fold_real(per_lane: jax.Array, wreal: int, c: int) -> jax.Array:
    """Per-lane [L] -> per-channel [C], excluding pad columns."""
    return per_lane.reshape(-1, c)[:wreal].sum(axis=0)


def _pool_out_w(wreal: int) -> int:
    return (wreal + 2 - 3) // 2 + 1


def _slice_pooled(full: jax.Array, wreal: int, c: int) -> jax.Array:
    """Full-lane pooled [B, H2, L] -> [B, H2, Wout, C] (even real
    columns)."""
    b, h2, lanes = full.shape
    wout = _pool_out_w(wreal)
    return full.reshape(b, h2, lanes // c, c)[:, :, 0 : 2 * wout : 2]


def _expand_pool_grad(g: jax.Array, wp: int, c: int) -> jax.Array:
    """[B, H2, Wout, C] cotangent -> full-lane [B, H2, L] with zeros at
    odd and pad columns (interior lax.pad)."""
    b, h2, wout, _ = g.shape
    wide = jax.lax.pad(
        g,
        jnp.asarray(0.0, g.dtype),
        ((0, 0, 0), (0, 0, 0), (0, wp - (2 * wout - 1), 1), (0, 0, 0)),
    )
    return wide.reshape(b, h2, wp * c)


def native_batch_stats(
    ye: jax.Array,
    yo: jax.Array,
    channels: int,
    wreal: int,
    impl: str = "auto",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(mean, var) [C] over both parity planes, pad columns excluded —
    flax ``use_fast_variance`` semantics (E[x**2] - E[x]**2).

    Primal-only (no autodiff rule): the train-mode statistics gradient
    is emitted analytically by :func:`native_bn_relu_pool_train`.
    """
    b, h2, lanes = ye.shape
    n = b * 2 * h2 * wreal
    if _resolve_impl(impl) == "pallas":
        sums = _stats_pallas(ye, yo, interpret=interpret)
        s1, s2 = sums[0], sums[1]
    else:
        s1 = jnp.zeros(lanes, jnp.float32)
        s2 = jnp.zeros(lanes, jnp.float32)
        for y in (ye, yo):
            yf = y.astype(jnp.float32)
            s1 = s1 + _chain_sum(yf)
            s2 = s2 + _chain_sum(yf * yf)
    mean = _fold_real(s1, wreal, channels) / n
    mean_sq = _fold_real(s2, wreal, channels) / n
    return mean, mean_sq - mean**2


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def native_bn_relu_pool(
    ye: jax.Array,
    yo: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    wreal: int,
    eps: float = 1e-5,
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """Fused ``max_pool3x3s2(relu(batchnorm(y)))`` on row-parity planes.

    ye/yo: [B, H2, L] (L = Wp*C) conv1 output parity planes
    (:func:`conv1_parity_native`); wreal: real conv output width (pad
    columns beyond it are masked); mean/var/scale/bias: [C] BatchNorm
    statistics and affine parameters (mean/var may be batch stats —
    their cotangents are returned).  Returns [B, H2, Wout, C].
    """
    b, h2, lanes = ye.shape
    c = scale.shape[0]
    wp = lanes // c
    se, oe, _, _ = _lane_affine(mean, var, scale, bias, eps, lanes)
    if _resolve_impl(impl) == "pallas":
        full = _fwd_pallas(
            ye, yo, se, oe, wreal=wreal, wp=wp, c=c, interpret=interpret
        )
    else:
        full = _fwd_xla(ye, yo, se, oe, wreal=wreal, wp=wp, c=c)
    return _slice_pooled(full, wreal, c)


def _nbrp_fwd(ye, yo, mean, var, scale, bias, wreal, eps, impl, interpret):
    out = native_bn_relu_pool(
        ye, yo, mean, var, scale, bias, wreal, eps, impl, interpret
    )
    return out, (ye, yo, mean, var, scale, bias)


def _nbrp_bwd(wreal, eps, impl, interpret, residuals, g):
    ye, yo, mean, var, scale, bias = residuals
    b, h2, lanes = ye.shape
    c = scale.shape[0]
    wp = lanes // c
    se, oe, rstd, se_c = _lane_affine(mean, var, scale, bias, eps, lanes)
    gq = _expand_pool_grad(g, wp, c).astype(ye.dtype)
    if _resolve_impl(impl) == "pallas":
        dye, dyo, sum_dz, sum_dzy = _bwd_pallas(
            ye, yo, gq, se, oe, wreal=wreal, wp=wp, c=c,
            interpret=interpret,
        )
    else:
        dye, dyo, sum_dz, sum_dzy = _bwd_xla(
            ye, yo, gq, se, oe, wreal=wreal, wp=wp, c=c
        )
    d_off = _fold_real(sum_dz, wreal, c)  # = sum(dz)
    d_se = _fold_real(sum_dzy, wreal, c)  # = sum(dz * y)
    mu = mean.astype(jnp.float32)
    dscale = rstd * (d_se - mu * d_off)  # = sum(dz * xhat)
    dbias = d_off
    dmean = -se_c * d_off
    dvar = -0.5 * scale.astype(jnp.float32) * rstd**3 * (d_se - mu * d_off)
    return (
        dye.astype(ye.dtype),
        dyo.astype(yo.dtype),
        dmean.astype(mean.dtype),
        dvar.astype(var.dtype),
        dscale.astype(scale.dtype),
        dbias.astype(bias.dtype),
    )


native_bn_relu_pool.defvjp(_nbrp_fwd, _nbrp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def native_bn_relu_pool_train(
    ye: jax.Array,
    yo: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    wreal: int,
    eps: float = 1e-5,
    impl: str = "auto",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Training-mode fused native stem tail: batch statistics in one
    fused read of both planes, then ``max_pool(relu(batchnorm(y)))``.

    Returns (pooled [B, H2, Wout, C], mean [C], var [C]); mean/var feed
    the caller's running-average update (non-differentiable state).  The
    custom VJP emits the exact batch-statistics BatchNorm gradient as
    the kernels' direct term plus one per-lane affine correction —
    identical closed form to stem_pallas.bn_relu_pool_train, restricted
    to the real (non-pad) columns that defined the statistics.
    """
    c = scale.shape[0]
    mean, var = native_batch_stats(
        ye, yo, c, wreal, impl=impl, interpret=interpret
    )
    pooled = native_bn_relu_pool(
        ye, yo, mean, var, scale, bias, wreal, eps, impl, interpret
    )
    return pooled, mean, var


def _nbrpt_fwd(ye, yo, scale, bias, wreal, eps, impl, interpret):
    out = native_bn_relu_pool_train(
        ye, yo, scale, bias, wreal, eps, impl, interpret
    )
    pooled, mean, var = out
    return out, (ye, yo, mean, var, scale, bias)


def _nbrpt_bwd(wreal, eps, impl, interpret, residuals, cotangents):
    g, _gmean, _gvar = cotangents  # mean/var feed non-diff state only
    ye, yo, mean, var, scale, bias = residuals
    b, h2, lanes = ye.shape
    c = scale.shape[0]
    wp = lanes // c
    n = b * 2 * h2 * wreal
    se, oe, rstd, se_c = _lane_affine(mean, var, scale, bias, eps, lanes)
    gq = _expand_pool_grad(g, wp, c).astype(ye.dtype)
    if _resolve_impl(impl) == "pallas":
        dye_d, dyo_d, sum_dz, sum_dzy = _bwd_pallas(
            ye, yo, gq, se, oe, wreal=wreal, wp=wp, c=c,
            interpret=interpret,
        )
    else:
        dye_d, dyo_d, sum_dz, sum_dzy = _bwd_xla(
            ye, yo, gq, se, oe, wreal=wreal, wp=wp, c=c
        )
    d_off = _fold_real(sum_dz, wreal, c)  # sum(dz) [C]
    d_se = _fold_real(sum_dzy, wreal, c)  # sum(dz*y) [C]
    mu = mean.astype(jnp.float32)
    sum_dzxhat = rstd * (d_se - mu * d_off)
    dscale = sum_dzxhat
    dbias = d_off
    # stat-gradient correction on the real columns: dy += A + B*y
    bch = -se_c * rstd * sum_dzxhat / n
    ach = -se_c * d_off / n - bch * mu
    reps = lanes // c
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2)
    real = lane < wreal * c
    a_lane = jnp.where(real, jnp.tile(ach, reps), 0.0)
    b_lane = jnp.where(real, jnp.tile(bch, reps), 0.0)

    def corrected(direct, y):
        return (
            direct.astype(jnp.float32)
            + a_lane
            + b_lane * y.astype(jnp.float32)
        ).astype(y.dtype)

    return (
        corrected(dye_d, ye),
        corrected(dyo_d, yo),
        dscale.astype(scale.dtype),
        dbias.astype(bias.dtype),
    )


native_bn_relu_pool_train.defvjp(_nbrpt_fwd, _nbrpt_bwd)
