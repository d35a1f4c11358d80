"""Fused ResNet stem tail: BatchNorm + ReLU + 3x3/s2 max-pool kernels.

The flagship 224-square recipe's stem (conv1 -> BN -> ReLU -> maxpool,
torchvision semantics via bestengine.py:23-24) is bandwidth-bound: XLA
spends ~8.7 ms/step at B=256 shuttling the 411 MB 112-square tensors
through separate BN-stat, BN-apply, pool and select-and-scatter passes
(DESIGN.md round-2 profiling).  These kernels fuse the whole tail into
one forward pass and one backward pass over the conv1 output, so each
112-square tensor crosses HBM exactly once per direction as bf16.

Layout: the conv1 output is produced (by
:func:`..ops.stem_fusion.precomposed_conv1_quadrant`) in **quadrant
layout** ``[B, 2, H2, L]`` with ``L = 2*H2*C``::

    yq[b, rp, h, cp*H2*C + j*C + f] == y[b, 2*h+rp, 2*j+cp, f]

i.e. rows and columns are split into even/odd parity planes.  A 3x3
stride-2 max-pool window around output (i, j) then reads only
*unit-shifted* views of the parity planes::

    rows {2i-1, 2i, 2i+1} = {O[i-1], E[i], O[i]}
    cols {2j-1, 2j, 2j+1} = {O[j-1], E[j], O[j]}

so the whole pool becomes elementwise max over nine views built from
128-aligned lane slices (E/O column halves, ``H2*C % 128 == 0``), a
lane rotate by ``C`` (``pltpu.roll``) and unit row shifts — no strided
slicing, no ``reduce_window``, no ``select_and_scatter``.  The backward
kernel recomputes the window maxima in VMEM, routes the pooled gradient
to the first-matching tap (row-major window order, matching XLA's
``select_and_scatter`` tie-break), applies the ReLU mask, and emits the
BN input gradient plus the two per-lane reductions BatchNorm's backward
needs — all in the same single pass.

The forward/backward cores are shared verbatim between the Pallas
kernels and a pure-XLA twin (``impl='xla'``), which serves as the CPU
test oracle and a no-Mosaic fallback.

Reference semantics covered: torchvision ``maxpool(relu(bn1(conv1(x))))``
(bestengine.py:23, torchvision resnet.py) == flax
``max_pool(relu(BatchNorm(y)))`` as in models/resnet.py:130-135.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quadrant_pack(y: jax.Array) -> jax.Array:
    """[B, H, W, C] (H, W even) -> quadrant layout [B, 2, H//2, W*C]."""
    b, h, w, c = y.shape
    t = y.reshape(b, h // 2, 2, w // 2, 2, c)
    t = t.transpose(0, 2, 1, 4, 3, 5)  # [b, rp, h2, cp, j, f]
    return t.reshape(b, 2, h // 2, w * c)


def quadrant_unpack(yq: jax.Array, channels: int) -> jax.Array:
    """Inverse of :func:`quadrant_pack`."""
    b, two, h2, l = yq.shape
    w2 = l // (2 * channels)
    t = yq.reshape(b, 2, h2, 2, w2, channels)
    t = t.transpose(0, 2, 1, 4, 3, 5)
    return t.reshape(b, 2 * h2, 2 * w2, channels)


def _row_down(x: jax.Array, fill: float) -> jax.Array:
    """Shift rows by +1 (row i shows previous row i-1; row 0 <- fill)."""
    pad = jnp.full_like(x[:, :1, :], fill)
    return jnp.concatenate([pad, x[:, :-1, :]], axis=1)


def _row_up(x: jax.Array) -> jax.Array:
    """Shift rows by -1 (row i shows row i+1; last row <- 0)."""
    pad = jnp.zeros_like(x[:, :1, :])
    return jnp.concatenate([x[:, 1:, :], pad], axis=1)


def _chain_sum(x: jax.Array) -> jax.Array:
    """Reduce all leading axes one at a time (Mosaic-safe), keep last."""
    while x.ndim > 1:
        x = jnp.sum(x, axis=0)
    return x


def _col_variants(plane, h2, c, roll, lane):
    """plane [N, H2, L] -> (E[j], O[j], O[j-1]) column views [N, H2, H2*C]."""
    hc = h2 * c
    e = plane[..., :hc]
    o = plane[..., hc:]
    om = roll(o, c)  # lane k reads o[k - C]  ==  column j reads O[j-1]
    om = jnp.where(lane < c, jnp.asarray(-1.0, om.dtype), om)
    return e, o, om


def _stem_pool_fwd_core(y, s_lane, o_lane, *, h2, c, roll):
    """Shared forward: y [N, 2, H2, L] -> pooled [N, H2, H2*C] (bf16 math,
    matching the unfused flax path's dtype=bfloat16 BN/pool)."""
    z = y * s_lane.astype(y.dtype) + o_lane.astype(y.dtype)
    r = jnp.maximum(z, jnp.asarray(0.0, z.dtype))
    hc = h2 * c
    lane = jax.lax.broadcasted_iota(jnp.int32, (y.shape[0], h2, hc), 2)
    e, o, om = _col_variants(r[:, 0], h2, c, roll, lane)
    cme = jnp.maximum(jnp.maximum(e, o), om)
    e, o, om = _col_variants(r[:, 1], h2, c, roll, lane)
    cmo = jnp.maximum(jnp.maximum(e, o), om)
    return jnp.maximum(jnp.maximum(cme, cmo), _row_down(cmo, -1.0))


def _stem_pool_bwd_core(y, g, s_lane, o_lane, *, h2, c, roll):
    """Shared backward: returns (dy [N,2,H2,L] bf16-class,
    sum_dz [L] f32, sum_dzy [L] f32) where dz is the gradient at the BN
    output and dy = dz * scale_eff is the gradient at the BN input.

    Pool gradient goes to the first window tap attaining the max
    (row-major (a, b) order over the 3x3 window = XLA select_and_scatter
    order).  Ties among *positive* values are measure-zero for float
    data; ties at zero are killed by the ReLU mask either way.
    """
    n = y.shape[0]
    hc = h2 * c
    z = y * s_lane.astype(y.dtype) + o_lane.astype(y.dtype)
    r = jnp.maximum(z, jnp.asarray(0.0, z.dtype))
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, h2, hc), 2)
    cv = [
        _col_variants(r[:, 0], h2, c, roll, lane),  # E rows
        _col_variants(r[:, 1], h2, c, roll, lane),  # O rows
    ]
    # m = pooled max (identical expression to the forward core)
    cme = jnp.maximum(jnp.maximum(cv[0][0], cv[0][1]), cv[0][2])
    cmo = jnp.maximum(jnp.maximum(cv[1][0], cv[1][1]), cv[1][2])
    m = jnp.maximum(jnp.maximum(cme, cmo), _row_down(cmo, -1.0))

    # comparisons in f32: Mosaic rejects bf16 cmpf ("Target does not
    # support this comparison"); the cast is exact for bf16 values.
    m32 = m.astype(jnp.float32)
    taken = jnp.zeros(m.shape, jnp.bool_)
    zero = jnp.zeros_like(g)
    # acc[rp][cp]: gradient landing on that source quadrant (pre-ReLU mask)
    acc = [[zero, zero], [zero, zero]]
    # window taps row-major: a (row offset -1,0,+1), b (col offset -1,0,+1)
    # col variant index: offset -1 -> om (idx 2), 0 -> e (0), +1 -> o (1)
    col_idx = {0: 2, 1: 0, 2: 1}
    for a in range(3):
        for b in range(3):
            rows = 0 if a == 1 else 1  # -1/+1 hit odd rows, 0 hits even
            v = cv[rows][col_idx[b]]
            if a == 0:
                v = _row_down(v, -1.0)
            eq = v.astype(jnp.float32) == m32
            sel = jnp.logical_and(eq, jnp.logical_not(taken))
            taken = jnp.logical_or(taken, eq)
            contrib = jnp.where(sel, g, zero)
            if a == 0:  # source row i-1 gathers from output row i
                contrib = _row_up(contrib)
            if b == 0:  # source col j-1 gathers from output col j
                contrib = roll(contrib, hc - c)
                contrib = jnp.where(
                    lane >= hc - c, jnp.asarray(0.0, contrib.dtype), contrib
                )
            cp = 0 if b == 1 else 1
            acc[rows][cp] = acc[rows][cp] + contrib
    dz = jnp.stack(
        [
            jnp.concatenate(acc[0], axis=-1),
            jnp.concatenate(acc[1], axis=-1),
        ],
        axis=1,
    )  # [N, 2, H2, L]
    dz = jnp.where(
        z.astype(jnp.float32) > 0, dz, jnp.asarray(0.0, dz.dtype)
    )
    dzf = dz.astype(jnp.float32)
    dy = (dzf * s_lane).astype(y.dtype)
    sum_dz = _chain_sum(dzf)
    sum_dzy = _chain_sum(dzf * y.astype(jnp.float32))
    return dy, sum_dz, sum_dzy


def _xla_roll(x, shift):
    return jnp.roll(x, shift, axis=-1)


def _mosaic_roll(x, shift):
    """Lane rotate inside a kernel.  Mosaic's tpu.dynamic_rotate only
    supports 32-bit element types ("Rotate with non-32-bit data"), so
    sub-32-bit inputs round-trip through f32 (lossless for bf16)."""
    if x.dtype.itemsize >= 4:
        return pltpu.roll(x, shift, axis=x.ndim - 1)
    return pltpu.roll(
        x.astype(jnp.float32), shift, axis=x.ndim - 1
    ).astype(x.dtype)


# ---------------------------------------------------------------- pallas


@functools.partial(jax.jit, static_argnames=("h2", "c", "interpret"))
def _fwd_pallas(yq, s_lane, o_lane, *, h2, c, interpret):
    b, two, _, l = yq.shape
    hc = h2 * c
    bt = 2 if b % 2 == 0 else 1
    roll = _xla_roll if interpret else _mosaic_roll

    def kernel(y_ref, s_ref, o_ref, out_ref):
        out_ref[:] = _stem_pool_fwd_core(
            y_ref[:], s_ref[0], o_ref[0], h2=h2, c=c, roll=roll
        ).astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(
                (bt, 2, h2, l), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, h2, hc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h2, hc), yq.dtype),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * 2 * h2 * l,
            bytes_accessed=(b * 2 * h2 * l + b * h2 * hc)
            * yq.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(yq, s_lane.reshape(1, l), o_lane.reshape(1, l))


@functools.partial(jax.jit, static_argnames=("h2", "c", "interpret"))
def _bwd_pallas(yq, g, s_lane, o_lane, *, h2, c, interpret):
    b, two, _, l = yq.shape
    hc = h2 * c
    roll = _xla_roll if interpret else _mosaic_roll

    def kernel(y_ref, g_ref, s_ref, o_ref, dy_ref, sdz_ref, sdzy_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            sdz_ref[:] = jnp.zeros_like(sdz_ref)
            sdzy_ref[:] = jnp.zeros_like(sdzy_ref)

        dy, sum_dz, sum_dzy = _stem_pool_bwd_core(
            y_ref[:], g_ref[:], s_ref[0], o_ref[0], h2=h2, c=c, roll=roll
        )
        dy_ref[:] = dy.astype(dy_ref.dtype)
        sdz_ref[:] += sum_dz.reshape(1, l)
        sdzy_ref[:] += sum_dzy.reshape(1, l)

    dy, sdz, sdzy = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 2, h2, l), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h2, hc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 2, h2, l), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2, h2, l), yq.dtype),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
            jax.ShapeDtypeStruct((1, l), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * b * 2 * h2 * l,
            bytes_accessed=2 * b * 2 * h2 * l * yq.dtype.itemsize,
            transcendentals=0,
        ),
        # the 9-tap working set peaks at ~17 MB — just over the default
        # 16 MB scoped-vmem limit (v5e has headroom above it)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(yq, g, s_lane.reshape(1, l), o_lane.reshape(1, l))
    return dy, sdz[0], sdzy[0]


# ------------------------------------------------------------------ xla


@functools.partial(jax.jit, static_argnames=("h2", "c"))
def _fwd_xla(yq, s_lane, o_lane, *, h2, c):
    return _stem_pool_fwd_core(
        yq, s_lane, o_lane, h2=h2, c=c, roll=_xla_roll
    )


@functools.partial(jax.jit, static_argnames=("h2", "c"))
def _bwd_xla(yq, g, s_lane, o_lane, *, h2, c):
    return _stem_pool_bwd_core(
        yq, g, s_lane, o_lane, h2=h2, c=c, roll=_xla_roll
    )


# ------------------------------------------------------------ public op


def _lane_affine(mean, var, scale, bias, eps, l):
    """Per-lane BN affine: scale_eff = gamma*rstd, offset = beta - mu*se."""
    rstd = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    se = scale.astype(jnp.float32) * rstd
    oe = bias.astype(jnp.float32) - mean.astype(jnp.float32) * se
    reps = l // se.shape[0]
    return jnp.tile(se, reps), jnp.tile(oe, reps), rstd, se


def _resolve_impl(impl: str) -> str:
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def bn_relu_pool(
    yq: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """Fused ``max_pool3x3s2(relu(batchnorm(y)))`` on quadrant-layout y.

    yq: [B, 2, H2, L] (L = 2*H2*C) quadrant-layout conv1 output;
    mean/var/scale/bias: [C] BatchNorm statistics and affine parameters
    (mean/var may be batch stats — their cotangents are returned so the
    caller's stat reductions receive the full BN-training gradient).
    Returns [B, H2, H2, C].
    """
    b, two, h2, l = yq.shape
    c = l // (2 * h2)
    se, oe, _, _ = _lane_affine(mean, var, scale, bias, eps, l)
    if _resolve_impl(impl) == "pallas":
        if (h2 * c) % 128 != 0 and not interpret:
            raise ValueError(
                f"pallas stem tail needs (H2*C) % 128 == 0, got {h2}*{c}"
            )
        pooled = _fwd_pallas(yq, se, oe, h2=h2, c=c, interpret=interpret)
    else:
        pooled = _fwd_xla(yq, se, oe, h2=h2, c=c)
    return pooled.reshape(b, h2, h2, c)


def _bn_relu_pool_fwd(yq, mean, var, scale, bias, eps, impl, interpret):
    out = bn_relu_pool(yq, mean, var, scale, bias, eps, impl, interpret)
    return out, (yq, mean, var, scale, bias)


def _bn_relu_pool_bwd(eps, impl, interpret, residuals, g):
    yq, mean, var, scale, bias = residuals
    b, two, h2, l = yq.shape
    c = l // (2 * h2)
    se, oe, rstd, se_c = _lane_affine(mean, var, scale, bias, eps, l)
    gq = g.reshape(b, h2, h2 * c).astype(yq.dtype)
    if _resolve_impl(impl) == "pallas":
        dy, sum_dz, sum_dzy = _bwd_pallas(
            yq, gq, se, oe, h2=h2, c=c, interpret=interpret
        )
    else:
        dy, sum_dz, sum_dzy = _bwd_xla(yq, gq, se, oe, h2=h2, c=c)
    # fold per-lane sums to per-channel [C]
    d_off = sum_dz.reshape(l // c, c).sum(axis=0)  # = sum(dz)
    d_se = sum_dzy.reshape(l // c, c).sum(axis=0)  # = sum(dz * y)
    mu = mean.astype(jnp.float32)
    dscale = rstd * (d_se - mu * d_off)  # = sum(dz * xhat)
    dbias = d_off
    dmean = -se_c * d_off
    dvar = (
        -0.5 * scale.astype(jnp.float32) * rstd**3 * (d_se - mu * d_off)
    )
    return (
        dy.astype(yq.dtype),
        dmean.astype(mean.dtype),
        dvar.astype(var.dtype),
        dscale.astype(scale.dtype),
        dbias.astype(bias.dtype),
    )


bn_relu_pool.defvjp(_bn_relu_pool_fwd, _bn_relu_pool_bwd)
