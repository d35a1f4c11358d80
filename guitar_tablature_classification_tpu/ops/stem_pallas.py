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


def _pick_bt(b: int, bytes_per_sample: int, budget: int) -> int:
    """Largest divisor of b whose input block fits the VMEM budget —
    small tiles pay a fixed per-grid-step cost (measured ~15-20 us:
    bt=1/2 grids were 5-10x slower than the data movement itself)."""
    bt = max(1, budget // max(bytes_per_sample, 1))
    while b % bt:
        bt -= 1
    return bt


@functools.partial(
    jax.jit, static_argnames=("h2", "c", "interpret", "bt")
)
def _fwd_pallas(yq, s_lane, o_lane, *, h2, c, interpret, bt=None):
    b, two, _, l = yq.shape
    hc = h2 * c
    if bt is None:
        bt = _pick_bt(b, 2 * h2 * l * yq.dtype.itemsize, 4 * 2**20)
    roll = _xla_roll if interpret else _mosaic_roll

    def kernel(y_ref, s_ref, o_ref, out_ref):
        # f32-uniform compute: mixing bf16 (16,128)-tiled values with
        # i32/f32 (8,128)-tiled iotas/sums makes Mosaic insert a
        # relayout for every mixed op — one cast at entry avoids that
        # (and lets pltpu.roll run natively, it has no bf16 lowering).
        out_ref[:] = _stem_pool_fwd_core(
            y_ref[:].astype(jnp.float32), s_ref[0], o_ref[0],
            h2=h2, c=c, roll=roll,
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(yq, s_lane.reshape(1, l), o_lane.reshape(1, l))


@functools.partial(
    jax.jit, static_argnames=("h2", "c", "interpret", "bt")
)
def _bwd_pallas(yq, g, s_lane, o_lane, *, h2, c, interpret, bt=None):
    b, two, _, l = yq.shape
    hc = h2 * c
    if bt is None:
        bt = _pick_bt(b, 2 * h2 * l * yq.dtype.itemsize, 2 * 2**20)
    roll = _xla_roll if interpret else _mosaic_roll

    def kernel(y_ref, g_ref, s_ref, o_ref, dy_ref, sdz_ref, sdzy_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            sdz_ref[:] = jnp.zeros_like(sdz_ref)
            sdzy_ref[:] = jnp.zeros_like(sdzy_ref)

        dy, sum_dz, sum_dzy = _stem_pool_bwd_core(
            y_ref[:].astype(jnp.float32), g_ref[:].astype(jnp.float32),
            s_ref[0], o_ref[0], h2=h2, c=c, roll=roll,
        )
        dy_ref[:] = dy.astype(dy_ref.dtype)
        sdz_ref[:] += sum_dz.reshape(1, l)
        sdzy_ref[:] += sum_dzy.reshape(1, l)

    dy, sdz, sdzy = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(
                (bt, 2, h2, l), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bt, h2, hc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (bt, 2, h2, l), lambda i: (i, 0, 0, 0),
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
        # the 9-tap working set peaks at ~17 MB per sample tile — over
        # the default 16 MB scoped-vmem limit (v5e has headroom above it)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(yq, g, s_lane.reshape(1, l), o_lane.reshape(1, l))
    return dy, sdz[0], sdzy[0]


@functools.partial(jax.jit, static_argnames=("interpret", "m_tile"))
def _gemm_stats_pallas(hq, sq, *, interpret=False, m_tile=256):
    """Fused stem-front GEMM + BN-stat epilogue.

    hq [M, K] bf16 patches, sq [K, N] bf16 weights -> (y [M, N] bf16,
    sums [2, N] f32 = per-lane (sum, sum-of-squares) of y).

    XLA runs this K=70 GEMM at ~15 TF/s and needs a separate 1.8 ms
    pass for the stats; here the f32 accumulator is reduced into the
    revisited sums block before the bf16 cast, so the stats are free
    and the GEMM keeps the MXU's K=70/128 utilization ceiling.
    """
    m, k = hq.shape
    n = sq.shape[1]

    def kernel(h_ref, s_ref, y_ref, sums_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            sums_ref[:] = jnp.zeros_like(sums_ref)

        acc = jax.lax.dot_general(
            h_ref[:], s_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        yb = acc.astype(y_ref.dtype)
        y_ref[:] = yb
        # stats on the bf16-rounded values (what downstream consumes)
        yf = yb.astype(jnp.float32)
        sums_ref[0, :] += jnp.sum(yf, axis=0)
        sums_ref[1, :] += jnp.sum(yf * yf, axis=0)

    y, sums = pl.pallas_call(
        kernel,
        grid=(m // m_tile,),
        in_specs=[
            pl.BlockSpec((m_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m_tile, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), hq.dtype),
            jax.ShapeDtypeStruct((2, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n + 3 * m * n,
            bytes_accessed=(m * k + k * n + m * n) * 2 + 8 * n,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(hq, sq)
    return y, sums


@functools.partial(jax.jit, static_argnames=("interpret", "bt"))
def _stats_pallas(yq, *, interpret=False, bt=None):
    """One pass over quadrant-layout y: per-lane (sum, sum of squares)
    [2, L] f32 — the BatchNorm batch-stat reductions without XLA's
    separate cast+reduce passes (measured 1.8 ms at B=256 vs ~0.3 ms
    for the single fused read)."""
    b, two, h2, l = yq.shape
    if bt is None:
        bt = _pick_bt(b, 2 * h2 * l * yq.dtype.itemsize, 8 * 2**20)

    def kernel(y_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        y = y_ref[:].astype(jnp.float32)
        s1, s2 = y, y * y
        while s1.ndim > 1:
            s1 = jnp.sum(s1, axis=0)
            s2 = jnp.sum(s2, axis=0)
        out_ref[0, :] += s1
        out_ref[1, :] += s2

    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec(
                (bt, 2, h2, l), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, l), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, l), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * 2 * h2 * l,
            bytes_accessed=b * 2 * h2 * l * yq.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(yq)
    return out


def quadrant_batch_stats(
    yq: jax.Array, channels: int, impl: str = "auto", interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """(mean, var) [C] over a quadrant-layout conv output — flax
    BatchNorm ``use_fast_variance`` semantics (E[x²] − E[x]²).

    Primal-only (the pallas kernel has no autodiff rule); the train-mode
    gradient through batch statistics is produced analytically by
    :func:`bn_relu_pool_train`'s custom VJP instead.
    """
    b, two, h2, l = yq.shape
    n = yq.size // channels
    if _resolve_impl(impl) == "pallas":
        sums = _stats_pallas(yq, interpret=interpret)
        s1, s2 = sums[0], sums[1]
    else:
        yf = yq.astype(jnp.float32)
        s1, s2 = yf, yf * yf
        while s1.ndim > 1:
            s1 = jnp.sum(s1, axis=0)
            s2 = jnp.sum(s2, axis=0)
    mean = s1.reshape(l // channels, channels).sum(axis=0) / n
    mean_sq = s2.reshape(l // channels, channels).sum(axis=0) / n
    return mean, mean_sq - mean**2


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def bn_relu_pool_train(
    yq: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    impl: str = "auto",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Training-mode fused stem tail: batch statistics computed inside
    (one Pallas pass), then ``max_pool(relu(batchnorm(y)))``.

    Returns (pooled [B, H2, H2, C], mean [C], var [C]); mean/var feed
    the caller's running-average update (non-differentiable state —
    their cotangents are ignored).  The custom VJP emits the exact
    batch-statistics BatchNorm gradient:

        dy = se*(dz - mean(dz) - xhat*mean(dz*xhat)),  se = gamma*rstd

    as the kernel's direct term plus one fused per-lane affine
    correction pass — no differentiable stat reductions needed.
    """
    b, two, h2, l = yq.shape
    c = l // (2 * h2)
    mean, var = quadrant_batch_stats(yq, c, impl=impl, interpret=interpret)
    pooled = bn_relu_pool(yq, mean, var, scale, bias, eps, impl, interpret)
    return pooled, mean, var


def _bn_relu_pool_train_fwd(yq, scale, bias, eps, impl, interpret):
    out = bn_relu_pool_train(yq, scale, bias, eps, impl, interpret)
    pooled, mean, var = out
    return out, (yq, mean, var, scale, bias)


def _bn_relu_pool_train_bwd(eps, impl, interpret, residuals, cotangents):
    g, _gmean, _gvar = cotangents  # mean/var feed non-diff state only
    yq, mean, var, scale, bias = residuals
    b, two, h2, l = yq.shape
    c = l // (2 * h2)
    n = yq.size // c
    se, oe, rstd, se_c = _lane_affine(mean, var, scale, bias, eps, l)
    gq = g.reshape(b, h2, h2 * c).astype(yq.dtype)
    if _resolve_impl(impl) == "pallas":
        dy_direct, sum_dz, sum_dzy = _bwd_pallas(
            yq, gq, se, oe, h2=h2, c=c, interpret=interpret
        )
    else:
        dy_direct, sum_dz, sum_dzy = _bwd_xla(yq, gq, se, oe, h2=h2, c=c)
    d_off = sum_dz.reshape(l // c, c).sum(axis=0)  # sum(dz) [C]
    d_se = sum_dzy.reshape(l // c, c).sum(axis=0)  # sum(dz*y) [C]
    mu = mean.astype(jnp.float32)
    sum_dzxhat = rstd * (d_se - mu * d_off)
    dscale = sum_dzxhat
    dbias = d_off
    # stat-gradient correction: dy += A + B*y with per-channel
    #   B = -se*rstd*sum_dzxhat/n
    #   A = -se*sum_dz/n - B*mean
    bch = -se_c * rstd * sum_dzxhat / n
    ach = -se_c * d_off / n - bch * mu
    reps = l // c
    a_lane = jnp.tile(ach, reps)
    b_lane = jnp.tile(bch, reps)
    dy = (
        dy_direct.astype(jnp.float32)
        + a_lane
        + b_lane * yq.astype(jnp.float32)
    ).astype(yq.dtype)
    return dy, dscale.astype(scale.dtype), dbias.astype(bias.dtype)


bn_relu_pool_train.defvjp(_bn_relu_pool_train_fwd, _bn_relu_pool_train_bwd)
