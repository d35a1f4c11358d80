"""Fused multi-head attention Pallas kernels (forward + backward).

At ViT-S/8 scale (N = 785 tokens, head_dim 64) the whole K/V of one head
is ~200 KB — it fits VMEM outright, so the right TPU design is not a
flash-attention streaming loop but a single fused kernel per (batch,
query-tile): scores, mask, softmax and the value contraction happen
on-chip per head with no [N, N] attention matrix ever touching HBM.  The
XLA alternative (``jax.nn.dot_product_attention``) materializes the
[B, H, N, N] weights (~950 MB/layer at B=64) in HBM in forward AND in a
recompute backward — measured as 166 of the 228 ms round-1 ViT train
step (DESIGN.md round-2 profiling).

Layout: the kernels consume ``[B, N, H*Dh]`` — the *natural output of
the fused QKV projection* — and loop heads over lane slices inside the
kernel.  (A ``[B*H, N, Dh]`` wrapper spent ~15 ms/step on transposes; a
``[B, N, H, Dh]`` block layout is rejected by Mosaic's last-two-dims
tiling rule.)  Sequence lengths that aren't tile-aligned are zero-padded
and masked with -inf inside the kernel.  Numerics match
``jax.nn.dot_product_attention`` for values and gradients (tested in
interpret mode and on hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_q_tile(n: int) -> int:
    """Largest 128-multiple tile whose f32 score block stays ~<=4 MB:
    single-tile grids win (bwd 5.2 -> 4.2 ms at ViT-S/8 shapes, probe
    in tools/probe_attn.py) because the per-grid-step fixed cost and
    the K/V revisit dominate small tiles."""
    n_pad = _round_up(n, 128)
    cap = max(128, (4 * 2**20 // (n_pad * 4)) // 128 * 128)
    return min(n_pad, cap)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_tile: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """q, k, v: [B, N, H, Dh] -> [B, N, H, Dh] (same layout as
    jax.nn.dot_product_attention), scale = Dh**-0.5."""
    b, n, h, dh = q.shape
    if q_tile is None:
        q_tile = _auto_q_tile(n)
    out = _attention_fwd_hd(
        q.reshape(b, n, h * dh), k.reshape(b, n, h * dh),
        v.reshape(b, n, h * dh), heads=h, q_tile=q_tile, interpret=interpret,
    )
    return out.reshape(b, n, h, dh)


@functools.partial(
    jax.jit, static_argnames=("heads", "q_tile", "interpret")
)
def _attention_fwd_hd(q, k, v, *, heads, q_tile, interpret):
    b, n, hd = q.shape
    dh = hd // heads
    scale = dh ** -0.5
    n_pad = _round_up(n, q_tile)
    pad = lambda x: jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))  # noqa: E731
    qb, kb, vb = pad(q), pad(k), pad(v)

    def kernel(q_ref, k_ref, v_ref, out_ref):
        # GEMM operands stay in the input dtype (bf16 on hardware: the
        # MXU runs bf16 matmuls ~4x faster than f32) with f32
        # accumulation; only softmax runs in f32.
        qt = q_ref[0]  # [TQ, H*Dh]
        kt = k_ref[0]  # [N_pad, H*Dh]
        vt = v_ref[0]
        col = None
        for hh in range(heads):
            sl = slice(hh * dh, (hh + 1) * dh)
            scores = scale * jax.lax.dot_general(
                qt[:, sl], kt[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TQ, N_pad] f32
            if col is None:
                col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < n, scores, -jnp.inf)
            weights = jax.nn.softmax(scores, axis=-1)
            out_ref[0, :, sl] = jax.lax.dot_general(
                weights.astype(vt.dtype), vt[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)

    grid = (b, n_pad // q_tile)
    tile_spec = pl.BlockSpec(
        (1, q_tile, hd), lambda ib, iq: (ib, iq, 0), memory_space=pltpu.VMEM
    )
    full_spec = pl.BlockSpec(
        (1, n_pad, hd), lambda ib, iq: (ib, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec, full_spec, full_spec],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n_pad * n_pad * dh,
            bytes_accessed=4 * b * n_pad * hd * q.dtype.itemsize,
            transcendentals=b * heads * n_pad * n_pad,
        ),
        # single-tile grids (q_tile = n_pad) exceed the default 16 MB
        # scoped-vmem limit; v5e has headroom above it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(qb, kb, vb)
    return out[:, :n]


def _fused_attention_fwd(q, k, v, q_tile, interpret):
    return fused_attention(q, k, v, q_tile, interpret), (q, k, v)


@functools.partial(
    jax.jit, static_argnames=("heads", "q_tile", "interpret")
)
def _attention_bwd_hd(q, k, v, g, *, heads, q_tile, interpret):
    """Fused attention backward: recompute scores/softmax per (q-tile,
    head) in VMEM and form dq/dk/dv without any [N, N] matrix in HBM.
    dk/dv accumulate across q-tiles in their VMEM output blocks (the TPU
    grid is sequential, so revisiting an output block is a reduction)."""
    b, n, hd = q.shape
    dh = hd // heads
    scale = dh ** -0.5
    n_pad = _round_up(n, q_tile)
    pad = lambda x: jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))  # noqa: E731
    qb, kb, vb, gb = pad(q), pad(k), pad(v), pad(g)
    q_tiles = n_pad // q_tile

    def kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
        iq = pl.program_id(1)

        @pl.when(iq == 0)
        def _init():
            dk_ref[:] = jnp.zeros_like(dk_ref)
            dv_ref[:] = jnp.zeros_like(dv_ref)

        # GEMM operands stay in the input dtype (bf16 on hardware, ~4x
        # MXU rate vs f32); softmax and the ds combination run in f32.
        qt = q_ref[0]  # [TQ, H*Dh]
        kt = k_ref[0]  # [N_pad, H*Dh]
        vt = v_ref[0]
        gt = g_ref[0]
        col = None
        for hh in range(heads):
            sl = slice(hh * dh, (hh + 1) * dh)
            qh, kh, vh, gh = qt[:, sl], kt[:, sl], vt[:, sl], gt[:, sl]
            scores = scale * jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TQ, N_pad] f32
            if col is None:
                col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < n, scores, -jnp.inf)
            p = jax.nn.softmax(scores, axis=-1)
            pb = p.astype(qt.dtype)
            # padded q rows have g == 0, so their ds/dq vanish and they
            # add nothing to dk/dv — no row mask needed.
            dv_ref[0, :, sl] += jax.lax.dot_general(  # p^T g  [N_pad, Dh]
                pb, gh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)
            dp = jax.lax.dot_general(  # g v^T  [TQ, N_pad]
                gh, vh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
            dsb = ds.astype(qt.dtype)
            dq_ref[0, :, sl] = (scale * jax.lax.dot_general(  # ds k
                dsb, kh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )).astype(dq_ref.dtype)
            dk_ref[0, :, sl] += (scale * jax.lax.dot_general(  # ds^T q
                dsb, qh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )).astype(dk_ref.dtype)

    grid = (b, q_tiles)
    tile_spec = pl.BlockSpec(
        (1, q_tile, hd), lambda ib, iq: (ib, iq, 0), memory_space=pltpu.VMEM
    )
    full_spec = pl.BlockSpec(
        (1, n_pad, hd), lambda ib, iq: (ib, 0, 0), memory_space=pltpu.VMEM
    )
    dqb, dkb, dvb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec, full_spec, full_spec, tile_spec],
        out_specs=[tile_spec, full_spec, full_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * heads * n_pad * n_pad * dh,
            bytes_accessed=7 * b * n_pad * hd * 4,
            transcendentals=b * heads * n_pad * n_pad,
        ),
        # single-tile grids (q_tile = n_pad) exceed the default 16 MB
        # scoped-vmem limit; v5e has headroom above it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(qb, kb, vb, gb)
    return dqb[:, :n], dkb[:, :n], dvb[:, :n]


def _fused_attention_bwd(q_tile, interpret, residuals, g):
    q, k, v = residuals
    b, n, h, dh = q.shape
    if q_tile is None:
        q_tile = _auto_q_tile(n)
    dq, dk, dv = _attention_bwd_hd(
        q.reshape(b, n, h * dh), k.reshape(b, n, h * dh),
        v.reshape(b, n, h * dh), g.reshape(b, n, h * dh),
        heads=h, q_tile=q_tile, interpret=interpret,
    )
    return (
        dq.reshape(b, n, h, dh).astype(q.dtype),
        dk.reshape(b, n, h, dh).astype(k.dtype),
        dv.reshape(b, n, h, dh).astype(v.dtype),
    )


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
