"""Fused multi-head attention Pallas kernel for the ViT backbone.

At ViT-S/8 scale (N = 785 tokens, head_dim 64) the whole K/V of one head
is ~200 KB — it fits VMEM outright, so the right TPU design is not a
flash-attention streaming loop but a single fused kernel per (batch*head,
query-tile): scores, mask, softmax and the value contraction all happen
on-chip with no [N, N] attention matrix ever touching HBM.

grid = (B*H, ceil(N / TQ)); K/V blocks are constant along the query-tile
axis (fetched once per batch*head).  Sequence lengths that aren't
tile-aligned are zero-padded by the wrapper and masked with -inf inside
the kernel.  Numerics match jax.nn.dot_product_attention (tested in
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """q, k, v: [B, N, H, Dh] -> [B, N, H, Dh] (same layout as
    jax.nn.dot_product_attention), scale = Dh**-0.5."""
    b, n, h, dh = q.shape
    scale = dh ** -0.5
    n_pad = _round_up(n, q_tile)

    def to_bh(x):  # [B, N, H, Dh] -> [B*H, N_pad, Dh]
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, dh)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    def kernel(q_ref, k_ref, v_ref, out_ref):
        qt = q_ref[0].astype(jnp.float32) * scale  # [TQ, Dh]
        kt = k_ref[0].astype(jnp.float32)  # [N_pad, Dh]
        scores = jax.lax.dot_general(
            qt, kt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, N_pad]
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n, scores, -jnp.inf)
        weights = jax.nn.softmax(scores, axis=-1)
        out_ref[0] = jax.lax.dot_general(
            weights, v_ref[0].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)

    grid = (b * h, n_pad // q_tile)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, dh), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, dh), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, dh), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, dh), lambda bh, iq: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_pad * n_pad * dh,
            bytes_accessed=4 * b * h * n_pad * dh * q.dtype.itemsize,
            transcendentals=b * h * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :n].reshape(b, h, n, dh)
    return jnp.transpose(out, (0, 2, 1, 3))  # back to [B, N, H, Dh]


def _fused_attention_fwd(q, k, v, q_tile, interpret):
    return fused_attention(q, k, v, q_tile, interpret), (q, k, v)


def _fused_attention_bwd(q_tile, interpret, residuals, g):
    """Recompute backward in XLA: at N=785 the [N, N] weights of the
    recomputed forward fit comfortably, so a hand-written Pallas backward
    buys nothing; the Pallas kernel keeps the *forward* (serving) path
    free of HBM attention matrices."""
    del q_tile, interpret
    q, k, v = residuals
    dh = q.shape[-1]
    scale = dh ** -0.5
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
    p = jax.nn.softmax(scores, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
