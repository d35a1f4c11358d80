"""Fused training-mode BatchNorm for NHWC trunk tensors.

The flagship ResNet18 trunk carries 20 train-mode BatchNorms whose
batch-statistic reductions cost ~2.9 ms/step at B=256 on v5e (measured
as the frozen-BN bound, DESIGN.md round-2 study): XLA lowers each
``mean``/``mean-of-squares`` pair plus the backward's ``sum(g)`` /
``sum(g*xhat)`` pair into separate cast+reduce passes over the (up to
102 MB) activation tensors.  This module fuses each direction's
reductions into ONE Pallas pass:

- forward: a single read of ``y`` produces per-channel ``sum`` and
  ``sum of squares`` (f32 accumulation) -> batch mean/var;
- backward: a single read of ``(y, g)`` produces ``sum(g)`` and
  ``sum(g*y)``, from which the exact train-mode BatchNorm gradient is
  emitted analytically (custom VJP) — the same closed form validated
  for the stem tail in :mod:`.stem_pallas`:

      dy = se*(g - mean(g) - xhat*mean(g*xhat)),  se = gamma*rstd

The normalize *apply* (``y*a + b`` per channel) and the backward's
elementwise ``dy`` expression stay in XLA, where they fuse into the
surrounding convolution/ReLU epilogues for free.

Lane layout: ``y`` is viewed as ``[M, L]`` with ``L = lcm(C, 128)``
(128-lane alignment for Mosaic; per-lane sums fold to per-channel by a
``[L//C, C]`` reshape outside the kernel).  The XLA twin (``impl='xla'``)
is the CPU oracle and no-Mosaic fallback.

Reference semantics: torch ``BatchNorm2d(track_running_stats=True)``
inside torchvision resnet18 (``/root/reference/bestengine.py:23``) ==
flax ``nn.BatchNorm(momentum=0.9, eps=1e-5, use_fast_variance)`` as used
in models/resnet.py:38-41.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lane_view(y: jax.Array, channels: int) -> tuple[jax.Array, int]:
    """Reshape [..., C] to [M, L] with L = lcm(C, 128) lanes."""
    lanes = math.lcm(channels, 128)
    if y.size % lanes:
        raise ValueError(
            f"tensor size {y.shape} not divisible by lane width {lanes}"
        )
    return y.reshape(y.size // lanes, lanes), lanes


def _fold(per_lane: jax.Array, channels: int) -> jax.Array:
    """Per-lane sums [L] -> per-channel [C]."""
    return per_lane.reshape(-1, channels).sum(axis=0)


def _pick_mt(m: int, lanes: int, itemsize: int, budget: int) -> int:
    """Largest divisor of m whose block fits the VMEM budget (small
    tiles pay a fixed ~15-20 us per-grid-step cost — see stem_pallas)."""
    mt = max(1, budget // max(lanes * itemsize, 1))
    while m % mt:
        mt -= 1
    return mt


@functools.partial(jax.jit, static_argnames=("interpret", "mt"))
def _sums_pallas(y2, *, interpret=False, mt=None):
    """[M, L] -> [2, L] f32 per-lane (sum, sum of squares), one pass."""
    m, lanes = y2.shape
    if mt is None:
        mt = _pick_mt(m, lanes, y2.dtype.itemsize, 8 * 2**20)

    def kernel(y_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        y = y_ref[:].astype(jnp.float32)
        out_ref[0, :] += jnp.sum(y, axis=0)
        out_ref[1, :] += jnp.sum(y * y, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(m // mt,),
        in_specs=[
            pl.BlockSpec((mt, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, lanes), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * m * lanes,
            bytes_accessed=m * lanes * y2.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(y2)


@functools.partial(jax.jit, static_argnames=("interpret", "mt"))
def _grad_sums_pallas(y2, g2, *, interpret=False, mt=None):
    """[M, L] x2 -> [2, L] f32 per-lane (sum g, sum g*y), one pass."""
    m, lanes = y2.shape
    if mt is None:
        mt = _pick_mt(m, 2 * lanes, y2.dtype.itemsize, 8 * 2**20)

    def kernel(y_ref, g_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        y = y_ref[:].astype(jnp.float32)
        g = g_ref[:].astype(jnp.float32)
        out_ref[0, :] += jnp.sum(g, axis=0)
        out_ref[1, :] += jnp.sum(g * y, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(m // mt,),
        in_specs=[
            pl.BlockSpec((mt, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mt, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, lanes), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * m * lanes,
            bytes_accessed=2 * m * lanes * y2.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(y2, g2)


def _resolve_impl(impl: str) -> str:
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def _xla_sums(y2):
    yf = y2.astype(jnp.float32)
    return jnp.stack([jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)])


def _xla_grad_sums(y2, g2):
    yf = y2.astype(jnp.float32)
    gf = g2.astype(jnp.float32)
    return jnp.stack([jnp.sum(gf, axis=0), jnp.sum(gf * yf, axis=0)])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def batch_norm_train(
    y: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    impl: str = "auto",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Training-mode BatchNorm over the last axis of NHWC ``y``.

    Returns ``(out, mean, var)``: ``out`` has ``y``'s dtype; ``mean`` /
    ``var`` are f32 batch statistics (``use_fast_variance`` semantics,
    E[x²]−E[x]²) for the caller's running-average update — their
    cotangents are ignored (non-differentiable state), while the full
    train-mode batch-stat gradient is folded into ``y``'s cotangent
    analytically.
    """
    c = y.shape[-1]
    y2, lanes = _lane_view(y, c)
    n = y.size // c
    if _resolve_impl(impl) == "pallas":
        sums = _sums_pallas(y2, interpret=interpret)
    else:
        sums = _xla_sums(y2)
    mean = _fold(sums[0], c) / n
    var = _fold(sums[1], c) / n - mean**2
    rstd = jax.lax.rsqrt(var + eps)
    # flax _normalize op order ((x - mean) * mul + bias) so fp32 outputs
    # match nn.BatchNorm to reassociation noise; XLA fuses the
    # elementwise chain into one pass either way.
    mul = (rstd * scale.astype(jnp.float32)).astype(y.dtype)
    out = (y - mean.astype(y.dtype)) * mul + bias.astype(y.dtype)
    return out, mean, var


def _batch_norm_train_fwd(y, scale, bias, eps, impl, interpret):
    out = batch_norm_train(y, scale, bias, eps, impl, interpret)
    _, mean, var = out
    return out, (y, mean, var, scale)


def _batch_norm_train_bwd(eps, impl, interpret, residuals, cotangents):
    g, _gmean, _gvar = cotangents
    y, mean, var, scale = residuals
    c = y.shape[-1]
    n = y.size // c
    y2, lanes = _lane_view(y, c)
    g2, _ = _lane_view(g.astype(y.dtype), c)
    if _resolve_impl(impl) == "pallas":
        sums = _grad_sums_pallas(y2, g2, interpret=interpret)
    else:
        sums = _xla_grad_sums(y2, g2)
    sum_g = _fold(sums[0], c)
    sum_gy = _fold(sums[1], c)
    rstd = jax.lax.rsqrt(var + eps)
    se = scale.astype(jnp.float32) * rstd
    sum_gxhat = rstd * (sum_gy - mean * sum_g)
    # dy = se*(g - sum_g/n - xhat*sum_gxhat/n) = se*g + B*y + A
    bch = -se * rstd * sum_gxhat / n
    ach = -se * sum_g / n - bch * mean
    dy = (
        g.astype(jnp.float32) * se
        + y.astype(jnp.float32) * bch
        + ach
    ).astype(y.dtype)
    return (
        dy,
        sum_gxhat.astype(scale.dtype),
        sum_g.astype(scale.dtype),
    )


batch_norm_train.defvjp(_batch_norm_train_fwd, _batch_norm_train_bwd)
