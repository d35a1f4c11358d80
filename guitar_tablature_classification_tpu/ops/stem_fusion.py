"""Precomposed ResNet stem front: resize∘tile∘normalize∘conv1 as GEMMs.

The flagship 224² recipe upsamples the [96, 9] CQT bicubically to 224²,
tiles it to 3 channels, ImageNet-normalizes, and runs conv1 7×7/s2
(my_dataloader.py:17-30 + bestengine.py:24 semantics).  Every stage is
LINEAR in the CQT values, so the whole front is one linear map
``[96, 9] -> [112, 112, 64]`` that never needs the 224² image:

    y[p,q,f] = Σ_{i,j,c} W[i,j,c,f] · ((R_h X R_wᵀ)[2p+i-3, 2q+j-3] - μ_c)/σ_c
             = Σ_{i,j} ( Σ_c W[i,j,c,f]/σ_c ) · (Rh_i X Rw_jᵀ)[p,q]  +  bias[p,q,f]

with ``Rh_i[p,u] = R_h[2p+i-3, u]`` (zero rows where conv padding falls
outside the image — that reproduces conv1's zero padding exactly) and a
static bias field carrying the -μ/σ offset with the correct per-pixel
valid-tap count.  Evaluated as three small einsums (~45 GFLOP at B=256
vs conv1's 60 GFLOP at ~35 TF/s plus a 154 MB image materialization).

Exact up to float reassociation; gradients flow to the conv1 kernel
through the factorization, so parameters, checkpoints, and torch
import/export are unchanged.  Validated against the standard path in
tests/test_models.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .normalize import IMAGENET_MEAN, IMAGENET_STD
from .resize import resize_matrix


@functools.lru_cache(maxsize=16)
def _front_matrices(
    src_h: int,
    src_w: int,
    out: int = 224,
    kernel: int = 7,
    stride: int = 2,
    a: float = -0.75,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (RH [k, out/s, src_h], RW [k, out/s, src_w],
    INH [out/s, k], INW [out/s, k]) — per-tap resize rows and
    inside-the-image indicators (zero where conv1's padding falls
    outside, matching its zero padding)."""
    r_h = resize_matrix(src_h, out, a)
    r_w = resize_matrix(src_w, out, a)
    oh = out // stride
    pad = kernel // 2

    def build(r, src):
        taps = np.zeros((kernel, oh, src), np.float32)
        inside = np.zeros((oh, kernel), np.float32)
        for i in range(kernel):
            for p in range(oh):
                row = stride * p + i - pad
                if 0 <= row < out:
                    taps[i, p] = r[row]
                    inside[p, i] = 1.0
        return taps, inside

    rh, inh = build(r_h, src_h)
    rw, inw = build(r_w, src_w)
    return rh, rw, inh, inw


def precomposed_conv1(
    x: jax.Array,
    conv1_kernel: jax.Array,
    *,
    out_size: int = 224,
    stride: int = 2,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """x: [B, src_h, src_w] unit-scaled CQT (db_to_unit output);
    conv1_kernel: [7, 7, 3, 64] (flax HWIO).  Returns what
    ``conv1(imagenet_normalize(tile(resize(x))))`` would return:
    [B, out_size//stride, out_size//stride, 64]."""
    b, src_h, src_w = x.shape
    k = conv1_kernel.shape[0]
    rh, rw, inh, inw = _front_matrices(src_h, src_w, out_size, k, stride)
    w = conv1_kernel.astype(jnp.float32)
    inv_std = 1.0 / jnp.asarray(IMAGENET_STD, jnp.float32)
    mu_std = jnp.asarray(IMAGENET_MEAN, jnp.float32) * inv_std
    w1 = jnp.einsum("ijcf,c->ijf", w, inv_std)  # value path
    wmu = jnp.einsum("ijcf,c->ijf", w, mu_std)  # -mean/std offset
    bias = -jnp.einsum(
        "pi,qj,ijf->pqf", jnp.asarray(inh), jnp.asarray(inw), wmu
    )

    oh = out_size // stride
    src_w_taps = rw.shape[-1]
    xf = x.astype(dtype)
    # H[b,p,(i,v)] = Σ_u RH[i,p,u] x[b,u,v] — tiny ([B, 112, 63])
    h = jnp.einsum(
        "ipu,buv->bpiv", jnp.asarray(rh, dtype), xf,
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(b, oh, k * src_w_taps)
    # S[(i,v), (q,f)] = Σ_j W1[i,j,f] RW[j,q,v] — param-dependent but tiny
    s = jnp.einsum(
        "ijf,jqv->ivqf", w1.astype(dtype), jnp.asarray(rw, dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(k * src_w_taps, oh * w.shape[-1])
    # ONE clean GEMM straight into conv1's output — no big intermediate
    y = jnp.einsum(
        "bpk,km->bpm", h, s, preferred_element_type=jnp.float32
    ).reshape(b, oh, oh, w.shape[-1])
    return (y + bias).astype(dtype)


def precomposed_conv1_quadrant(
    x: jax.Array,
    conv1_kernel: jax.Array,
    *,
    out_size: int = 224,
    stride: int = 2,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Same math as :func:`precomposed_conv1`, emitted in the quadrant
    layout :mod:`.stem_pallas` consumes: ``[B, 2, OH//2, OH*F]`` with
    ``yq[b, p%2, p//2, (q%2)*(OH//2)*F + (q//2)*F + f] == y[b,p,q,f]``.

    Two differences from the plain variant, both exact at fp32:

    - the static −μ/σ bias field enters as ``k`` extra GEMM rows (the
      per-row inside-image indicators ``inh[p, :]`` join the patch
      vector, the per-(q, f) bias factors join the weight matrix), so
      the GEMM is the *only* pass over the 112² tensor;
    - the weight matrix's columns and the patch matrix's rows are
      pre-permuted into even/odd parity order, so the quadrant layout
      costs nothing.

    Replaces conv1 of bestengine.py:23-24 with preprocessing
    (my_dataloader.py:17-30) folded in; the output feeds
    :func:`..ops.stem_pallas.bn_relu_pool`.
    """
    b, src_h, src_w = x.shape
    k = conv1_kernel.shape[0]
    feats = conv1_kernel.shape[-1]
    rh, rw, inh, inw = _front_matrices(src_h, src_w, out_size, k, stride)
    w = conv1_kernel.astype(jnp.float32)
    inv_std = 1.0 / jnp.asarray(IMAGENET_STD, jnp.float32)
    mu_std = jnp.asarray(IMAGENET_MEAN, jnp.float32) * inv_std
    w1 = jnp.einsum("ijcf,c->ijf", w, inv_std)
    wmu = jnp.einsum("ijcf,c->ijf", w, mu_std)

    oh = out_size // stride
    if oh % 2:
        raise ValueError(f"quadrant stem front needs even {oh=}")
    xf = x.astype(dtype)
    h = jnp.einsum(
        "ipu,buv->bpiv", jnp.asarray(rh, dtype), xf,
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(b, oh, k * src_w)
    # bias-as-GEMM rows: patch side carries inh[p, i] (exact 0/1 in any
    # dtype), weight side carries -Σ_j inw[q,j]·wmu[i,j,f]
    ha = jnp.concatenate(
        [h, jnp.broadcast_to(jnp.asarray(inh, dtype), (b, oh, k))], axis=-1
    )  # [B, OH, k*src_w + k]
    hq = jnp.stack([ha[:, 0::2], ha[:, 1::2]], axis=1)  # [B, 2, OH/2, K]
    s3 = jnp.einsum(
        "ijf,jqv->ivqf", w1.astype(dtype), jnp.asarray(rw, dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(k * src_w, oh, feats)
    brows = -jnp.einsum(
        "qj,ijf->iqf", jnp.asarray(inw, jnp.float32), wmu
    ).astype(dtype)  # [k, OH, F]
    sall = jnp.concatenate([s3, brows], axis=0)  # [K, OH, F]
    sq = jnp.concatenate([sall[:, 0::2], sall[:, 1::2]], axis=1).reshape(
        sall.shape[0], oh * feats
    )  # columns in (col-parity, q-half, f) order
    return jnp.einsum(
        "brhk,kn->brhn", hq, sq, preferred_element_type=jnp.float32
    ).astype(dtype)
