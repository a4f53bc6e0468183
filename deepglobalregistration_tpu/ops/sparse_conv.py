"""Generalized sparse convolution as gather-GEMM accumulation over kernel maps.

TPU-native replacement for MinkowskiEngine's MinkowskiConvolution /
MinkowskiConvolutionTranspose / pooling / norm layers (reference usage:
model/residual_block.py:15-80, model/common.py:11-31, model/resunet.py).

Compute model: given a kernel map idx[K, M] (see ops/kernel_map.py) and input
features F[N, Cin], the convolution is

    out[j] = sum_k  W[k]^T  F[idx[k, j]]        (idx < 0 contributes zero)

evaluated as K gather + [M, Cin] x [Cin, Cout] matmul accumulations — each matmul
lands on the MXU; gathers are VPU/dynamic-gather work. Offsets are processed in
chunks under einsum so peak memory stays ~chunk * M * Cin.

All feature tensors are padded to static row counts; rows >= num are garbage and
must be masked by consumers (the norm layers here mask internally).

Functions are single-cloud ([N, C]); batch via jax.vmap (kernel weights are
broadcast). BatchNorm in training mode needs cross-batch statistics, so it takes
explicitly batched inputs ([B, N, C]) instead.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Offsets per einsum chunk: bounds gathered-activation memory (chunk*M*Cin floats).
_CONV_CHUNK = 32


def sparse_conv(feats: jnp.ndarray, kernel: jnp.ndarray, kmap: jnp.ndarray,
                bias: jnp.ndarray | None = None,
                precision=None) -> jnp.ndarray:
    """Apply a sparse convolution.

    feats:  [N, Cin] input features.
    kernel: [K, Cin, Cout] weights (MinkowskiEngine layout; K matches the kernel
            map's offset order). For K == 1 this is a plain matmul.
    kmap:   [K, M] int32 kernel map (-1 = empty site).
    Returns [M, Cout].
    """
    k, cin, cout = kernel.shape
    if kmap.shape[0] != k:
        raise ValueError(f"kernel map K={kmap.shape[0]} != kernel K={k}")
    m = kmap.shape[1]
    compute_dtype = feats.dtype

    if k == 1:
        valid = kmap[0] >= 0
        gathered = jnp.where(valid[:, None], feats[jnp.maximum(kmap[0], 0)], 0)
        out = jnp.dot(gathered, kernel[0].astype(compute_dtype),
                      preferred_element_type=jnp.float32)
    elif k <= _CONV_CHUNK:
        valid = kmap >= 0
        gathered = jnp.where(valid[..., None], feats[jnp.maximum(kmap, 0)], 0)
        out = jnp.einsum("kmc,kcd->md", gathered, kernel.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
    else:
        # Scan over offset chunks instead of unrolling: a 729-offset 6D conv
        # would otherwise emit ~23 gather+GEMM stages per conv and blow up
        # XLA graph size / compile time across a ~30-conv net.
        n_chunks = -(-k // _CONV_CHUNK)
        pad = n_chunks * _CONV_CHUNK - k
        kmap_p = jnp.pad(kmap, ((0, pad), (0, 0)), constant_values=-1)
        kern_p = jnp.pad(kernel.astype(compute_dtype), ((0, pad), (0, 0), (0, 0)))
        kmap_c = kmap_p.reshape(n_chunks, _CONV_CHUNK, m)
        kern_c = kern_p.reshape(n_chunks, _CONV_CHUNK, cin, cout)

        def body(acc, chunk):
            idx, w = chunk
            valid = idx >= 0
            gathered = jnp.where(valid[..., None], feats[jnp.maximum(idx, 0)], 0)
            return acc + jnp.einsum("kmc,kcd->md", gathered, w,
                                    preferred_element_type=jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.zeros((m, cout), jnp.float32),
                              (kmap_c, kern_c))
    if bias is not None:
        out = out + bias
    return out.astype(compute_dtype)


def sparse_sum_pool(feats: jnp.ndarray, kmap: jnp.ndarray) -> jnp.ndarray:
    """MinkowskiSumPooling / MinkowskiPoolingTranspose: unweighted neighbor sum.

    Reference usage: model/resunet.py:256,298 (ResUNetSP variants).
    feats [N, C], kmap [K, M] -> [M, C].
    """
    k = kmap.shape[0]
    out = jnp.zeros((kmap.shape[1], feats.shape[1]), dtype=jnp.float32)
    for start in range(0, k, _CONV_CHUNK):
        idx = kmap[start:start + _CONV_CHUNK]
        valid = idx >= 0
        gathered = jnp.where(valid[..., None], feats[jnp.maximum(idx, 0)], 0)
        out = out + jnp.sum(gathered, axis=0)
    return out.astype(feats.dtype)


def sparse_avg_pool(feats: jnp.ndarray, kmap: jnp.ndarray) -> jnp.ndarray:
    """Average pooling over valid neighbor sites."""
    counts = jnp.sum((kmap >= 0).astype(jnp.float32), axis=0)  # [M]
    summed = sparse_sum_pool(feats, kmap).astype(jnp.float32)
    return (summed / jnp.maximum(counts[:, None], 1.0)).astype(feats.dtype)


# ---------------------------------------------------------------------------
# Normalization / nonlinearities over padded sparse feature matrices
# ---------------------------------------------------------------------------

def batch_norm_infer(feats: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     mean: jnp.ndarray, var: jnp.ndarray,
                     eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode BatchNorm using running statistics (per channel)."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    out = (feats.astype(jnp.float32) - mean) * inv * scale + bias
    return out.astype(feats.dtype)


def masked_moments(feats: jnp.ndarray, mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-channel mean/biased-var over valid rows of [..., N, C] with mask [..., N].

    Reduces over every axis except the channel axis — for a batched [B, N, C]
    input this reproduces torch BatchNorm's whole-batch statistics
    (ME.MinkowskiBatchNorm; model/common.py:13).
    Returns (mean [C], var [C], count scalar).
    """
    maskf = mask.astype(jnp.float32)[..., None]
    x = feats.astype(jnp.float32) * maskf
    count = jnp.maximum(jnp.sum(maskf), 1.0)
    axes = tuple(range(feats.ndim - 1))
    mean = jnp.sum(x, axis=axes) / count
    var = jnp.sum(maskf * (feats.astype(jnp.float32) - mean) ** 2, axis=axes) / count
    return mean, var, count


def batch_norm_train(feats: jnp.ndarray, mask: jnp.ndarray, scale: jnp.ndarray,
                     bias: jnp.ndarray, running_mean: jnp.ndarray,
                     running_var: jnp.ndarray, momentum: float,
                     eps: float = 1e-5):
    """Training-mode BatchNorm with torch-compatible running-stat update.

    torch semantics: normalize with biased batch var; update running stats with
    ``running = (1 - momentum) * running + momentum * batch_stat`` using the
    *unbiased* variance.

    feats [B, N, C] (or [N, C]), mask matching leading dims.
    Returns (out, new_running_mean, new_running_var).
    """
    mean, var, count = masked_moments(feats, mask)
    inv = jax.lax.rsqrt(var + eps)
    out = ((feats.astype(jnp.float32) - mean) * inv * scale + bias).astype(feats.dtype)
    unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
    new_mean = (1 - momentum) * running_mean + momentum * mean
    new_var = (1 - momentum) * running_var + momentum * unbiased
    return out, new_mean, new_var


def instance_norm(feats: jnp.ndarray, mask: jnp.ndarray,
                  eps: float = 1e-5) -> jnp.ndarray:
    """Per-instance (single cloud) per-channel normalization (ME InstanceNorm)."""
    maskf = mask.astype(jnp.float32)[..., None]
    count = jnp.maximum(jnp.sum(maskf), 1.0)
    x = feats.astype(jnp.float32)
    mean = jnp.sum(x * maskf, axis=-2, keepdims=True) / count
    var = jnp.sum(maskf * (x - mean) ** 2, axis=-2, keepdims=True) / count
    return ((x - mean) * jax.lax.rsqrt(var + eps)).astype(feats.dtype)


def relu(feats: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(feats, 0)


def elu(feats: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.elu(feats)


def cat_features(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """ME.cat: concatenate features of two sparse tensors sharing a coord map
    (reference: model/resunet.py:624,631,638)."""
    return jnp.concatenate([a, b], axis=-1)
