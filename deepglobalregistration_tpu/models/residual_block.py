"""Residual block over sparse features (model/residual_block.py:83-146).

BasicBlock = conv(k3) - norm - relu - conv(k3) - norm - (+skip) - relu.
Stride-1 only (the DGR model zoo never uses strided blocks), so both convs share
one kernel map. Parameter names mirror the reference: conv1/norm1/conv2/norm2.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import common


def init_block(key: jax.Array, norm_type: str, planes_in: int, planes: int,
               kernel_volume: int, fan: str = "in") -> Tuple[common.Params, common.Params]:
    k1, k2 = jax.random.split(key)
    n1p, n1s = common.init_norm(norm_type, planes)
    n2p, n2s = common.init_norm(norm_type, planes)
    params = {
        "conv1": common.init_conv(k1, kernel_volume, planes_in, planes, fan=fan),
        "norm1": n1p,
        "conv2": common.init_conv(k2, kernel_volume, planes, planes, fan=fan),
        "norm2": n2p,
    }
    state = {"norm1": n1s, "norm2": n2s}
    return params, state


def apply_block(params: common.Params, state: common.Params, norm_type: str,
                feats: jnp.ndarray, kmap: jnp.ndarray, mask: jnp.ndarray,
                train: bool, bn_momentum: float):
    """feats [B, N, C], kmap [B, K, N], mask [B, N]. Returns (out, new_state)."""
    residual = feats
    out = common.apply_conv_batched(params["conv1"], feats, kmap)
    out, s1 = common.apply_norm(norm_type, params["norm1"], state["norm1"], out, mask,
                                train, bn_momentum)
    out = common.apply_nonlinearity("ReLU", out)
    out = common.apply_conv_batched(params["conv2"], out, kmap)
    out, s2 = common.apply_norm(norm_type, params["norm2"], state["norm2"], out, mask,
                                train, bn_momentum)
    out = common.apply_nonlinearity("ReLU", out + residual)
    return out, {"norm1": s1, "norm2": s2}
