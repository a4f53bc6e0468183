"""Shared model building blocks: norm/nonlinearity application, conv params.

Mirrors model/common.py:11-31 (get_norm/get_nonlinearity) and the conv factories
of model/residual_block.py:15-80, re-expressed as functional param pytrees.

Parameter layout mirrors MinkowskiEngine state_dict structure so the torch
checkpoint converter is a direct name map:
- conv:  {"kernel": [K, Cin, Cout]} (+ "bias": [Cout])
- BN:    params {"weight": [C], "bias": [C]}, state {"mean": [C], "var": [C]}
  (ME's MinkowskiBatchNorm stores these under `<name>.bn.*`)
- IN:    no parameters (ME MinkowskiInstanceNorm).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import edge_conv as ec
from ..ops import sparse_conv as sc

Params = Dict[str, Any]


def init_conv(key: jax.Array, k: int, cin: int, cout: int, bias: bool = False,
              fan: str = "in") -> Params:
    """Kaiming init. fan='in' (kernel_volume * Cin, ME's kaiming_normal_
    default) or fan='out' (kernel_volume * Cout — the v2 family's explicit
    weight_initialization, reference resunet.py:878-881)."""
    std = (2.0 / (k * (cin if fan == "in" else cout))) ** 0.5
    p = {"kernel": jax.random.normal(key, (k, cin, cout), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def init_norm(norm_type: str, c: int) -> Tuple[Params, Params]:
    """Returns (params, state) for a norm layer of the given type."""
    if norm_type == "BN" or norm_type == "INBN":
        return ({"weight": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)},
                {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)})
    if norm_type in ("IN", "NONE"):
        return {}, {}
    raise ValueError(f"norm type {norm_type} not defined")


def apply_norm(norm_type: str, params: Params, state: Params, feats: jnp.ndarray,
               mask: jnp.ndarray, train: bool, bn_momentum: float):
    """Apply BN / IN / IN+BN over padded sparse features (mask = valid rows).

    feats: [B, N, C] (BN stats span the whole batch, like torch); mask [B, N].
    Returns (out, new_state).
    """
    if norm_type == "NONE":
        # folded-away norm (utils/fold_bn.py); params/state are unused
        return feats, state
    if norm_type == "IN":
        # per-instance stats: vmap instance_norm over batch
        out = jax.vmap(sc.instance_norm)(feats, mask)
        return out, state
    if norm_type == "INBN":
        feats = jax.vmap(sc.instance_norm)(feats, mask)
        norm_type = "BN"
    if norm_type == "BN":
        if train:
            out, nm, nv = sc.batch_norm_train(feats, mask, params["weight"], params["bias"],
                                              state["mean"], state["var"], bn_momentum)
            return out, {"mean": nm, "var": nv}
        out = sc.batch_norm_infer(feats, params["weight"], params["bias"],
                                  state["mean"], state["var"])
        return out, state
    raise ValueError(f"norm type {norm_type} not defined")


def apply_nonlinearity(kind: str, feats: jnp.ndarray) -> jnp.ndarray:
    """model/common.py:24-31: ReLU or ELU."""
    if kind == "ReLU":
        return sc.relu(feats)
    if kind == "ELU":
        return sc.elu(feats)
    raise ValueError(f"nonlinearity {kind} not defined")


def apply_conv_batched(params: Params, feats: jnp.ndarray, kmap) -> jnp.ndarray:
    """Batched sparse conv: feats [B, N, Cin], kmap [B, K, M] -> [B, M, Cout].

    kmap may instead be a batched (EdgeMap, out_rows) pair from the
    edge-compacted 6D path (models/unet_plan.py) — FLOPs then scale with the
    actual edge count instead of K * M."""
    bias = params.get("bias")
    if isinstance(kmap, ec.SizedEdgeMap):
        return jax.vmap(lambda f, e: ec.sparse_conv_edges(
            f, params["kernel"], e, bias=bias, out_rows=kmap.out_rows))(
            feats, kmap.em)
    return jax.vmap(lambda f, km: sc.sparse_conv(f, params["kernel"], km, bias=bias))(feats, kmap)


def apply_conv1_ones(params: Params, occ: jnp.ndarray,
                     compute_dtype) -> jnp.ndarray:
    """First conv with an all-ones input: out = occupancy @ kernel.

    occ: bool [B, M, K] (plan.conv1_ones). Requires Cin == 1; exact — each
    output row sums precisely the kernel rows its kernel-map entries select
    (ops/dense_grid.conv1_ones_occupancy)."""
    kernel = params["kernel"]
    assert kernel.shape[1] == 1, "conv1-ones fast path needs Cin == 1"
    w = kernel[:, 0, :].astype(compute_dtype)
    out = jnp.einsum("bmk,kc->bmc", occ.astype(compute_dtype), w,
                     preferred_element_type=jnp.float32)
    bias = params.get("bias")
    if bias is not None:
        out = out + bias
    return out.astype(compute_dtype)
