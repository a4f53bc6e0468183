"""Fold inference-mode BatchNorm into adjacent conv weights (load-time fusion).

SURVEY.md 7.3 'cheap win': at inference every BN is an affine per-channel map
``y = (x - m) * g / sqrt(v + eps) + b`` applied right after a bias-free conv,
so it folds exactly into the conv kernel (scale over the output channel) plus a
bias. This removes all norm traffic from the hot forward and is exact up to
f32 rounding. Training must keep live BN — folding is inference-only.

Supported: the conv{i}/norm{i} (+_tr) naming shared by the ResUNet v1/v2 and
SimpleNet families, including residual-block conv1/norm1/conv2/norm2 subtrees,
with norm_type 'BN'. Other norm types (IN/INBN) pass through unfolded.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import numpy as np

_EPS = 1e-5


def _fold_pair(conv: Dict[str, Any], norm_p: Dict[str, Any],
               norm_s: Dict[str, Any]) -> Dict[str, Any]:
    scale = np.asarray(norm_p["weight"]) / np.sqrt(np.asarray(norm_s["var"]) + _EPS)
    bias = np.asarray(norm_p["bias"]) - np.asarray(norm_s["mean"]) * scale
    kernel = np.asarray(conv["kernel"]) * scale[None, None, :]
    out = {"kernel": kernel.astype(np.float32)}
    if "bias" in conv:
        out["bias"] = (np.asarray(conv["bias"]) * scale + bias).astype(np.float32)
    else:
        out["bias"] = bias.astype(np.float32)
    return out


def _is_block(v) -> bool:
    return isinstance(v, dict) and "conv1" in v and "norm1" in v


def _fold_block(bp: Dict[str, Any], bs: Dict[str, Any]):
    new = dict(bp)
    for i in ("1", "2"):
        new[f"conv{i}"] = _fold_pair(bp[f"conv{i}"], bp[f"norm{i}"], bs[f"norm{i}"])
        new[f"norm{i}"] = {}
    return new


def fold_batch_norms(params: Dict[str, Any], state: Dict[str, Any], cfg
                     ) -> Tuple[Dict[str, Any], Dict[str, Any], Any]:
    """Returns (params', state', cfg') with BN folded and norm types 'NONE'.

    cfg must expose norm_type/block_norm_type == 'BN' (otherwise returned
    unchanged). Only use the result with train=False.
    """
    if getattr(cfg, "norm_type", None) != "BN" or \
            getattr(cfg, "block_norm_type", "BN") != "BN":
        return params, state, cfg

    new_p: Dict[str, Any] = {}
    for name, value in params.items():
        if name.startswith("conv"):
            norm_name = name.replace("conv", "norm")
            if norm_name in params and params[norm_name]:
                new_p[name] = _fold_pair(value, params[norm_name], state[norm_name])
            else:
                new_p[name] = value
        elif name.startswith("norm"):
            new_p[name] = {}
        elif _is_block(value):
            new_p[name] = _fold_block(value, state[name])
        elif isinstance(value, dict) and all(_is_block(v) for v in value.values()):
            # Sequential block stacks (v2 family): {"0": block, "1": block, ...}
            new_p[name] = {k: _fold_block(v, state[name][k]) for k, v in value.items()}
        else:
            new_p[name] = value

    # State is kept structurally intact — 'NONE' norms never read it — so the
    # apply() plumbing stays untouched.
    fields = {"norm_type": "NONE"}
    if hasattr(cfg, "block_norm_type"):
        fields["block_norm_type"] = "NONE"
    return new_p, state, dataclasses.replace(cfg, **fields)
