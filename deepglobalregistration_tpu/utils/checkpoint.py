"""Checkpoint I/O: torch .pth ingestion + native framework checkpoints.

The reference ships pretrained weights as torch checkpoints with schema
{epoch, state_dict, state_dict_inlier, optimizer, scheduler, config, best_val,
best_val_epoch, best_val_metric} (trainer.py:536-546, loaded at
deep_global_registration.py:88-93). ``load_torch_checkpoint`` reads that exact
schema (torch CPU is available in the image) and ``convert_state_dict`` maps a
MinkowskiEngine state_dict onto our functional param/state pytrees — parameter
names were chosen to mirror ME's, so conversion is a mechanical re-nesting:

    ME                          ours
    conv1.kernel            ->  params["conv1"]["kernel"]          [K, Cin, Cout]
    norm1.bn.weight/bias    ->  params["norm1"]["weight"/"bias"]
    norm1.bn.running_mean   ->  state["norm1"]["mean"]
    block1.conv2.kernel     ->  params["block1"]["conv2"]["kernel"]
    final.kernel/final.bias ->  params["final"]["kernel"/"bias"]   (k=1 convs
                                stored [Cin, Cout] by ME -> expanded to [1, ..])

Native checkpoints are a single pickle of numpy pytrees with the reference's
top-level schema so resume logic (trainer.py:491-525) carries over.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _set_nested(tree: Dict[str, Any], path: list[str], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_state_dict(sd: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a MinkowskiEngine-style state_dict into (params, bn_state) pytrees."""
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    for name, tensor in sd.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        parts = name.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        if parts[-1] == "kernel":
            if arr.ndim == 2:  # ME stores kernel_size=1 convs as [Cin, Cout]
                arr = arr[None]
            _set_nested(params, parts, arr.astype(np.float32))
        elif parts[-1] == "bias" and "bn" not in parts:
            _set_nested(params, parts, arr.astype(np.float32))
        elif "bn" in parts:  # norm layers: <scope>.bn.{weight,bias,running_mean,running_var}
            scope = parts[:-2]  # drop "bn", leaf
            leaf = parts[-1]
            if leaf in ("weight", "bias"):
                _set_nested(params, scope + [leaf], arr.astype(np.float32))
            elif leaf == "running_mean":
                _set_nested(state, scope + ["mean"], arr.astype(np.float32))
            elif leaf == "running_var":
                _set_nested(state, scope + ["var"], arr.astype(np.float32))
        else:
            _set_nested(params, parts, arr.astype(np.float32))
    return params, state


def load_torch_checkpoint(path: str | Path) -> Dict[str, Any]:
    """Load a reference .pth checkpoint; returns the raw dict plus converted trees.

    Keys added: fcgf_params/fcgf_state (from state_dict) and
    inlier_params/inlier_state (from state_dict_inlier, when present).
    """
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    out = dict(ckpt)
    if "state_dict" in ckpt:
        out["fcgf_params"], out["fcgf_state"] = convert_state_dict(ckpt["state_dict"])
    if "state_dict_inlier" in ckpt and ckpt["state_dict_inlier"] is not None:
        out["inlier_params"], out["inlier_state"] = convert_state_dict(ckpt["state_dict_inlier"])
    return out


def save_checkpoint(path: str | Path, *, epoch: int, params, state,
                    inlier_params=None, inlier_state=None, opt_state=None,
                    config: Dict[str, Any] | None = None, best_val: float = -1e8,
                    best_val_epoch: int = -1, best_val_metric: str = "succ_rate"):
    """Save a native checkpoint with the reference's top-level schema
    (trainer.py:527-549)."""
    to_np = lambda tree: jax.tree.map(lambda x: np.asarray(x), tree)
    payload = {
        "epoch": epoch,
        "state_dict": {"params": to_np(params), "state": to_np(state)},
        "state_dict_inlier": None if inlier_params is None else
            {"params": to_np(inlier_params), "state": to_np(inlier_state)},
        "optimizer": None if opt_state is None else to_np(opt_state),
        "config": config,
        "best_val": best_val,
        "best_val_epoch": best_val_epoch,
        "best_val_metric": best_val_metric,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str | Path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
