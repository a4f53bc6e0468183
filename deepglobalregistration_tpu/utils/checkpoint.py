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


_ZMAGIC = b"DGRZ"  # compressed-checkpoint header (zlib-deflated pickle)


def _storage_cast(tree, dtype: str | None):
    """Cast float32 leaves to the storage dtype (``'bf16'``) or keep exact
    (``None``/``'f32'``). Integer/bool leaves always pass through."""
    if dtype in (None, "f32", "float32"):
        return jax.tree.map(np.asarray, tree)
    if dtype not in ("bf16", "bfloat16"):
        raise ValueError(f"unknown checkpoint dtype {dtype!r}")
    import ml_dtypes

    def cast(x):
        x = np.asarray(x)
        return x.astype(ml_dtypes.bfloat16) if x.dtype == np.float32 else x

    return jax.tree.map(cast, tree)


def _storage_uncast(tree):
    """Restore bf16-stored leaves to float32 (compute dtype)."""
    import ml_dtypes

    def uncast(x):
        if isinstance(x, np.ndarray) and x.dtype == ml_dtypes.bfloat16:
            return x.astype(np.float32)
        return x

    return jax.tree.map(uncast, tree)


def save_checkpoint(path: str | Path, *, epoch: int, params, state,
                    inlier_params=None, inlier_state=None, opt_state=None,
                    config: Dict[str, Any] | None = None, best_val: float = -1e8,
                    best_val_epoch: int = -1, best_val_metric: str = "succ_rate",
                    dtype: str | None = None, compress: bool = False):
    """Save a native checkpoint with the reference's top-level schema
    (trainer.py:527-549).

    ``dtype='bf16'`` stores float32 arrays as bfloat16 (halves the ~1 GB
    dense-6D-kernel inlier tree; load_checkpoint restores float32) and
    ``compress=True`` zlib-deflates the pickle. Both default OFF here so the
    raw utility stays lossless; the trainer passes its --ckpt_* knobs."""
    to_np = lambda tree: _storage_cast(tree, dtype)
    payload = {
        "epoch": epoch,
        "state_dict": None if params is None else
            {"params": to_np(params), "state": to_np(state)},
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
    blob = pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)
    if compress:
        import zlib

        blob = _ZMAGIC + zlib.compress(blob, level=1)
    with open(path, "wb") as f:
        f.write(blob)


def load_checkpoint(path: str | Path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:4] == _ZMAGIC:
        import zlib

        blob = zlib.decompress(blob[4:])
    out = pickle.loads(blob)
    for key in ("state_dict", "state_dict_inlier", "optimizer"):
        if out.get(key) is not None:
            out[key] = _storage_uncast(out[key])
    return out
