"""Measure TRUE 6D kernel-map degrees/multiplicities on the bench cloud.

The paired 6D plan (models/unet_plan.build_paired_unet_plan) bounds two
data-dependent quantities with static caps, dropping edges (with an overflow
flag) beyond them:
  - per-c0-group multiplicity B at each pyramid level (ops/paired_kernel_map
    .build_multimap b_slots; cap min(8^level, _B_CAP_6D)),
  - per-output-row edge degree d_cap of every edge map (ops/edge_conv
    _rank_compact; caps models/unet_plan.self_cap/down_cap).

BENCH_r02 tripped the overflow warning on every bench pair. This tool computes
the EXACT distributions (no caps) for the real bench configuration — staged
pipeline up to feature matching for the true correspondence grid, then pure
numpy for the per-level stride pyramid, group multiplicities, and
self/down-map degrees — so the caps can be set from measurement instead of
guesswork. Reference for the exact-map semantics being matched:
MinkowskiEngine's variable-length kernel maps
(/root/reference/model/residual_block.py:38-44 convs used by
/root/reference/model/resunet.py:598-649).

Usage: python tools/degree_probe.py [--seeds 4] [--n 30000] [--levels 4]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_FIELD_BITS = 10
_FIELD_OFF = 64  # coords must land in [-_FIELD_OFF, 2^bits - _FIELD_OFF)


def _pack6(c: np.ndarray) -> np.ndarray:
    """Pack [N, 6] int coords into one int64 key (linear in the coords as
    long as every field stays in range — asserted)."""
    c = np.asarray(c, np.int64) + _FIELD_OFF
    assert c.min() >= 0 and c.max() < (1 << _FIELD_BITS), (
        f"coords out of packing range: [{c.min() - _FIELD_OFF}, "
        f"{c.max() - _FIELD_OFF}]")
    key = np.zeros(len(c), np.int64)
    for i in range(6):
        key |= c[:, i] << (_FIELD_BITS * i)
    return key


def _pack_delta(offs: np.ndarray, unit: int) -> np.ndarray:
    """Packed-key delta of [K, 6] offsets * unit (fields must not carry)."""
    d = np.zeros(len(offs), np.int64)
    for i in range(6):
        d += np.asarray(offs[:, i], np.int64) * unit << (_FIELD_BITS * i)
    return d


def _degrees(keys_in: np.ndarray, keys_out: np.ndarray,
             deltas: np.ndarray) -> np.ndarray:
    """Per-output-row count of input keys at key_out + delta (true degree)."""
    s = np.sort(keys_in)
    deg = np.zeros(len(keys_out), np.int64)
    for d in deltas:
        q = keys_out + d
        pos = np.searchsorted(s, q)
        pos = np.minimum(pos, len(s) - 1)
        deg += s[pos] == q
    return deg


def _stats(v: np.ndarray) -> dict:
    v = np.asarray(v)
    return {"max": int(v.max()), "p999": int(np.percentile(v, 99.9)),
            "p99": int(np.percentile(v, 99)), "mean": round(float(v.mean()), 2)}


def _live_extent(keys_in: np.ndarray, keys_out: np.ndarray,
                 deltas: np.ndarray, tile: int = 128) -> dict:
    """Exact total edges + tile-padded live extent of one kernel map.

    The edge-conv live budget (models/unet_plan.budget) is compared against
    the TILE-PADDED extent: every populated offset bin rounds up to a whole
    tile (ops/edge_conv._edges_to_tiles), so the structural padding must be
    measured too, not just the edge total."""
    s = np.sort(keys_in)
    total = 0
    padded = 0
    for d in deltas:
        q = keys_out + d
        pos = np.searchsorted(s, q)
        pos = np.minimum(pos, len(s) - 1)
        cnt = int(np.sum(s[pos] == q))
        total += cnt
        padded += -(-cnt // tile) * tile
    return {"edges": total, "tile_padded": padded}


def probe_levels(c6: np.ndarray, n_levels: int) -> list[dict]:
    """Exact per-level stats for the paired-plan pyramid of one 6D grid."""
    from itertools import product

    offs = np.array(list(product((-1, 0, 1), repeat=6)), np.int64)  # K-order
    # irrelevant here: degrees only count existence
    out = []
    level_coords = c6.astype(np.int64)
    for level in range(n_levels):
        unit = 1 << level
        if level:
            snapped = (level_coords >> level) << level
            level_coords = np.unique(snapped, axis=0)
        keys = _pack6(level_coords)
        # group multiplicity by first-half (c0) value
        k0 = keys & ((1 << (3 * _FIELD_BITS)) - 1)
        _, counts = np.unique(k0, return_counts=True)
        deltas = _pack_delta(offs, unit)
        rec = {"level": level, "rows": len(level_coords),
               "multiplicity": _stats(counts),
               "self_degree": _stats(_degrees(keys, keys, deltas)),
               "self_live": _live_extent(keys, keys, deltas)}
        if level + 1 < n_levels:
            coarse = np.unique((level_coords >> (level + 1)) << (level + 1),
                               axis=0)
            ckeys = _pack6(coarse)
            rec["down_degree"] = _stats(_degrees(keys, ckeys, deltas))
            rec["down_live"] = _live_extent(keys, ckeys, deltas)
        out.append(rec)
    return out


def current_caps(n_levels: int) -> dict:
    from deepglobalregistration_tpu.models import unet_plan as up

    def b_slots(level):
        cap = up._B_CAP_6D[min(level, len(up._B_CAP_6D) - 1)]
        return int(min(8 ** level, cap)) if level else 2

    def self_cap(level):
        caps = up._SELF_CAP_6D
        return caps[min(level, len(caps) - 1)] if level \
            else 27  # level-0 slots are exact (27 wide)

    def down_cap(level):
        return up._DOWN_CAP_6D[min(level, len(up._DOWN_CAP_6D) - 1)]

    return {"b_slots": [b_slots(i) for i in range(n_levels)],
            "self_cap": [self_cap(i) for i in range(n_levels)],
            "down_cap": [down_cap(i) for i in range(n_levels - 1)]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--n", type=int, default=30000)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--aligned", action="store_true",
                    help="perfect correspondences (c1 = voxelized GT "
                         "transform of each c0 point) instead of "
                         "random-weight feature matches — the upper bound of "
                         "spatial consistency, which is what TRAINED weights "
                         "approach: every consistent 3D neighbor becomes a "
                         "6D edge, so degrees are far higher than under "
                         "random matching. No TPU or model needed.")
    ap.add_argument("--weights", default=None,
                    help="checkpoint for the default (pipeline) mode: probe "
                         "the TRAINED-weights correspondence grids — the "
                         "regime the bench measures (bench.py defaults to "
                         "weights/fcgf_synthetic.pkl), where matching is "
                         "spatially consistent and degrees approach the "
                         "--aligned upper bound.")
    ap.add_argument("--save_c6", default=None,
                    help="npz path: save each seed's 6D correspondence grid "
                         "(int16 [N, 6]) for offline/CPU regression tests of "
                         "the plan builder's caps (tests/test_bench_shape_"
                         "budgets.py pins the trained-matching grids).")
    ap.add_argument("--room", action="store_true",
                    help="probe the synthetic-room trajectory shape "
                         "(data/synthetic.py make_room — denser than the "
                         "bench cloud) instead of demo.synthetic_pair. "
                         "Implies --aligned-style numpy-only probing.")
    args = ap.parse_args()

    if args.room:
        from deepglobalregistration_tpu import native
        from deepglobalregistration_tpu.data.synthetic import (
            SyntheticTrajectoryDataset)

        voxel = 0.05
        print(json.dumps({"caps": current_caps(args.levels),
                          "mode": "room-aligned"}))
        dset = SyntheticTrajectoryDataset(n_points=args.n, n_scenes=args.seeds,
                                          pairs_per_scene=1)
        for seed in range(args.seeds):
            _, xyz0, xyz1, trans = dset[seed]
            T_gt = np.linalg.inv(trans)
            p0, c0 = native.voxelize(np.ascontiguousarray(xyz0, np.float32),
                                     voxel)
            moved = p0 @ T_gt[:3, :3].T + T_gt[:3, 3]
            c1 = np.floor(moved / voxel).astype(np.int64)
            c6 = np.concatenate([c0.astype(np.int64), c1], axis=1)
            c6 -= c6.min(axis=0)  # degrees are translation-invariant per column
            for rec in probe_levels(c6, args.levels):
                print(json.dumps({"seed": seed, **rec}))
        return

    if args.aligned:
        from demo import synthetic_pair

        from deepglobalregistration_tpu import native

        voxel = 0.05
        print(json.dumps({"caps": current_caps(args.levels),
                          "mode": "aligned"}))
        for seed in range(args.seeds):
            xyz0, xyz1, T_gt = synthetic_pair(n=args.n, seed=seed)
            p0, c0 = native.voxelize(np.ascontiguousarray(xyz0, np.float32),
                                     voxel)
            moved = p0 @ T_gt[:3, :3].T + T_gt[:3, 3]
            c1 = np.floor(moved / voxel).astype(np.int64)
            c6 = np.concatenate([c0.astype(np.int64), c1], axis=1)
            for rec in probe_levels(c6, args.levels):
                print(json.dumps({"seed": seed, **rec}))
        return

    from deepglobalregistration_tpu.utils.platform import (
        enable_compilation_cache, select_platform)

    enable_compilation_cache()
    select_platform()

    from demo import synthetic_pair

    from deepglobalregistration_tpu.config import default_config
    from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration

    config = default_config(
        feat_model="ResUNetBN2C", feat_model_n_out=32,
        feat_conv1_kernel_size=7, inlier_model="ResUNetBN2C",
        inlier_conv1_kernel_size=3, voxel_size=0.05,
        inlier_feature_type="ones", dense_extent="256,256,256", bf16=True)
    if args.weights:
        config.weights = args.weights
    dgr = DeepGlobalRegistration(config)

    print(json.dumps({"caps": current_caps(args.levels)}))
    saved = {}
    for seed in range(args.seeds):
        xyz0, xyz1, _ = synthetic_pair(n=args.n, seed=seed)
        _, coords0, _ = dgr.preprocess(xyz0)
        _, coords1, _ = dgr.preprocess(xyz1)
        f0 = dgr.fcgf_feature_extraction(None, coords0)
        f1 = dgr.fcgf_feature_extraction(None, coords1)
        _, idx1 = dgr.fcgf_feature_matching(f0, f1)
        c6 = np.concatenate([coords0, coords1[np.asarray(idx1)]], axis=1)
        if args.save_c6:
            saved[f"seed{seed}"] = c6.astype(np.int16)
        for rec in probe_levels(c6, args.levels):
            print(json.dumps({"seed": seed, **rec}))
    if args.save_c6:
        np.savez_compressed(args.save_c6, **saved)
        print(json.dumps({"saved": args.save_c6, "pairs": len(saved)}))


if __name__ == "__main__":
    main()
