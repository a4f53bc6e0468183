"""Measure per-(3D-offset, output-row) verified-hit counts of the 6D maps.

The multimap probe (ops/paired_kernel_map.edge_slots_from_multimap) yields,
per (distinct first-half offset a, output row j), up to B candidate member
rows, of which only those whose second half lands in the kernel box survive.
The rank-compaction einsum (ops/edge_conv._rank_compact) pays FLOPs
proportional to S = A*B even though the surviving count per (a, j) is tiny.
A two-stage compaction (per-a B -> b', then concat) needs b' >= the worst
per-(a, j) hit count — this probe measures it exactly on the pinned
trained-matching bench grids (tests/data/bench_c6_trained.npz, the same
grids the caps in models/unet_plan.py were sized from).

Pure numpy — no TPU, no model.
"""

from __future__ import annotations

import json
import sys
from itertools import product

import numpy as np

_FIELD_BITS = 10


def _pack6(c: np.ndarray) -> np.ndarray:
    """key = sum_i (c_i + off) * step**i  (linear in each coordinate)."""
    off = 1 << (_FIELD_BITS - 1)
    step = np.int64(1 << _FIELD_BITS)
    mults = step ** np.arange(6)
    return ((c.astype(np.int64) + off) * mults[None, :]).sum(axis=1)


def per_offset_hits(c6: np.ndarray, level: int, down: bool) -> dict:
    """Hit-count stats per (a, j) for the self (down=False) or down map."""
    unit = 1 << level
    coords = np.unique((c6 >> level) << level, axis=0)
    if down:
        out = np.unique((coords >> (level + 1)) << (level + 1), axis=0)
    else:
        out = coords
    keys = _pack6(coords)
    order = np.argsort(keys)
    skeys = keys[order]
    offs = np.array(list(product((-1, 0, 1), repeat=6)), np.int64)[:, ::-1]
    # distinct first-half offsets a: 27; per a, 27 second-half offsets
    worst = 0
    hist = np.zeros(30, np.int64)
    step = np.int64(1 << _FIELD_BITS)
    # delta key of offset o (applied to out keys): sum_i o_i * step**i
    mults = step ** np.arange(6)
    out_keys = _pack6(out)
    off0 = np.array(list(product((-1, 0, 1), repeat=3)), np.int64)
    for a in off0:
        # count per j: how many of the 27 second-half offsets hit
        hits_j = np.zeros(len(out), np.int64)
        base = out_keys + (a[0] * unit) * mults[0] + (a[1] * unit) * mults[1] \
            + (a[2] * unit) * mults[2]
        for b in off0:
            q = base + (b[0] * unit) * mults[3] + (b[1] * unit) * mults[4] \
                + (b[2] * unit) * mults[5]
            pos = np.searchsorted(skeys, q)
            pos = np.minimum(pos, len(skeys) - 1)
            hits_j += (skeys[pos] == q)
        worst = max(worst, int(hits_j.max()))
        hist[np.minimum(hits_j, 29)] += np.ones_like(hits_j)
    nz = np.nonzero(hist)[0]
    return {"level": level, "map": "down" if down else "self",
            "rows": len(out), "max_per_aj": worst,
            "p999_per_aj": int(np.percentile(
                np.repeat(np.arange(30), hist), 99.9)) if hist.sum() else 0,
            "mean_nonzero": round(float(
                (hist[1:] * np.arange(1, 30)).sum() / max(hist[1:].sum(), 1)), 2)}


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/data/bench_c6_trained.npz"
    data = np.load(path)
    for name in data.files:
        c6 = data[name].astype(np.int64)
        for level in range(4):
            print(json.dumps({"seed": name,
                              **per_offset_hits(c6, level, down=False)}))
            if level < 3:
                print(json.dumps({"seed": name,
                                  **per_offset_hits(c6, level, down=True)}))


if __name__ == "__main__":
    main()
