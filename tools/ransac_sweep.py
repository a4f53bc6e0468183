"""RANSAC hypothesis-budget sweep: pick the safeguard default with evidence.

The reference's Open3D safeguard validates 80,000 sequential models
(deep_global_registration.py:302-315, RANSACConvergenceCriteria(4e6, 80000)).
Our TPU safeguard evaluates `ransac_hypotheses` 4-point models in parallel
(ops/ransac.py). This sweep measures recall (RTE < 0.3 m, RRE < 15 deg — the
3DMatch success bar, config.py:127-128) on synthetic low-inlier correspondence
sets across budgets, to answer:
  1. what budget matches/beats the o3d-80k behavior bar, and
  2. whether the reduced 4,096 budget in the fused batch path costs recall.

Run:  python tools/ransac_sweep.py [--trials 30] [--out sweep.json]
Writes a markdown table to stdout and JSON results. CPU-safe (forces the host
platform); on TPU the same script measures wall-clock too.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_pair(rng, n, inlier_ratio, noise=0.01, extent=3.0):
    """Synthetic correspondence set: n pairs, a fraction correct under a random
    rigid transform, the rest matched to random points (1-NN mismatches)."""
    from scipy.spatial.transform import Rotation

    X = (rng.rand(n, 3) * extent).astype(np.float32)
    R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
    t = (rng.randn(3) * 0.5).astype(np.float32)
    Y = X @ R.T + t
    k = max(int(n * inlier_ratio), 4)
    out = Y.copy()
    out[k:] = (rng.rand(n - k, 3) * extent) @ R.T + t  # outliers: wrong matches
    out[:k] += rng.randn(k, 3).astype(np.float32) * noise
    perm = rng.permutation(n)
    return X[perm], out[perm].astype(np.float32), R, t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=30)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--out", default=None)
    ap.add_argument("--budgets", default="1024,4096,16384,65536")
    ap.add_argument("--ratios", default="0.02,0.05,0.10,0.20")
    args = ap.parse_args()

    import jax

    from deepglobalregistration_tpu.utils.platform import tpu_reachable

    if not tpu_reachable():  # axon tunnel down -> run the sweep on the host
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from deepglobalregistration_tpu.ops import metrics, ransac

    budgets = [int(b) for b in args.budgets.split(",")]
    ratios = [float(r) for r in args.ratios.split(",")]
    rng = np.random.RandomState(0)

    jits = {h: jax.jit(lambda k, x, y, n, h=h: ransac.ransac_correspondence(
        k, x, y, n, distance_threshold=0.1, num_hypotheses=h)) for h in budgets}

    results = {}
    for ratio in ratios:
        pairs = [make_pair(rng, args.n, ratio) for _ in range(args.trials)]
        for h in budgets:
            succ, rtes, rres = 0, [], []
            t0 = time.time()
            for i, (X, Y, R_gt, t_gt) in enumerate(pairs):
                key = jax.random.PRNGKey(i)
                res = jits[h](key, jnp.asarray(X), jnp.asarray(Y),
                              jnp.int32(len(X)))
                rte = float(np.linalg.norm(np.asarray(res.t) - t_gt))
                rre = float(np.rad2deg(float(metrics.rotation_error(
                    jnp.asarray(res.R), jnp.asarray(R_gt)))))
                rtes.append(rte)
                rres.append(rre)
                succ += (rte < 0.3) and (rre < 15.0)
            dt = (time.time() - t0) / len(pairs)
            results[f"r{ratio}_h{h}"] = {
                "inlier_ratio": ratio, "hypotheses": h,
                "recall": succ / len(pairs),
                "median_rte": float(np.median(rtes)),
                "median_rre": float(np.median(rres)),
                "sec_per_call": round(dt, 4),
            }
            print(f"ratio={ratio:.2f} H={h:6d}: recall={succ}/{len(pairs)}"
                  f" med_rte={np.median(rtes):.3f} med_rre={np.median(rres):.2f}"
                  f" {dt:.3f}s/call", flush=True)

    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))

    # o3d-80k behavior bar: p4 = ratio^4 per hypothesis; 80k sequential
    # validations give expected recall 1-(1-p4)^80000 before refit.
    print("\ntheoretical 4-pt hit probability (no refit):")
    for ratio in ratios:
        p4 = ratio ** 4
        for h in budgets + [80000]:
            p = 1 - (1 - p4) ** h
            print(f"  ratio={ratio:.2f} H={h}: P(>=1 clean sample)={p:.3f}")


if __name__ == "__main__":
    main()
