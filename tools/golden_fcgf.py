"""Golden FCGF parity check: settle the kernel K-axis order in one command.

The torch->JAX checkpoint converter (utils/checkpoint.py) assumes
MinkowskiEngine enumerates HYPER_CUBE kernel offsets dimension-0-fastest from
the most-negative corner (frozen by tests/test_sparse_conv.py's odometer
test). That convention is derived from ME's public kernel_region.hpp but has
never been validated against real pretrained weights (none exist in this
zero-egress image). The moment weights + a reference feature dump are
available, this tool decides — and names the correction if needed.

Usage:
    python tools/golden_fcgf.py --weights ResUNetBN2C-feat32-3dmatch-v0.05.pth \
        [--golden golden.npz] [--voxel 0.05] [--atol 1e-3]

golden.npz schema (produced by running the REFERENCE FCGF on any fragment):
    xyz      [N, 3] float32 raw points (pre-quantization)
    feats    [M, 32] float32 reference output features
    coords   [M, 3] int32 voxel coordinates of the reference's M outputs
Without --golden, the tool runs every K-order candidate and prints feature
statistics per candidate (inconclusive but verifies the load path end-to-end).

Candidates tried (permutations of the converted kernel's K axis):
    identity      — converter's documented order (dim-0 fastest, -corner)
    reversed      — dim-0 fastest from the most-POSITIVE corner (offset sign
                    flip; equivalently ME iterating the region around inputs)
    dimlast       — C-order odometer (last dimension fastest)

Reference checkpoint load path being validated:
core/deep_global_registration.py:88-116; kernel layout model/resunet.py +
residual_block.py:38-44.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def k_order_candidates(k: int, ndim: int):
    """Return {name: perm} where perm reindexes the documented offset order
    into the candidate order: kernel_candidate = kernel_converted[perm]."""
    from deepglobalregistration_tpu.ops import kernel_map as km

    base = km.kernel_offsets(k, ndim, km.HYPER_CUBE)

    def perm_to(target: np.ndarray) -> np.ndarray:
        # row-match target offsets against base offsets
        base_keys = {tuple(row): i for i, row in enumerate(base)}
        return np.array([base_keys[tuple(row)] for row in target], np.int64)

    r = k // 2
    ranges = [np.arange(-r, r + 1) for _ in range(ndim)]
    mesh = np.meshgrid(*ranges, indexing="ij")  # C-order: last dim fastest
    dimlast = np.stack([m.ravel() for m in mesh], axis=1).astype(np.int32)

    return {
        "identity": np.arange(len(base)),
        "reversed": perm_to(base[::-1]),
        "dimlast": perm_to(dimlast),
    }


def permute_kernels(params, perm_for):
    """Apply a K-axis permutation to every conv kernel in the param tree.
    perm_for(K) -> permutation or None (leave k=1 and even kernels alone)."""
    import jax

    def fix(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 3:
            p = perm_for(leaf.shape[0])
            if p is not None:
                return leaf[p]
        return leaf

    return jax.tree.map(fix, params)


def run_fcgf(spec, cfg, params, state, xyz: np.ndarray, voxel: float):
    import jax
    import jax.numpy as jnp

    from deepglobalregistration_tpu.ops import sparse_grid

    cap = 1 << int(np.ceil(np.log2(max(len(xyz), 512))))
    pad = np.zeros((cap, 3), np.float32)
    pad[: len(xyz)] = xyz
    _, grid = sparse_grid.voxelize(jnp.asarray(pad), jnp.int32(len(xyz)), voxel)
    plan = jax.vmap(spec.build_plan, in_axes=(0, None))(
        jax.tree.map(lambda x: x[None], grid), cfg)
    feats_in = jnp.ones((1, cap, 1), jnp.float32)
    out, _ = spec.apply(params, state, cfg, plan, feats_in, train=False)
    m = int(grid.num)
    return np.asarray(out[0, :m]), np.asarray(grid.coords[:m])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--golden", default=None,
                    help=".npz with xyz/feats/coords from the reference FCGF")
    ap.add_argument("--voxel", type=float, default=0.05)
    ap.add_argument("--atol", type=float, default=1e-3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # parity runs exact on host

    from deepglobalregistration_tpu.models import load_model
    from deepglobalregistration_tpu.utils import checkpoint as ckpt

    state = ckpt.load_torch_checkpoint(args.weights)
    netcfg = state["config"]
    get = netcfg.get if isinstance(netcfg, dict) else lambda k: getattr(netcfg, k)
    feat_model = get("feat_model") if "feat_model" in netcfg else get("model")
    n_out = get("feat_model_n_out") if "feat_model_n_out" in netcfg else get("model_n_out")
    k1 = get("feat_conv1_kernel_size") if "feat_conv1_kernel_size" in netcfg \
        else get("conv1_kernel_size")
    spec = load_model(feat_model)
    cfg = spec.make_config(1, n_out, bn_momentum=get("bn_momentum"),
                           conv1_kernel_size=k1,
                           normalize_feature=get("normalize_feature"), D=3)
    params = state["state_dict"]["params"] if "state_dict" in state else state["fcgf_params"]
    net_state = state["state_dict"]["state"] if "state_dict" in state else state["fcgf_state"]

    if args.golden:
        g = np.load(args.golden)
        xyz, ref_feats, ref_coords = g["xyz"], g["feats"], g["coords"]
    else:
        rng = np.random.RandomState(0)
        xyz = (rng.rand(5000, 3) * 3.0).astype(np.float32)
        ref_feats = ref_coords = None

    cands27 = k_order_candidates(3, 3)
    cands_k1 = k_order_candidates(k1, 3) if k1 != 3 else cands27

    results = {}
    for name in cands27:
        def perm_for(K, name=name):
            if K == 27:
                return cands27[name]
            if K == k1 ** 3:
                return cands_k1[name]
            return None

        p = permute_kernels(params, perm_for)
        feats, coords = run_fcgf(spec, cfg, p, net_state, xyz, args.voxel)
        if ref_feats is not None:
            # align by voxel coordinate (both sides dedup; order differs)
            ours = {tuple(c): f for c, f in zip(coords, feats)}
            matched, err = 0, 0.0
            for c, f in zip(ref_coords, ref_feats):
                got = ours.get(tuple(c))
                if got is not None:
                    matched += 1
                    err = max(err, float(np.abs(got - f).max()))
            results[name] = {"matched": matched, "of": len(ref_coords),
                             "max_abs_err": err,
                             "pass": matched > 0 and err < args.atol}
        else:
            results[name] = {"feat_mean": float(feats.mean()),
                             "feat_std": float(feats.std()),
                             "n_out": len(feats)}

    print(json.dumps(results, indent=2))
    if ref_feats is not None:
        winners = [n for n, r in results.items() if r["pass"]]
        if winners == ["identity"]:
            print("VERDICT: documented K-order CONFIRMED — no action needed.")
        elif len(winners) == 1:
            print(f"VERDICT: K-order is '{winners[0]}' — update "
                  "ops/kernel_map.kernel_offsets (the centralized flip point).")
        else:
            print(f"VERDICT: inconclusive (winners={winners}); tighten --atol "
                  "or use a larger fragment.")


if __name__ == "__main__":
    main()
