#!/usr/bin/env python
"""On-hardware regression checks for platform compiler bugs we've worked around.

The pytest suite runs on CPU, so TPU-backend miscompilations are invisible to
it. This script runs the known-dangerous patterns on the real TPU and verifies
them against numpy oracles. Run after toolchain updates:

    python tools/tpu_regression_checks.py

Known issue guarded here (axon platform, jax 0.9.0, 2026-08):
- int32 floor_divide fused into the sort-based dedup program caused the
  multi-word boundary comparison to collapse to the first packed word
  (unique over (x,y) instead of (x,y,z)). Worked around with shift-based
  snapping in sparse_grid.stride_down + an optimization barrier in
  hashing.unique_rows.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from deepglobalregistration_tpu.utils.platform import select_platform

select_platform()  # CPU fallback when the tunnel is dead (backend init hangs)

import jax.numpy as jnp
import numpy as np

from deepglobalregistration_tpu.models import resunet
from deepglobalregistration_tpu.ops import hashing, kernel_map
from deepglobalregistration_tpu.ops.sparse_grid import stride_down, voxelize


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    cap = 8192
    xyz = (rng.rand(7000, 3) * 1.5).astype(np.float32)
    xyz_p = np.zeros((cap, 3), np.float32)
    xyz_p[:7000] = xyz
    failures = 0

    g0 = jax.jit(lambda x, n: voxelize(x, n, 0.05))(jnp.asarray(xyz_p), jnp.int32(7000))[1]
    c = np.asarray(g0.coords)[: int(g0.num)]
    expect0 = len(np.unique(np.floor(xyz / 0.05).astype(np.int32), axis=0))
    assert int(g0.num) == expect0, f"voxelize: {int(g0.num)} != {expect0}"

    # 1) separately-jitted stride chain (first observed miscompile pattern)
    grid, ce = g0, c
    for s in (2, 4, 8):
        grid = jax.jit(lambda g, s=s: stride_down(g, s))(grid)
        ce = np.unique(np.floor_divide(ce, s) * s, axis=0)
        got = int(grid.num)
        failures += got != len(ce)
        print(f"stride {s}: {got} (expect {len(ce)}) {'ok' if got == len(ce) else 'MISCOMPILED'}")

    # 2) the full vmapped fused pyramid (second observed miscompile pattern)
    cfg = resunet.make_config("ResUNetBN2C", 1, 32, conv1_kernel_size=3,
                              normalize_feature=True)
    gb = jax.tree.map(lambda x: x[None], g0)
    plan = jax.jit(lambda g: jax.vmap(resunet.build_resunet2_plan,
                                      in_axes=(0, None, None))(g, cfg, 1))(gb)
    expect = [c]
    for s in (2, 4, 8):
        expect.append(np.unique(np.floor_divide(expect[-1], s) * s, axis=0))
    got = [int(g.num[0]) for g in plan.grids]
    want = [len(e) for e in expect]
    failures += got != want
    print(f"vmapped plan levels: {got} (expect {want}) "
          f"{'ok' if got == want else 'MISCOMPILED'}")

    # 3) kernel map correctness inside the fused plan vs a dict oracle
    nv = int(g0.num)
    offs = kernel_map.kernel_offsets(3, 3)
    kmap = np.asarray(plan.self_kmaps[0][0])
    tab = {tuple(r): i for i, r in enumerate(c)}
    bad = 0
    sample = rng.choice(nv, 500, replace=False)
    for j in sample:
        for k in range(0, 27, 5):
            want_idx = tab.get(tuple(c[j] + offs[k]), -1)
            bad += int(kmap[k, j]) != want_idx
    failures += bad > 0
    print(f"kernel map spot-check: {bad} mismatches / {len(sample) * 6} probed "
          f"{'ok' if bad == 0 else 'MISCOMPILED'}")

    # 4) edge-compacted conv vs dense gather-GEMM (the edge path leans on
    # sort + positional scatter + cond-in-scan — patterns adjacent to the
    # observed sort-dedup miscompile; verify exactness on hardware)
    from deepglobalregistration_tpu.ops import edge_conv, sparse_conv

    km = np.full((729, 2048), -1, np.int32)
    mask = rng.rand(729, 2048) < 0.01
    km[mask] = rng.randint(0, 2048, size=int(mask.sum()))
    for j in range(2048):  # keep per-row degree within the cap
        v = np.where(km[:, j] >= 0)[0]
        if len(v) > 48:
            km[v[48:], j] = -1
    feats = rng.randn(2048, 16).astype(np.float32)
    kern = rng.randn(729, 16, 16).astype(np.float32)

    @jax.jit
    def both(f, w, k):
        dense = sparse_conv.sparse_conv(f, w, k)
        em = edge_conv.build_edge_map(k, d_cap=48, tile=128)
        edge = edge_conv.sparse_conv_edges(f, w, em, out_rows=2048)
        return dense, edge, em.overflow

    dense, edge, ovf = jax.tree.map(np.asarray,
                                    both(jnp.asarray(feats), jnp.asarray(kern),
                                         jnp.asarray(km)))
    err = float(np.abs(dense - edge).max())
    # TPU einsums multiply in bf16 by default; the two paths group sums
    # differently, so allow bf16-scale drift (CPU comes out ~1e-5).
    ok = err < 0.05 and not bool(ovf)
    failures += not ok
    print(f"edge-conv vs dense: max|diff|={err:.2e} overflow={bool(ovf)} "
          f"{'ok' if ok else 'MISCOMPILED'}")

    # 5) fused Pallas 1-NN vs the scan path (compiled, not interpreted)
    from deepglobalregistration_tpu.ops import knn as knn_ops
    from deepglobalregistration_tpu.ops.pallas_knn import find_nn_pallas

    f0 = np.zeros((1024, 32), np.float32)
    f0[:700] = rng.randn(700, 32)
    f1 = np.zeros((2048, 32), np.float32)
    f1[:1500] = rng.randn(1500, 32)
    i_ref, d_ref = jax.jit(knn_ops.find_nn)(jnp.asarray(f0), jnp.asarray(f1),
                                            jnp.int32(700), jnp.int32(1500))
    interp = jax.default_backend() != "tpu"  # CPU smoke runs interpret mode
    i_p, d_p = find_nn_pallas(jnp.asarray(f0), jnp.asarray(f1),
                              jnp.int32(700), jnp.int32(1500),
                              interpret=interp)
    idx_ok = bool((np.asarray(i_p)[:700] == np.asarray(i_ref)[:700]).all())
    d_err = float(np.abs(np.asarray(d_p)[:700] - np.asarray(d_ref)[:700]).max())
    ok = idx_ok and d_err < 1e-3
    failures += not ok
    print(f"pallas 1-NN vs scan: idx_ok={idx_ok} max|d_diff|={d_err:.2e} "
          f"{'ok' if ok else 'MISCOMPILED'}")

    # 6) end-to-end pose recovery on the 3DMatch-scale synthetic pair. With
    # identical transformed points, even untrained FCGF features match the
    # corresponding voxels, so register() must recover the synthetic pose to
    # ~voxel accuracy — a whole-pipeline exactness canary (it would flag the
    # integer-payload bf16-matmul corruption class this script caught once).
    from deepglobalregistration_tpu.config import default_config
    from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration
    from demo import synthetic_pair

    config = default_config(
        feat_model="ResUNetBN2C", feat_model_n_out=32,
        feat_conv1_kernel_size=7, inlier_model="ResUNetBN2C",
        inlier_conv1_kernel_size=3, voxel_size=0.05,
        inlier_feature_type="ones", dense_extent="256,256,256", bf16=True)
    dgr = DeepGlobalRegistration(config)
    xyz0, xyz1, T_gt = synthetic_pair(n=30000, seed=0)
    T = dgr.register(xyz0, xyz1)
    re_deg = float(np.degrees(np.arccos(np.clip(
        (np.trace(T[:3, :3].T @ T_gt[:3, :3]) - 1) / 2, -1, 1))))
    te = float(np.linalg.norm(T[:3, 3] - T_gt[:3, 3]))
    ok = re_deg < 1.0 and te < 0.15
    failures += not ok
    print(f"e2e synthetic pose recovery: RE={re_deg:.3f} deg TE={te:.3f} m "
          f"{'ok' if ok else 'MISCOMPILED'}")

    # 7) geometry matmul precision: the platform's DEFAULT matmul precision
    # is bf16-level even for f32 operands (measured 1.6e-3 on a 3x3 product,
    # CPU and TPU alike) — geometry code guards every product with
    # Precision.HIGHEST (ops/se3.py, ops/procrustes.py). Verify both that the
    # platform still needs the guard (informational) and that the guarded
    # Procrustes solve is orthogonal to f32 precision.
    from scipy.spatial.transform import Rotation

    from deepglobalregistration_tpu.ops import procrustes

    Rgt = Rotation.random(random_state=1).as_matrix().astype(np.float32)
    X = rng.randn(5000, 3).astype(np.float32)
    Y = X @ Rgt.T + np.float32([0.1, -0.2, 0.3])
    Rj, tj = jax.jit(procrustes.weighted_procrustes)(
        jnp.asarray(X), jnp.asarray(Y), jnp.ones(5000, np.float32))
    det = float(np.linalg.det(np.asarray(Rj, np.float64)))
    rerr = float(np.abs(np.asarray(Rj) - Rgt).max())
    ok = abs(det - 1.0) < 1e-5 and rerr < 1e-5
    failures += not ok
    A = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    B = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    raw = float(np.abs(np.asarray(jnp.asarray(A) @ jnp.asarray(B), np.float64)
                       - A.astype(np.float64) @ B.astype(np.float64)).max())
    print(f"procrustes precision: det={det:.8f} maxerr={rerr:.2e} "
          f"(unguarded 3x3 @ error: {raw:.2e}) "
          f"{'ok' if ok else 'MISCOMPILED'}")

    if failures:
        print("FAIL: platform miscompilation detected — keep/extend the workarounds!")
        sys.exit(1)
    print("all TPU regression checks passed")


if __name__ == "__main__":
    main()
