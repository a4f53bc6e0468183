"""Instrument register_many's dispatch loop phase by phase on hardware.

Round-3 regression (VERDICT.md What's-weak #1): the pipelined stream runs
1.73 s/pair while the sequential register() loop runs 0.59 s/pair — the
dispatch loop alone eats ~1.25 s/pair of host time before any result sync.
This probe times every statement of the loop to find where it goes.

Run: python tools/stream_probe.py
"""

import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO, format="%(message)s")

import jax
import jax.numpy as jnp
import numpy as np

from deepglobalregistration_tpu.utils.platform import (
    enable_compilation_cache, select_platform)

enable_compilation_cache()
select_platform()

from deepglobalregistration_tpu.config import default_config
from deepglobalregistration_tpu.core.pipeline import (
    DeepGlobalRegistration, _bucket_for, _pad_cloud)
from deepglobalregistration_tpu.ops.sparse_grid import Grid
from demo import synthetic_pair


def main():
    config = default_config(
        feat_model="ResUNetBN2C", feat_model_n_out=32, feat_conv1_kernel_size=7,
        inlier_model="ResUNetBN2C", inlier_conv1_kernel_size=3,
        voxel_size=0.05, inlier_feature_type="ones",
        dense_extent="256,256,256", bf16=True)
    dgr = DeepGlobalRegistration(config)
    pairs = [synthetic_pair(n=30000, seed=s) for s in range(4)]

    print("== warmup (compile) ==", flush=True)
    t0 = time.time()
    dgr.register(pairs[0][0], pairs[0][1])
    print(f"warmup took {time.time()-t0:.1f}s", flush=True)

    # sequential baseline
    t0 = time.time()
    for i in range(4):
        dgr.register(pairs[i][0], pairs[i][1])
    seq = (time.time() - t0) / 4
    print(f"sequential: {seq:.3f} s/pair", flush=True)

    # instrumented stream loop (mirrors register_many's body)
    stream = [pairs[i % 4] for i in range(8)]
    phases = {"pad_h2d": 0.0, "quantize_dispatch": 0.0, "rebucket": 0.0,
              "fused_dispatch": 0.0, "collect": 0.0}
    t_all = time.time()
    inflight = []
    for xyz0, xyz1, _ in stream:
        t = time.time()
        xyz0 = dgr._as_array(xyz0)
        xyz1 = dgr._as_array(xyz1)
        raw_cap = _bucket_for(max(len(xyz0), len(xyz1)), dgr.buckets)
        xyz_pair = jnp.asarray(np.stack([_pad_cloud(xyz0, raw_cap),
                                         _pad_cloud(xyz1, raw_cap)]))
        nums = jnp.asarray([len(xyz0), len(xyz1)], np.int32)
        phases["pad_h2d"] += time.time() - t

        t = time.time()
        xyz_sel, grids = dgr._quantize(xyz_pair, nums)
        phases["quantize_dispatch"] += time.time() - t

        t = time.time()
        guess = min(dgr._net_cap_guess, raw_cap)
        xs, gr = xyz_sel, grids
        if guess != raw_cap:
            xs = xyz_sel[:, :guess]
            gr = Grid(coords=grids.coords[:, :guess], num=grids.num)
        phases["rebucket"] += time.time() - t

        t = time.time()
        spec = dgr._register_fused(
            dgr.fcgf_params, dgr.fcgf_state, dgr.inlier_params,
            dgr.inlier_state, dgr._rng, xs, gr)
        dgr._rng = spec[4]
        dt = time.time() - t
        phases["fused_dispatch"] += dt
        print(f"  fused dispatch: {dt*1000:.0f} ms", flush=True)
        inflight.append((spec, xyz_sel, grids, raw_cap, guess))
    t_dispatch = time.time() - t_all

    t = time.time()
    out = []
    for spec, xyz_sel, grids, raw_cap, guess in inflight:
        net_cap = _bucket_for(int(np.asarray(grids.num).max()), dgr.buckets)
        T, wsum, ov3, ov6 = jax.device_get(spec[:4])
        out.append(np.asarray(T))
    phases["collect"] = time.time() - t
    total = time.time() - t_all

    print(f"\ndispatch loop total: {t_dispatch:.2f}s "
          f"({t_dispatch/len(stream)*1000:.0f} ms/pair)")
    for k, v in phases.items():
        print(f"  {k}: {v:.2f}s total, {v/len(stream)*1000:.0f} ms/pair")
    print(f"stream total: {total:.2f}s = {total/len(stream):.3f} s/pair "
          f"(sequential was {seq:.3f})")


if __name__ == "__main__":
    main()
