#!/usr/bin/env python
"""Device-trace the FULL register() pipeline (FCGF + matching + 6D inlier +
refine/RANSAC + ICP) and print per-stage wall clocks + top device ops.

Run on the real TPU (nohup, never under a shell timeout):

    nohup python tools/trace_register.py [--bf16 1] [--dense_extent 256,256,256] &

Stage wall clocks here are whole-jit timings (one dispatch each), which stay
trustworthy under the platform's dispatch degradation; the trace gives the
per-op breakdown inside each stage.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from deepglobalregistration_tpu.utils.platform import select_platform

select_platform()  # CPU fallback when the tunnel is dead (backend init hangs)

import numpy as np

from deepglobalregistration_tpu.utils.profiling import summarize_trace, trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--dense_extent", type=str, default="256,256,256")
    ap.add_argument("--bf16", type=int, default=1)
    ap.add_argument("--weights", type=str, default=None,
                    help="checkpoint path (e.g. weights/fcgf_synthetic.pkl) "
                         "— the bench now runs trained weights, so "
                         "attribution should too (iteration counts of "
                         "ICP/refinement are weight-dependent)")
    ap.add_argument("--log_dir", type=str, default="/tmp/register_trace")
    args = ap.parse_args()

    from deepglobalregistration_tpu.config import default_config
    from deepglobalregistration_tpu.core.pipeline import DeepGlobalRegistration
    from demo import synthetic_pair

    config = default_config(
        feat_model="ResUNetBN2C", feat_model_n_out=32, feat_conv1_kernel_size=7,
        inlier_model="ResUNetBN2C", inlier_conv1_kernel_size=3,
        voxel_size=0.05, inlier_feature_type="ones",
        weights=args.weights,
        dense_extent=args.dense_extent, bf16=bool(args.bf16))
    dgr = DeepGlobalRegistration(config)
    xyz0, xyz1, _ = synthetic_pair(n=args.points, seed=0)

    t0 = time.time()
    dgr.register(xyz0, xyz1)
    print(f"compile+run {time.time() - t0:.0f}s", flush=True)

    # steady state with per-stage timers (feat_timer covers the FCGF jit)
    dgr.feat_timer.reset()
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        dgr.register(xyz0, xyz1)
    total = (time.time() - t0) / reps
    print(f"steady-state register(): {total * 1000:.0f} ms/pair "
          f"(feat stage {dgr.feat_timer.avg * 1000:.0f} ms)", flush=True)

    with trace(args.log_dir):
        dgr.register(xyz0, xyz1)
    print("top device ops (ms):")
    for name, ms in summarize_trace(args.log_dir, top=30).items():
        print(f"  {ms:9.2f}  {name}")

    # Per-source-line attribution of the fused program (needs the compiled
    # HLO of the same executable the trace ran).
    from deepglobalregistration_tpu.utils.profiling import attribute_trace
    from deepglobalregistration_tpu.ops.sparse_grid import Grid

    cap = dgr._net_cap_guess
    if cap:
        import jax.numpy as jnp

        xs = jnp.zeros((2, cap, 3), jnp.float32)
        gr = Grid(coords=jnp.zeros((2, cap, 3), jnp.int32),
                  num=jnp.zeros((2,), jnp.int32))
        txt = dgr._register_fused.lower(
            dgr.fcgf_params, dgr.fcgf_state, dgr.inlier_params,
            dgr.inlier_state, jax.random.PRNGKey(0), xs, gr
        ).compile().as_text()
        print(f"\nper-source-line device ms (bucket {cap}):")
        for loc, ms in attribute_trace(args.log_dir, txt, top=40).items():
            print(f"  {ms:9.2f}  {loc}")


if __name__ == "__main__":
    main()
