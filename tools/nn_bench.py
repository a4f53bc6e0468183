"""Microbenchmark the 1-NN formulations on the real chip (round-3 perf work).

The round-3 trace attributes ~88 ms to the Pallas 1-NN (feature matching,
16384x16384x32) and ~84 ms to the ICP while-loop whose per-iteration spatial
scan uses the lax.scan path — both orders of magnitude above the matmul
roofline (~1-3 ms). This tool times each formulation plus decomposed
rooflines so the slow stage is identified by measurement, not guesswork:

  pallas        current ops/pallas_knn.find_nn_pallas
  pallas-noarg  variant: jnp.min + eq-mask iota-min instead of jnp.argmin
  scan          ops/knn.find_nn (lax.scan over 4096-wide tiles)
  dot           bare [N,C]x[C,N] f32-HIGHEST dot_general (roofline)
  dotmin        dot + full-matrix min+argmin (XLA, unfused roofline)

Usage: python tools/nn_bench.py [--n 16384] [--c 32] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--c", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    from deepglobalregistration_tpu.utils.platform import (
        enable_compilation_cache, select_platform)

    enable_compilation_cache()
    select_platform()

    import jax
    import jax.numpy as jnp

    from deepglobalregistration_tpu.ops import knn, pallas_knn

    rng = np.random.RandomState(0)
    F0 = jnp.asarray(rng.randn(args.n, args.c).astype(np.float32))
    F1 = jnp.asarray(rng.randn(args.n, args.c).astype(np.float32))
    num = jnp.int32(args.n - 100)

    cases = {}

    cases["pallas"] = lambda: timeit(
        lambda a, b: pallas_knn.find_nn_pallas(a, b, num, num),
        F0, F1, iters=args.iters)

    cases["scan"] = lambda: timeit(
        jax.jit(lambda a, b: knn.find_nn(a, b, num, num)),
        F0, F1, iters=args.iters)

    @jax.jit
    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    cases["dot"] = lambda: timeit(dot, F0, F1, iters=args.iters)

    @jax.jit
    def dotmin(a, b):
        d = dot(a, b)
        return jnp.min(d, axis=1), jnp.argmin(d, axis=1)

    cases["dotmin"] = lambda: timeit(dotmin, F0, F1, iters=args.iters)

    # ICP loop cost: xyz 1-NN per iteration inside lax.while_loop. floor=0
    # forces all 30 iterations, so per-iteration cost = time / 30.
    from deepglobalregistration_tpu.ops import icp as icp_ops

    xyz = jnp.asarray(rng.rand(args.n, 3).astype(np.float32) * 3.0)

    def icp_case(pallas, floor):
        @jax.jit
        def go(a, b):
            r = icp_ops.registration_icp(
                a, b, num, num, max_correspondence_distance=0.1,
                f32_rmse_floor=floor, use_pallas=pallas)
            return r.T, r.iterations

        ms = timeit(lambda a, b: go(a, b), xyz, xyz, iters=args.iters)
        iters_run = int(go(xyz, xyz)[1])
        return ms, iters_run

    def icp_report(pallas, floor):
        ms, it = icp_case(pallas, floor)
        return f"{ms:8.2f} ms ({it} icp iters, {ms / max(it, 1):.2f} ms/iter)"

    cases["icp-scan-30"] = lambda: icp_report(False, 0.0)
    cases["icp-pallas-30"] = lambda: icp_report(True, 0.0)

    # single NN scan over xyz (3 -> 8 padded channels) for reference
    cases["pallas-xyz"] = lambda: timeit(
        lambda a, b: pallas_knn.find_nn_pallas(a, b, num, num),
        xyz, xyz, iters=args.iters)
    cases["scan-xyz"] = lambda: timeit(
        jax.jit(lambda a, b: knn.find_nn(a, b, num, num)),
        xyz, xyz, iters=args.iters)

    # chained variants: each call's input depends on the previous output,
    # forcing true device serialization (defeats any pipelining/memoization
    # in the dispatch path that could fake sub-roofline averages).
    def chain(fn, a, b, iters):
        idx, d2 = fn(a, b)
        jax.block_until_ready((idx, d2))
        t0 = time.perf_counter()
        for _ in range(iters):
            idx, d2 = fn(a + 0.0 * d2[:1, None], b)
        jax.block_until_ready((idx, d2))
        return (time.perf_counter() - t0) / iters * 1e3

    cases["pallas-feat-chain"] = lambda: chain(
        lambda a, b: pallas_knn.find_nn_pallas(a, b, num, num),
        F0, F1, args.iters)
    cases["pallas-xyz-chain"] = lambda: chain(
        lambda a, b: pallas_knn.find_nn_pallas(a, b, num, num),
        xyz, xyz, args.iters)
    xyz32 = jnp.zeros((args.n, 32), jnp.float32).at[:, :3].set(xyz)
    cases["pallas-xyz32-chain"] = lambda: chain(
        lambda a, b: pallas_knn.find_nn_pallas(a, b, num, num),
        xyz32, xyz32, args.iters)
    cases["scan-xyz-chain"] = lambda: chain(
        jax.jit(lambda a, b: knn.find_nn(a, b, num, num)),
        xyz, xyz, args.iters)

    # provenance-vs-values disambiguation: same executable, inputs either
    # host-transferred or device-computed, values either N(0,1) or coords.
    Fd0 = jax.block_until_ready(F0 * 1.0)  # device-computed feature values
    Fd1 = jax.block_until_ready(F1 * 1.0)
    xyz32h = jnp.asarray(np.asarray(xyz32))  # host-transferred coord values
    cases["pallas-feat-dev-chain"] = lambda: chain(
        lambda a, b: pallas_knn.find_nn_pallas(a, b, num, num),
        Fd0, Fd1, args.iters)
    cases["pallas-xyz32-host-chain"] = lambda: chain(
        lambda a, b: pallas_knn.find_nn_pallas(a, b, num, num),
        xyz32h, xyz32h, args.iters)
    # distinct-b variant: rules out a==b aliasing effects
    xyz32b = jax.block_until_ready(xyz32 + 0.001)
    cases["pallas-xyz32-ab-chain"] = lambda: chain(
        lambda a, b: pallas_knn.find_nn_pallas(a, b, num, num),
        xyz32, xyz32b, args.iters)

    only = set(args.only.split(",")) if args.only else None
    for name, fn in cases.items():
        if only and name not in only:
            continue
        try:
            ms = fn()
            out = ms if isinstance(ms, str) else f"{ms:8.2f} ms"
            print(f"{name:14s} {out}")
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
