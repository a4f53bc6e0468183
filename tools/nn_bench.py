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

    only = set(args.only.split(",")) if args.only else None
    for name, fn in cases.items():
        if only and name not in only:
            continue
        try:
            ms = fn()
            print(f"{name:14s} {ms:8.2f} ms")
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
