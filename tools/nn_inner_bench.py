"""Device-only 1-NN timing: K chained calls inside ONE jitted program.

Removes per-dispatch tunnel latency (~10 ms/iter) that polluted the
host-chained sweeps; the fori_loop body depends on the previous output, so
iterations serialize on device and (total - 1-call) / (K - 1) approximates
the marginal per-call device time.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--c", type=int, default=32)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    from deepglobalregistration_tpu.utils.platform import (
        enable_compilation_cache, select_platform)

    enable_compilation_cache()
    select_platform()

    import jax
    import jax.numpy as jnp

    from deepglobalregistration_tpu.ops import knn

    rng = np.random.RandomState(0)
    F0 = jnp.asarray(rng.randn(args.n, args.c).astype(np.float32))
    F1 = jnp.asarray(rng.randn(args.n, args.c).astype(np.float32))
    xyz = jnp.asarray((rng.rand(args.n, 3) * 3).astype(np.float32))
    num = jnp.int32(args.n - 100)

    def timed(fn, a, b):
        out = fn(a, b)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(a, b))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    def make(tile, k, use_pallas=False):
        @jax.jit
        def go(a, b):
            def body(_, carry):
                a_, d_ = carry
                i, d = knn.find_nn(a_ + 0.0 * d_[:1, None], b, num, num,
                                   tile=tile, use_pallas=use_pallas)
                return a_, d
            _, d = jax.lax.fori_loop(0, k, body, (a, jnp.zeros((args.n,))))
            return d
        return go

    variants = [("scan", t, False) for t in (2048, 4096, 8192, 16384)]
    if args.pallas:
        variants += [("pallas", 0, True)]
    for name, tile, up in variants:
        t1 = timed(make(tile, 1, up), F0, F1)
        tk = timed(make(tile, args.k, up), F0, F1)
        per_f = (tk - t1) / (args.k - 1)
        t1x = timed(make(tile, 1, up), xyz, xyz)
        tkx = timed(make(tile, args.k, up), xyz, xyz)
        per_x = (tkx - t1x) / (args.k - 1)
        print(f"{name} tile {tile:6d}: feat {per_f:7.2f} ms/call "
              f"(1-call {t1:6.2f})   xyz {per_x:7.2f} ms/call (1-call {t1x:6.2f})")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
