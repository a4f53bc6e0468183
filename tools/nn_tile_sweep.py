"""Tile-size sweep for the XLA 1-NN scan (chained timing; round-3 perf).

The Pallas 1-NN is content-dependently slow through this platform's tunnel
(tools/nn_bench.py: 86 ms on random features vs 0.7 ms artifacts), so the
scan path is production. This sweeps the candidate tile size and a
query-chunked two-level variant to find the real floor.
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
    ap.add_argument("--iters", type=int, default=10)
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

    def chain(fn, a, b, iters):
        idx, d2 = fn(a, b)
        jax.block_until_ready((idx, d2))
        t0 = time.perf_counter()
        for _ in range(iters):
            idx, d2 = fn(a + 0.0 * d2[:1, None], b)
        jax.block_until_ready((idx, d2))
        return (time.perf_counter() - t0) / iters * 1e3

    ref_i, ref_d = None, None
    for tile in (1024, 2048, 4096, 8192, 16384):
        fn = jax.jit(lambda a, b, t=tile: knn.find_nn(a, b, num, num, tile=t))
        ms_f = chain(fn, F0, F1, args.iters)
        ms_x = chain(fn, xyz, xyz, args.iters)
        i, d = fn(F0, F1)
        if ref_i is None:
            ref_i, ref_d = np.asarray(i), np.asarray(d)
        else:
            match = float(np.mean(np.asarray(i)[:args.n - 100]
                                  == ref_i[:args.n - 100]))
            assert match > 0.999, f"tile {tile} mismatch {match}"
        print(f"tile {tile:6d}: feat {ms_f:7.2f} ms   xyz {ms_x:7.2f} ms")
        sys.stdout.flush()

    # two-level: query chunks via lax.map over the scan
    def two_level(a, b, qc):
        n0 = a.shape[0]
        a3 = a.reshape(n0 // qc, qc, a.shape[1])
        offs = jnp.arange(n0 // qc, dtype=jnp.int32) * qc

        def per_chunk(inp):
            ac, off = inp
            num0c = jnp.clip(num - off, 0, qc)
            return knn.find_nn(ac, b, num0c, num, tile=16384)

        i, d = jax.lax.map(per_chunk, (a3, offs))
        return i.reshape(-1), d.reshape(-1)

    for qc in (2048, 4096, 8192):
        fn = jax.jit(lambda a, b, q=qc: two_level(a, b, q))
        ms_f = chain(fn, F0, F1, args.iters)
        ms_x = chain(fn, xyz, xyz, args.iters)
        print(f"2lvl q={qc:5d}: feat {ms_f:7.2f} ms   xyz {ms_x:7.2f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
