#!/usr/bin/env python
"""Is the TPU gather wall per-INDEX or per-ELEMENT?  (r5 north-star probe)

tools/gather_law.py (corrected methodology) measured XLA int32 gathers at
74-153 M elem/s regardless of table size — far under both HBM bandwidth and
line-fetch bounds, i.e. the cost looks per-gather-INDEX, not per-byte. The
plan builds issue one index per (row, offset) probe: 27 x 16384 at level 0.
If a single index can fetch a whole (3,3,3) patch (lax.gather slice_sizes)
or a 128-lane row at the same per-index cost, the same probe data costs
27-128x fewer indices and the ~290 ms/pair of plan builds collapses.

Measured forms, all with gather_law's anti-memoization discipline (fresh
seeds, chained data dependence, host-fetch sync, marginal cost over K reps):
  scalar   — N=27*16384 one-element gathers from a flat [cells] table
             (today's dense_grid.dense_lookup_cols form).
  patch333 — M=16384 gathers of (3,3,3) patches from the [X,Y,Z] view:
             same fetched data as `scalar`, 27x fewer indices.
  patch155 — M=16384 gathers of (1,5,5) y-z patches (conv1 ks=5 inner).
  row128   — M=16384 gathers of (1,128) rows from a [cells/128, 128] view
             (hashing-bucket / multimap-member probing shape).

Run:  nohup python tools/patch_gather_law.py > /tmp/patch_law.log 2>&1 &
Never timeout-kill TPU scripts (.claude/skills/verify).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deepglobalregistration_tpu.utils.platform import (
    enable_compilation_cache, select_platform)

enable_compilation_cache()
select_platform()

import jax
import jax.numpy as jnp

M = 16384             # rows at bench shape
N = 27 * M            # scalar probes per level-0 kernel-map build
EX = EY = EZ = 256    # dense extent (64 MB int32)
CELLS = EX * EY * EZ
K = 16


def marginal(make_fn, feeds, *const):
    def timed(fn):
        np.asarray(jnp.sum(fn(next(feeds), *const)))  # compile + sync
        best = np.inf
        for _ in range(3):
            f = next(feeds)
            t0 = time.perf_counter()
            np.asarray(jnp.sum(fn(f, *const)))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    t_lo = timed(make_fn(4))
    t_hi = timed(make_fn(4 + K))
    print(f"    [t4={t_lo:.2f} ms  t{4 + K}={t_hi:.2f} ms]", flush=True)
    return (t_hi - t_lo) / K


def run(name, make, feeds, n_idx, n_elem, *const):
    ms = marginal(make, feeds, *const)
    print(f"{name}: {ms:7.3f} ms  ({n_idx / max(ms, 1e-3) / 1e3:7.0f} M idx/s"
          f", {n_elem / max(ms, 1e-3) / 1e3:8.0f} M elem/s)", flush=True)


def main():
    seed = int(time.time()) % 100000
    print(f"backend: {jax.default_backend()}  seed {seed}", flush=True)
    rng = np.random.RandomState(seed)
    table = jnp.asarray(rng.randint(0, 1 << 20, size=CELLS).astype(np.int32))
    t3d = table.reshape(EX, EY, EZ)
    t2d = table.reshape(CELLS // 128, 128)

    # --- scalar baseline ---------------------------------------------------
    def idxs_flat():
        while True:
            yield jnp.asarray(rng.randint(0, CELLS, size=N).astype(np.int32))

    def make_scalar(k):
        @jax.jit
        def go(i, t):
            def body(_, c):
                i_, acc = c
                out = t[i_]
                return jnp.abs(i_ + out) % CELLS, acc + out
            _, out = jax.lax.fori_loop(
                0, k, body, (i, jnp.zeros((N,), jnp.int32)))
            return out
        return go

    run("scalar  ", make_scalar, idxs_flat(), N, N, table)

    # --- (3,3,3) patch gather ----------------------------------------------
    def starts3():
        while True:
            yield jnp.asarray(np.stack(
                [rng.randint(0, E - 3, size=M).astype(np.int32)
                 for E in (EX, EY, EZ)], axis=1))

    dn3 = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))

    def make_patch(sizes):
        span = tuple(E - s for E, s in zip((EX, EY, EZ), sizes))

        def mk(k):
            @jax.jit
            def go(s, t):
                def body(_, c):
                    s_, acc = c
                    out = jax.lax.gather(t, s_, dn3, sizes,
                                         mode="clip")
                    red = jnp.sum(out.reshape(M, -1), axis=1,
                                  dtype=jnp.int32)
                    nxt = jnp.abs(s_ + red[:, None]) % jnp.asarray(
                        span, jnp.int32)[None, :]
                    return nxt, acc + red
                _, out = jax.lax.fori_loop(
                    0, k, body, (s, jnp.zeros((M,), jnp.int32)))
                return out
            return go
        return mk

    n3 = int(np.prod((3, 3, 3)))
    run("patch333", make_patch((3, 3, 3)), starts3(), M, M * n3, t3d)
    n155 = int(np.prod((1, 5, 5)))
    run("patch155", make_patch((1, 5, 5)), starts3(), M, M * n155, t3d)
    n555 = int(np.prod((5, 5, 5)))
    run("patch555", make_patch((5, 5, 5)), starts3(), M, M * n555, t3d)

    # --- (1,128) row gather ------------------------------------------------
    def rows():
        while True:
            yield jnp.asarray(
                rng.randint(0, CELLS // 128, size=M).astype(np.int32))

    def make_row(k):
        @jax.jit
        def go(r, t):
            def body(_, c):
                r_, acc = c
                out = jnp.take(t, r_, axis=0, mode="clip")  # [M, 128]
                red = jnp.sum(out, axis=1, dtype=jnp.int32)
                return jnp.abs(r_ + red) % (CELLS // 128), acc + red
            _, out = jax.lax.fori_loop(
                0, k, body, (r, jnp.zeros((M,), jnp.int32)))
            return out
        return go

    run("row128  ", make_row, rows(), M, M * 128, t2d)

    # --- correctness: patch333 == 27 scalar gathers -------------------------
    s = next(starts3())
    patch = jax.lax.gather(t3d, s, dn3, (3, 3, 3), mode="clip")
    sn = np.asarray(s)
    ok = True
    pn = np.asarray(patch)
    tn = np.asarray(table).reshape(EX, EY, EZ)
    for dz in range(3):
        want = tn[sn[:, 0, None, None] + np.arange(3)[None, :, None],
                  sn[:, 1, None, None] + np.arange(3)[None, None, :],
                  sn[:, 2, None, None] + dz]
        ok = ok and bool(np.array_equal(pn[:, :, :, dz], want))
    print(f"patch333 exact={ok}", flush=True)


if __name__ == "__main__":
    main()
