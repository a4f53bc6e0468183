#!/usr/bin/env python
"""Gather throughput vs table size, measured CORRECTLY (chained reps).

tools/gather_size_sweep.py and tools/pallas_gather_bench.py used same-input
repeats with a fixed seed — the tunnel memoizes (program, input values)
across processes (tools/gather_bench.py:55), so their 2-13 G elem/s numbers
are unusable. This reruns the size sweep and the rank-compact lookup
prototype with gather_bench's methodology: K data-dependent reps inside one
jitted fori_loop (each rep's indices perturbed by a runtime-zero flag off
the previous output), marginal cost = (t_{4+K} - t_4) / K, fresh seed.

What it decides: whether the dense_grid/kernel-map probes (currently int32
gathers from 64 MB level-0 tables, attributed ~100 ms/pair) get faster when
the table shrinks to VMEM scale — i.e. whether a rank-compact table
(occupancy bits 2 MB + per-word prefix 2 MB) is worth restructuring for.

Run:  nohup python tools/gather_law.py > /tmp/gather_law.log 2>&1 &
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

N = 27 * 16384  # probes per kernel-map build at bench shape
K = 16


def marginal(make_fn, feeds, *const):
    """feeds: iterator yielding a FRESH feed array per dispatch.

    The tunnel memoizes (program, input values) across dispatches and even
    across processes when inputs are small enough to hash (the uniform
    442 G elem/s artifact this file's first version measured) — so every
    timed dispatch gets never-before-seen index values.
    """

    def timed(fn):
        # block_until_ready does NOT reliably block through the axon tunnel
        # (whole dispatches "finished" in 0.08 ms; a forced host fetch then
        # waited 120 s — /tmp/sync_test.log 2026-08-19). Fetch a scalar to
        # host to force real synchronization.
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


def main():
    seed = int(time.time()) % 100000
    print(f"backend: {jax.default_backend()}  seed {seed}", flush=True)
    rng = np.random.RandomState(seed)

    # --- law: scalar int32 gather rate vs table size -----------------------
    for mb in (2, 8, 64):
        words = int(mb * (1 << 20)) // 4
        table = jnp.asarray(
            rng.randint(0, 1 << 30, size=words).astype(np.int32))
        def idxs(words=words):
            while True:
                yield jnp.asarray(
                    rng.randint(0, words, size=N).astype(np.int32))

        def make(k, words=words):
            @jax.jit
            def go(i, t):
                def body(_, carry):
                    i_, acc = carry
                    out = t[i_]
                    # next rep's indices depend on THIS rep's gathered values:
                    # hoisting or skipping any gather changes the result.
                    nxt = jnp.abs(i_ + out) % words
                    return nxt, acc + out

                _, out = jax.lax.fori_loop(
                    0, k, body, (i, jnp.zeros((N,), jnp.int32)))
                return out
            return go

        ms = marginal(make, idxs(), table)
        print(f"gather {mb:6.2f} MB: {ms:7.3f} ms "
              f"({N / max(ms, 1e-3) / 1e3:7.0f} M elem/s)", flush=True)

    # --- rank-compact lookup (occ bits + prefix + perm) vs dense table -----
    cells = 256 ** 3
    nrows = 16384
    occ_addr = np.sort(rng.choice(cells, nrows, replace=False))
    occ = np.zeros(cells // 32, np.uint32)
    np.bitwise_or.at(occ, occ_addr >> 5,
                     np.uint32(1) << (occ_addr & 31).astype(np.uint32))
    prefix = np.concatenate([[0], np.cumsum(np.array(
        [bin(w).count("1") for w in occ]))[:-1]]).astype(np.int32)
    perm = rng.permutation(nrows).astype(np.int32)
    dense = np.full(cells, -1, np.int32)
    dense[occ_addr] = perm
    def qs():
        while True:
            q = rng.randint(0, cells, size=N).astype(np.int32)
            q[: N // 2] = occ_addr[rng.randint(0, nrows, size=N // 2)]
            yield jnp.asarray(q)

    occ_j, prefix_j, perm_j, dense_j = map(
        jnp.asarray, (occ.view(np.int32), prefix, perm, dense))
    q_j = next(qs())

    def rank_lookup(occ, prefix, perm, q):
        w = q >> 5
        b = (q & 31).astype(jnp.uint32)
        word = occ[w].astype(jnp.uint32)
        hit = ((word >> b) & 1).astype(jnp.bool_)
        below = word & ((jnp.uint32(1) << b) - jnp.uint32(1))
        rank = prefix[w] + jax.lax.population_count(below).astype(jnp.int32)
        row = perm[jnp.minimum(rank, perm.shape[0] - 1)]
        return jnp.where(hit, row, -1)

    def make_rank(k):
        @jax.jit
        def go(q, occ, prefix, perm):
            def body(_, carry):
                q_, acc = carry
                out = rank_lookup(occ, prefix, perm, q_)
                nxt = jnp.abs(q_ + out) % cells
                return nxt, acc + out

            _, out = jax.lax.fori_loop(
                0, k, body, (q, jnp.zeros((N,), jnp.int32)))
            return out
        return go

    def make_dense(k):
        @jax.jit
        def go(q, dense):
            def body(_, carry):
                q_, acc = carry
                out = dense[q_]
                nxt = jnp.abs(q_ + out) % cells
                return nxt, acc + out

            _, out = jax.lax.fori_loop(
                0, k, body, (q, jnp.zeros((N,), jnp.int32)))
            return out
        return go

    ms_d = marginal(make_dense, qs(), dense_j)
    print(f"dense 64MB int32 lookup: {ms_d:7.3f} ms "
          f"({N / max(ms_d, 1e-3) / 1e3:7.0f} M/s)", flush=True)
    ms_r = marginal(make_rank, qs(), occ_j, prefix_j, perm_j)
    ref = jax.jit(rank_lookup)(occ_j, prefix_j, perm_j, q_j)
    exact = bool(jnp.array_equal(ref, dense_j[q_j]))
    print(f"rank 4MB lookup:         {ms_r:7.3f} ms "
          f"({N / max(ms_r, 1e-3) / 1e3:7.0f} M/s)  exact={exact}",
          flush=True)


if __name__ == "__main__":
    main()
